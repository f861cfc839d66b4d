#!/usr/bin/env python
"""Compile/run the fused hull contact table on the attached TPU.

Usage: HT_DEBUG=k N=128 python experiments/hull_table_tpu.py
(HT_DEBUG truncates the kernel after stage k — Mosaic crash bisect.)
With BENCH=1, times the full hull-table step vs the XLA fast path.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n = int(os.environ.get("N", "128"))
    print("backend:", jax.default_backend())
    from physics_tpu.engine import prepare_contacts, step
    from physics_tpu.ops.broadphase import body_aabbs, pair_candidates, sweep_order
    from physics_tpu.ops.contact_table import table_keys_scalar, unified_geom
    from physics_tpu.ops.hull_table import bucket_hull_contact_table
    from physics_tpu.scenes import mesh_rain, rain_xla_config
    from physics_tpu.solver.contacts import hull_table_path

    state = mesh_rain(n)
    cfg_x = rain_xla_config(n)
    cfg_t = cfg_x.replace(
        pair_buckets=True, bucket_block=128, contact_table=True,
        hull_table=True, bucket_cap2=int(os.environ.get("CAP2", "512")),
    )
    assert hull_table_path(state, cfg_t), "hull table path not engaged"

    state = prepare_contacts(state, cfg_x)
    stepj = jax.jit(step, static_argnums=1)
    for _ in range(3):
        state = stepj(state, cfg_x)
    state = jax.block_until_ready(state)

    @jax.jit
    def run_table(state):
        order = sweep_order(state, body_aabbs(state))
        geom = unified_geom(state, cfg_t, order, hulls=True)
        cand = pair_candidates(state, cfg_t)
        table, meta, _ = bucket_hull_contact_table(
            state, cand, cfg_t, order, prev=None, geom=geom)
        return table, meta

    t0 = time.time()
    table, meta = jax.block_until_ready(run_table(state))
    print(f"compile+run OK in {time.time() - t0:.1f}s  "
          f"HT_DEBUG={os.environ.get('HT_DEBUG', '0')}")
    if os.environ.get("HT_DEBUG", "0") == "0":
        from physics_tpu.ops.hull_table import hull_slots
        keys = np.asarray(table_keys_scalar(
            table, n, hull_slots(state.hulls), state.hulls.verts.shape[1]))
        act = keys != 0
        print("active:", act.sum(), "neg:", (keys[act] < 0).sum(),
              "pos:", (keys[act] > 0).sum())
        print("meta dropped:", np.asarray(meta)[0, 0::128].sum(),
              "prefilter dropped:", np.asarray(meta)[0, 2::128].sum())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
