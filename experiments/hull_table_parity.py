#!/usr/bin/env python
"""Parity probe: fused hull contact table (ops/hull_table.py, interpret
mode) vs the XLA shared-hull fast paths on the same scene.

Compares the contact SET by feature key (the stable identity across
paths): every active (key → depth, point, normal·depth-sign) must match
within f32 tolerance. Usage: N=64 STEPS=3 python experiments/hull_table_parity.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n = int(os.environ.get("N", "64"))
    steps = int(os.environ.get("STEPS", "3"))
    from physics_tpu.engine import prepare_contacts, step
    from physics_tpu.ops.broadphase import body_aabbs, pair_candidates, sweep_order
    from physics_tpu.ops.contact_table import CT_ROWS, table_keys_scalar, unified_geom
    from physics_tpu.ops.hull_table import bucket_hull_contact_table
    from physics_tpu.ops.narrowphase import (
        _ground_contacts_hulls_fast,
        _pair_contacts_hulls_fast,
        hull_obb_prefilter,
    )
    from physics_tpu.scenes import mesh_rain, rain_xla_config
    from physics_tpu.solver.contacts import concat_contacts, hull_table_path

    state = mesh_rain(n)
    cfg_x = rain_xla_config(n)                       # XLA fast-path config
    cfg_t = cfg_x.replace(                       # fused-table config
        pair_buckets=True, bucket_block=128, contact_table=True,
        hull_table=True, bucket_cap2=512,
    )
    assert hull_table_path(state, cfg_t), "hull table path not engaged"

    # settle a few steps on the XLA path so the scene has real contacts
    state = prepare_contacts(state, cfg_x)
    stepj = jax.jit(step, static_argnums=1)
    for _ in range(steps):
        state = stepj(state, cfg_x)

    # ---- path A: XLA fast paths ----
    cand = pair_candidates(state, cfg_x)
    cand, _ = hull_obb_prefilter(state, cand, cfg_x.hull_prefilter_cap)
    pc = _pair_contacts_hulls_fast(state, cand, cfg_x)
    gc = _ground_contacts_hulls_fast(state, cfg_x)
    ca = concat_contacts(gc, pc)
    act_a = np.asarray(ca.active) & (np.asarray(ca.key) != 0)
    ka = np.asarray(ca.key)[act_a]
    da = np.asarray(ca.depth)[act_a]
    pa = np.asarray(ca.point)[:, act_a]
    na = np.asarray(ca.normal)[:, act_a]

    # ---- path B: fused kernel (interpret) ----
    order = sweep_order(state, body_aabbs(state))
    geom = unified_geom(state, cfg_t, order, hulls=True)
    cand_b = pair_candidates(state, cfg_t)
    table, meta, _ = bucket_hull_contact_table(
        state, cand_b, cfg_t, order, prev=None, geom=geom)
    from physics_tpu.ops.hull_table import hull_slots
    keys_b = np.asarray(table_keys_scalar(
        table, n, hull_slots(state.hulls), state.hulls.verts.shape[1]))
    act_b = keys_b != 0
    kb = keys_b[act_b]
    tb = np.asarray(table)
    db = tb[6][act_b]
    pb = tb[0:3][:, act_b]
    nb_ = tb[3:6][:, act_b]

    print(f"A: {ka.size} active contacts, B: {kb.size}")
    print(f"meta dropped={np.asarray(meta)[0, 0::128].sum():.0f} "
          f"prefilter_dropped={np.asarray(meta)[0, 2::128].sum():.0f}")
    sa = set(ka.tolist())
    sb = set(kb.tolist())
    only_a = sa - sb
    only_b = sb - sa
    print(f"keys only in A: {len(only_a)}, only in B: {len(only_b)}")
    if only_a:
        print("  sample only-A:", sorted(only_a)[:8])
    if only_b:
        print("  sample only-B:", sorted(only_b)[:8])
    assert len(ka) == len(sa) and len(kb) == len(sb), "duplicate keys!"

    ia = {k: i for i, k in enumerate(ka.tolist())}
    ib = {k: i for i, k in enumerate(kb.tolist())}
    common = sorted(sa & sb)
    errs_d, errs_p, errs_n = [], [], []
    for k in common:
        i, j = ia[k], ib[k]
        errs_d.append(abs(da[i] - db[j]))
        errs_p.append(np.abs(pa[:, i] - pb[:, j]).max())
        errs_n.append(np.abs(na[:, i] - nb_[:, j]).max())
    print(f"common {len(common)}: max |Δdepth| {max(errs_d):.3e}, "
          f"max |Δpoint| {max(errs_p):.3e}, max |Δnormal| {max(errs_n):.3e}")
    ok = (not only_a and not only_b and max(errs_d) < 1e-4
          and max(errs_p) < 1e-3 and max(errs_n) < 1e-4)
    print("PARITY OK" if ok else "PARITY MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
