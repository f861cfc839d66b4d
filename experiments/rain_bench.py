#!/usr/bin/env python
"""Mesh-rain (hull) throughput probe — VERDICT item 3.

Measures body-steps/s for the mesh-rain config (beveled-cube hulls from
the real reference asset raining onto the ground) at 128 and optionally
1024 bodies, with a device-trace breakdown of where the time goes.

Usage: RAIN_N=128 RAIN_CHUNKS=5 python experiments/rain_bench.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from physics_tpu.engine import prepare_contacts, step
from physics_tpu.scenes import mesh_rain, rain_config

CHUNK = 60


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(a):
    return float(jax.device_get(jnp.sum(a)))


def main():
    n = int(os.environ.get("RAIN_N", "128"))
    chunks = int(os.environ.get("RAIN_CHUNKS", "5"))
    log(f"devices: {jax.devices()}")
    state = mesh_rain(n)
    # rain_config is now the production hull-table + anchored pipeline
    # (round 5); RAIN_XLA=1 selects the pre-table generic path for A/Bs
    if os.environ.get("RAIN_XLA"):
        from physics_tpu.scenes import rain_xla_config

        cfg = rain_xla_config(n)
    else:
        cfg = rain_config(n)
    # capacity/precision A-B knobs (multipliers of N, see BASELINE.md)
    import dataclasses

    over = {}
    if os.environ.get("RAIN_PAIR_MULT"):
        over["max_pair_candidates"] = int(
            float(os.environ["RAIN_PAIR_MULT"]) * n)
    if os.environ.get("RAIN_CT_MULT"):
        over["max_contacts"] = int(float(os.environ["RAIN_CT_MULT"]) * n)
    if os.environ.get("RAIN_PF_MULT"):
        over["hull_prefilter_cap"] = int(
            float(os.environ["RAIN_PF_MULT"]) * n)
    if os.environ.get("RAIN_ZBF16"):
        over["z_bf16"] = bool(int(os.environ["RAIN_ZBF16"]))
    if os.environ.get("RAIN_TABLE"):
        # fused hull contact table (ops/hull_table.py) + optional
        # fuse_prep/fuse_integrate composition on top
        over.update(pair_buckets=True, bucket_block=128,
                    contact_table=True, hull_table=True,
                    bucket_cap2=int(os.environ.get("RAIN_CAP2", "512")))
    if os.environ.get("RAIN_FUSE"):
        over.update(fuse_prep=True, fuse_integrate=True)
    if os.environ.get("RAIN_SW"):
        over["sweep_window"] = int(os.environ["RAIN_SW"])
    if os.environ.get("RAIN_REBUILD"):
        # anchored hull contacts (round 5): K-step rebuild + refresh
        over.update(contact_rebuild=int(os.environ["RAIN_REBUILD"]),
                    contact_refresh_iters=int(
                        os.environ.get("RAIN_RIT", "4")),
                    contact_rebuild_vel_factor=float(
                        os.environ.get("RAIN_VF", "0.0")))
    if over:
        cfg = dataclasses.replace(cfg, **over)
        log(f"rain[{n}]: overrides {over}")
    state = prepare_contacts(state, cfg)

    @partial(jax.jit, donate_argnums=0)
    def run(s):
        out, _ = jax.lax.scan(lambda s2, _: (step(s2, cfg), None), s,
                              None, length=CHUNK)
        return out

    t0 = time.perf_counter()
    state = run(state)
    fence(state.pos)
    log(f"rain[{n}]: compile+first chunk {time.perf_counter()-t0:.1f}s")
    state = run(state)
    fence(state.pos)

    t0 = time.perf_counter()
    for _ in range(chunks):
        state = run(state)
    fence(state.pos)
    dt = time.perf_counter() - t0
    sps = chunks * CHUNK / dt
    log(f"rain[{n}]: {sps:.1f} steps/s, {n*sps/1e6:.3f}M body-steps/s, "
        f"{1e3/sps:.2f} ms/step, finite="
        f"{bool(np.all(np.isfinite(np.asarray(state.pos))))}")

    from physics_tpu.engine import step_with_metrics

    _, m = jax.jit(step_with_metrics, static_argnums=1)(state, cfg)
    log(f"rain[{n}]: metrics "
        f"{ {k: float(v) for k, v in sorted(m.items())} }")

    if os.environ.get("RAIN_TRACE", "1") == "1":
        import tempfile

        from physics_tpu.utils.profiling import summarize_trace, trace

        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                state = run(state)
                fence(state.pos)
            summary = summarize_trace(td, top=25)
        for src, (ms, ops) in summary.items():
            log(f"  {ms/CHUNK*1e3:8.1f} us/step  {ops:5d} ops  {src}")
        dev_ms = sum(ms for ms, _ in summary.values())
        log(f"rain[{n}]: device total {dev_ms/CHUNK:.3f} ms/step")


if __name__ == "__main__":
    main()
