#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): body-steps/sec/chip on the 4k-body box
pile (ground plane + pair collisions + sweep broad phase + SAT narrow phase
+ projected-Jacobi impulse solver), target 100M body-steps/sec/chip on v5e.

Secondary numbers (batched-env throughput, smaller piles) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from physics_tpu.engine import step
from physics_tpu.scenes import box_pile, pile_config, random_env

TARGET_BODY_STEPS = 100e6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_rollout(state, cfg, steps: int, warmup_steps: int = 0):
    """Settle (optional), then time `steps` on-device steps."""

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(s, k):
        def body(s2, _):
            return step(s2, cfg), None

        out, _ = jax.lax.scan(body, s, None, length=k)
        return out

    if warmup_steps:
        state = run(state, warmup_steps)
        jax.block_until_ready(state.pos)

    # compile the timed program shape, then measure
    state = run(state, steps)
    jax.block_until_ready(state.pos)
    t0 = time.perf_counter()
    state = run(state, steps)
    jax.block_until_ready(state.pos)
    dt = time.perf_counter() - t0
    return state, steps / dt


def bench_pile(n_bodies: int, settle: int = 120, timed: int = 240):
    state = box_pile(n_bodies)
    cfg = pile_config(n_bodies)
    t0 = time.perf_counter()
    state, sps = time_rollout(state, cfg, timed, warmup_steps=settle)
    log(
        f"pile[{n_bodies}]: {sps:.1f} steps/s, "
        f"{n_bodies * sps / 1e6:.2f}M body-steps/s "
        f"(total {time.perf_counter() - t0:.1f}s incl. compile)"
    )
    if not bool(np.all(np.isfinite(np.asarray(state.pos)))):
        log(f"pile[{n_bodies}]: WARNING — non-finite positions!")
    return n_bodies * sps


def bench_batched_envs(n_envs: int = 4096, n_bodies: int = 8, timed: int = 120):
    from physics_tpu.config import SimConfig

    base = random_env(0, n_bodies)
    seeds = np.arange(n_envs)
    rng = np.random.default_rng(1)
    offsets = rng.uniform(-1, 1, (n_envs, 1, 3)).astype(np.float32)
    batched = jax.vmap(lambda o: base.replace(pos=base.pos + o))(offsets)
    cfg = SimConfig(
        compat=False, ground_plane=True, pair_collisions=True,
        contact_iters=16, dt=1.0 / 60.0,
    )

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(s, k):
        def body(s2, _):
            return jax.vmap(lambda e: step(e, cfg))(s2), None

        out, _ = jax.lax.scan(body, s, None, length=k)
        return out

    out = run(batched, timed)
    jax.block_until_ready(out.pos)
    t0 = time.perf_counter()
    out = run(out, timed)
    jax.block_until_ready(out.pos)
    dt = time.perf_counter() - t0
    sps = timed / dt
    log(
        f"batched[{n_envs}x{n_bodies}]: {sps:.1f} steps/s, "
        f"{n_envs * n_bodies * sps / 1e6:.2f}M body-steps/s"
    )
    return n_envs * n_bodies * sps


def main() -> None:
    log(f"devices: {jax.devices()}")
    try:
        bench_batched_envs()
    except Exception as e:  # secondary — never blocks the primary metric
        log(f"batched env bench failed: {e}")
    try:
        bench_pile(1024, settle=120, timed=240)
    except Exception as e:
        log(f"1k pile bench failed: {e}")

    value = bench_pile(4096, settle=120, timed=240)
    print(
        json.dumps(
            {
                "metric": "body_steps_per_sec_4k_pile",
                "value": round(float(value), 1),
                "unit": "body-steps/sec/chip",
                "vs_baseline": round(float(value) / TARGET_BODY_STEPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
