"""4k-pile A/B: current two-kernel pipeline vs the fused contact table.

Runs on the attached TPU. For each config: compile one 120-step scan
chunk, run settle chunks, time a fenced window, capture a device trace,
and print a one-step metrics dict (overflow counters must be 0).

Env: TB_N (bodies, default 4096), TB_CHUNKS (timed chunks, default 4),
TB_WHICH (a|b|both).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from physics_tpu.engine import prepare_contacts, step, step_with_metrics
from physics_tpu.scenes import box_pile, pile_config

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

CHUNK = 120


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(arr):
    return float(jax.device_get(jnp.sum(arr)))


def run_cfg(name, cfg, n, chunks):
    state = prepare_contacts(box_pile(n), cfg)

    @partial(jax.jit, donate_argnums=0)
    def run(s):
        def body(s2, _):
            return step(s2, cfg), None
        out, _ = jax.lax.scan(body, s, None, length=CHUNK)
        return out

    t0 = time.perf_counter()
    state = run(state)
    fence(state.pos)
    log(f"{name}: compile+chunk {time.perf_counter()-t0:.1f}s")
    state = run(state)  # settle
    fence(state.pos)

    t0 = time.perf_counter()
    for _ in range(chunks):
        state = run(state)
    fence(state.pos)
    dt = time.perf_counter() - t0
    wall_ms = dt * 1e3 / (chunks * CHUNK)
    log(f"{name}: wall {wall_ms:.3f} ms/step "
        f"({n * 1e3 / wall_ms / 1e6:.2f}M body-steps/s)")

    # metrics step (overflow counters)
    _, m = jax.jit(step_with_metrics, static_argnums=1)(state, cfg)
    m = {k: float(v) for k, v in m.items()}
    log(f"{name}: metrics {m}")

    trace_ms = None
    if os.environ.get("TB_TRACE", "1") == "1":
        import tempfile

        from physics_tpu.utils.profiling import summarize_trace, trace

        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                state = run(state)
                fence(state.pos)
            summ = summarize_trace(td, top=14)
        total = sum(ms for ms, _ in summ.values())
        trace_ms = total / CHUNK
        log(f"{name}: device trace {trace_ms:.3f} ms/step")
        for src, (ms, cnt) in list(summ.items())[:14]:
            log(f"  {ms / CHUNK:8.4f} ms/step  x{cnt:<6} {src}")
    return wall_ms, trace_ms


def main():
    n = int(os.environ.get("TB_N", "4096"))
    chunks = int(os.environ.get("TB_CHUNKS", "4"))
    which = os.environ.get("TB_WHICH", "both")

    base = pile_config(n).replace(
        contact_iters=8, contact_solver="pallas_banded")
    if which in ("a", "both"):
        run_cfg("A:two-kernel", base, n, chunks)
    if which in ("b", "both"):
        cfg_b = base.replace(contact_table=True, bucket_block=128)
        run_cfg("B:contact-table", cfg_b, n, chunks)
    # arbitrary flag combos: TB_WHICH=f TB_FLAGS="bp_inkernel,fuse_prep"
    # (bare name = True; name=<int|float|bool> also accepted)
    if which == "f":
        over = {}
        for kv in os.environ.get("TB_FLAGS", "").split(","):
            if not kv.strip():
                continue
            k, _, v = kv.partition("=")
            v = v.strip()
            if not v:
                val = True
            elif v in ("true", "True", "false", "False"):
                val = v in ("true", "True")
            else:
                val = float(v) if "." in v else int(v)
            over[k.strip()] = val
        run_cfg(f"F:{over}", base.replace(**over), n, chunks)


if __name__ == "__main__":
    main()
