"""A/B the persistent anchored-contact pipeline (cfg.contact_rebuild)
on the 4k pile: throughput + penetration envelope vs per-step rebuild.

usage: python experiments/rebuild_bench.py [K] [vel_factor] [N]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from physics_tpu.engine import step, step_with_metrics, prepare_contacts
from physics_tpu.scenes import box_pile, pile_config
from physics_tpu.utils.profiling import fence

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
VF = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
CHUNK = 120
print("backend:", jax.default_backend(), "K:", K, "vf:", VF, flush=True)

cfg = pile_config(N).replace(contact_iters=8, contact_rebuild=K,
                             contact_rebuild_vel_factor=VF,
                             contact_refresh_iters=int(
                                 os.environ.get("RIT", "0")))
state = prepare_contacts(box_pile(N), cfg)


@partial(jax.jit, donate_argnums=0)
def run(s):
    def body(s2, _):
        s3, m = step_with_metrics(s2, cfg)
        return s3, (m["max_penetration"], m["contact_count"])
    out, (pen, cc) = jax.lax.scan(body, s, None, length=CHUNK)
    return out, jnp.max(pen), jnp.mean(cc)


t0 = time.perf_counter()
state, pen, cc = run(state)
_ = fence(state.pos)
print(f"compile+chunk1: {time.perf_counter()-t0:.1f}s", flush=True)
state, pen, cc = run(state)   # settle
_ = fence(state.pos)

t0 = time.perf_counter()
pens = []
for _ in range(2):
    state, pen, cc = run(state)
    pens.append(pen)
_ = fence(state.pos)
dt = time.perf_counter() - t0
sps = 2 * CHUNK / dt
print(f"K={K} vf={VF}: {sps:.1f} steps/s, {N*sps/1e6:.2f}M body-steps/s, "
      f"{1000/sps:.3f} ms/step", flush=True)
print(f"  max_pen over last {2*CHUNK} steps: "
      f"{max(float(p) for p in pens):.3f}  mean contacts {float(cc):.0f}",
      flush=True)
print("finite:", bool(np.all(np.isfinite(np.asarray(state.pos)))),
      "max|v|:", float(jnp.max(jnp.abs(state.vel))), flush=True)
sm = jax.jit(lambda s: step_with_metrics(s, cfg)[1])
m = sm(state)
for k in ("pair_overflow", "contact_overflow", "band_overflow",
          "max_penetration", "contact_count"):
    if k in m:
        print(f"  {k}: {np.asarray(m[k])}", flush=True)

if os.environ.get("TRACE") == "1":
    from physics_tpu.utils.profiling import trace, summarize_trace
    tdir = f"/tmp/trace_rebuild_k{K}"
    with trace(tdir):
        state, pen, cc = run(state)
        _ = fence(state.pos)
    summ = summarize_trace(tdir, top=24)
    tot = sum(ms for ms, _ in summ.values())
    print(f"device total {tot/CHUNK:.3f} ms/step", flush=True)
    for src, (ms, cnt) in summ.items():
        print(f"  {ms/CHUNK*1000:8.1f} us x{cnt/CHUNK:6.2f} {src[:86]}", flush=True)
