"""4k-pile step benchmark: jacobi vs pallas_banded solver on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from physics_tpu.engine import step, step_with_metrics, prepare_contacts
from physics_tpu.scenes import box_pile, pile_config
from physics_tpu.utils.profiling import fence, trace, summarize_trace

N = 4096
CHUNK = 120
print("backend:", jax.default_backend(), flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
cfg = pile_config(N).replace(contact_iters=8)
if which != "pallas":
    # XLA jacobi leg: the anchored rebuild needs the table path
    cfg = cfg.replace(contact_solver="jacobi", contact_rebuild=1)

state = box_pile(N)
state = prepare_contacts(state, cfg)


@partial(jax.jit, donate_argnums=0)
def run(s):
    def body(s2, _):
        return step(s2, cfg), None
    out, _ = jax.lax.scan(body, s, None, length=CHUNK)
    return out


t0 = time.perf_counter()
state = run(state)
_ = fence(state.pos)
print(f"compile+chunk1: {time.perf_counter()-t0:.1f}s", flush=True)
state = run(state)   # settle
_ = fence(state.pos)

t0 = time.perf_counter()
for _ in range(2):
    state = run(state)
_ = fence(state.pos)
dt = time.perf_counter() - t0
sps = 2 * CHUNK / dt
print(f"{which}: {sps:.1f} steps/s, {N*sps/1e6:.2f}M body-steps/s, "
      f"{1000/sps:.2f} ms/step", flush=True)
print("finite:", bool(np.all(np.isfinite(np.asarray(state.pos)))),
      "max|v|:", float(jnp.max(jnp.abs(state.vel))), flush=True)

# overflow check + metrics
sm = jax.jit(lambda s: step_with_metrics(s, cfg)[1])
m = sm(state)
for k, v in m.items():
    print(f"  {k}: {np.asarray(v)}", flush=True)

if os.environ.get("TRACE") == "1":
    tdir = f"/tmp/trace_pile_{which}"
    with trace(tdir):
        state = run(state)
        _ = fence(state.pos)
    summ = summarize_trace(tdir, top=18)
    tot = sum(ms for ms, _ in summ.values())
    print(f"device total {tot/CHUNK:.3f} ms/step", flush=True)
    for src, (ms, cnt) in summ.items():
        print(f"  {ms/CHUNK*1000:8.1f} us x{cnt/CHUNK:6.1f} {src[:86]}")
