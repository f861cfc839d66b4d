"""Batched-envs throughput: vmapped vs packed block-diagonal on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from physics_tpu.config import SimConfig
from physics_tpu.engine import step, step_with_metrics, prepare_contacts
from physics_tpu.envs import pack_envs
from physics_tpu.scenes import random_env
from physics_tpu.utils.profiling import fence, trace, summarize_trace

E = int(os.environ.get("E", 4096))
K = 8
CHUNK = 120
print("backend:", jax.default_backend(), f"E={E} K={K}", flush=True)

base = random_env(0, K)
rng = np.random.default_rng(1)
offsets = jnp.asarray(rng.uniform(-1, 1, (E, 1, 3)).astype(np.float32))
batched = jax.vmap(lambda o: base.replace(pos=base.pos + o))(offsets)

cfg = SimConfig(
    ground_plane=True, pair_collisions=True, boxes_only=True,
    contact_iters=8, dt=1.0 / 60.0,
    broadphase="env_blocks", env_block_size=K,
    contact_solver="pallas_banded",
    max_contacts=48 * E if E * 76 > 1 << 17 else 0,
)
# TABLE=1: packed envs through the fused contact table + fully fused
# solve (bp_inkernel identity-order candidates, fuse_prep,
# fuse_integrate) — the env-mode contact_table path
if os.environ.get("TABLE") == "1":
    cfg = cfg.replace(contact_table=True, bp_inkernel=True,
                      bucket_block=128, fuse_prep=True,
                      fuse_integrate=True)
# REBUILD=K: persistent anchored contacts on the packed path (table
# kernel every K-th step; VF/RIT as in experiments/rebuild_bench.py)
if int(os.environ.get("REBUILD", "1")) > 1:
    cfg = cfg.replace(
        contact_rebuild=int(os.environ["REBUILD"]),
        contact_rebuild_vel_factor=float(os.environ.get("VF", "2.0")),
        contact_refresh_iters=int(os.environ.get("RIT", "0")),
        z_bf16=os.environ.get("ZBF", "1") == "1")
packed = prepare_contacts(pack_envs(batched), cfg)
print("contact capacity:", packed.contact_key.shape[0], flush=True)


@partial(jax.jit, donate_argnums=0)
def run(s):
    def body(s2, _):
        return step(s2, cfg), None
    out, _ = jax.lax.scan(body, s, None, length=CHUNK)
    return out


t0 = time.perf_counter()
packed = run(packed)
_ = fence(packed.pos)
print(f"compile+chunk1: {time.perf_counter()-t0:.1f}s", flush=True)
packed = run(packed)
_ = fence(packed.pos)

t0 = time.perf_counter()
for _ in range(2):
    packed = run(packed)
_ = fence(packed.pos)
dt = time.perf_counter() - t0
sps = 2 * CHUNK / dt
print(f"packed[{E}x{K}]: {sps:.1f} steps/s, "
      f"{E*K*sps/1e6:.2f}M body-steps/s, {1000/sps:.2f} ms/step", flush=True)
print("finite:", bool(np.all(np.isfinite(np.asarray(packed.pos)))), flush=True)

m = jax.jit(lambda s: step_with_metrics(s, cfg)[1])(packed)
for k, v in m.items():
    print(f"  {k}: {np.asarray(v)}", flush=True)

if os.environ.get("TRACE") == "1":
    tdir = "/tmp/trace_packed"
    with trace(tdir):
        packed = run(packed)
        _ = fence(packed.pos)
    summ = summarize_trace(tdir, top=16)
    tot = sum(ms for ms, _ in summ.values())
    print(f"device total {tot/CHUNK:.3f} ms/step", flush=True)
    for src, (ms, cnt) in summ.items():
        print(f"  {ms/CHUNK*1000:8.1f} us x{cnt/CHUNK:6.1f} {src[:86]}")
