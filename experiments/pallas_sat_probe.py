"""Probe: does Mosaic compile box_box_manifold_batched inside a kernel?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.ops.boxbox_batched import box_box_manifold_batched, _CAP

print("backend:", jax.default_backend(), flush=True)

TILE = 512
rng = np.random.default_rng(0)


def rand_rot(n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y),
    ], 1).astype(np.float32)


pa = rng.uniform(-0.3, 0.3, (TILE, 3)).astype(np.float32)
pb = np.zeros((TILE, 3), np.float32)
ra = rand_rot(TILE)
rb = rand_rot(TILE)
ha = np.full((TILE, 3), 0.5, np.float32)
hb = np.full((TILE, 3), 0.5, np.float32)

# inputs packed as [18, TILE]: pa3 | ra9 | ha3 | (pb/rb/hb in a 2nd table)
ta = jnp.asarray(np.concatenate([pa.T, ra.T, ha.T]))       # [15, TILE]
tb = jnp.asarray(np.concatenate([pb.T, rb.T, hb.T]))
ta = jnp.pad(ta, ((0, 1), (0, 0)))
tb = jnp.pad(tb, ((0, 1), (0, 0)))                          # [16, TILE]


def kernel(ta_ref, tb_ref, out_ref):
    A = ta_ref[:]
    B = tb_ref[:]
    man = box_box_manifold_batched(
        (A[0], A[1], A[2]), tuple(A[3 + k] for k in range(9)),
        (A[12], A[13], A[14]),
        (B[0], B[1], B[2]), tuple(B[3 + k] for k in range(9)),
        (B[12], B[13], B[14]), mosaic=True,
    )
    rows = []
    for s in range(_CAP):
        rows.append(jnp.where(man.valid[s], man.depth[s], 0.0))
    rows += [man.normal[0], man.normal[1], man.normal[2]]
    for s in range(4):
        rows += [man.points[s][0], man.points[s][1], man.points[s][2]]
    rows += [jnp.zeros((TILE,), jnp.float32)] * (24 - len(rows))
    out_ref[:] = jnp.stack(rows)


@jax.jit
def run(ta, tb):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((24, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ta, tb)


t0 = time.time()
try:
    out = np.asarray(run(ta, tb))
    print(f"COMPILED in {time.time()-t0:.0f}s", flush=True)
except Exception as e:
    print("FAIL:", type(e).__name__, str(e)[:400], flush=True)
    sys.exit(1)

# reference: same function outside the kernel
man = box_box_manifold_batched(
    tuple(jnp.asarray(pa.T)), tuple(jnp.asarray(ra.T)),
    tuple(jnp.asarray(ha.T)),
    tuple(jnp.asarray(pb.T)), tuple(jnp.asarray(rb.T)),
    tuple(jnp.asarray(hb.T)),
)
ref_d = np.stack([np.where(np.asarray(man.valid[s]),
                           np.asarray(man.depth[s]), 0.0)
                  for s in range(_CAP)])
err = np.abs(out[:_CAP] - ref_d).max()
print(f"depth err vs XLA: {err:.2e}", flush=True)
