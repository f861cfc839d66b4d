"""Bisect which part of the SAT manifold Mosaic rejects."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.maths import vec3c as v3
from physics_tpu.ops import boxbox_batched as bb

TILE = 512
rng = np.random.default_rng(0)
ta = jnp.asarray(rng.standard_normal((16, TILE)).astype(np.float32))
tb = jnp.asarray(rng.standard_normal((16, TILE)).astype(np.float32))

STAGE = int(sys.argv[1])


def kernel(ta_ref, tb_ref, out_ref):
    A = ta_ref[:]
    B = tb_ref[:]
    pa = (A[0], A[1], A[2])
    ra9 = tuple(A[3 + k] for k in range(9))
    ha = (jnp.abs(A[12]) + 0.1, jnp.abs(A[13]) + 0.1, jnp.abs(A[14]) + 0.1)
    pb = (B[0], B[1], B[2])
    rb9 = tuple(B[3 + k] for k in range(9))
    hb = (jnp.abs(B[12]) + 0.1, jnp.abs(B[13]) + 0.1, jnp.abs(B[14]) + 0.1)

    t_w = v3.sub(pb, pa)
    u = bb._axis_cols(ra9)
    w = bb._axis_cols(rb9)
    axes = list(u) + list(w)
    cross_axes, cross_ok = [], []
    for i in range(3):
        for j in range(3):
            cx = v3.cross(u[i], w[j])
            nn = v3.norm(cx)
            cross_ok.append(nn > bb._PARALLEL_EPS)
            cross_axes.append(v3.scale(cx, 1.0 / jnp.maximum(nn, 1e-6)))
    axes = axes + cross_axes

    def proj(axis, half, cols):
        return (half[0] * jnp.abs(v3.dot(axis, cols[0]))
                + half[1] * jnp.abs(v3.dot(axis, cols[1]))
                + half[2] * jnp.abs(v3.dot(axis, cols[2])))

    dist = [v3.dot(ax, t_w) for ax in axes]
    sep = []
    for k in range(15):
        s = jnp.abs(dist[k]) - (proj(axes[k], ha, u) + proj(axes[k], hb, w))
        if k >= 6:
            s = jnp.where(cross_ok[k - 6], s, -jnp.inf)
        sep.append(s)

    if STAGE == 1:
        out_ref[:] = jnp.stack(sep + [sep[0]] * (24 - 15))
        return

    best_face_sep, best_face = bb._argmax_unrolled(sep[:6])
    if STAGE == 2:
        out_ref[:] = jnp.stack(
            [best_face_sep, best_face.astype(jnp.float32)] * 12)
        return

    # clip a static quad against a square, mosaic mode
    pu = jnp.stack([A[0], A[1], -A[0], -A[1]] + [A[0]] * 4)
    pv = jnp.stack([B[0], -B[0], B[1], -B[1]] + [B[0]] * 4)
    ps = jnp.stack([A[2]] * 8)
    m = jnp.full((TILE,), 4, jnp.int32)
    one = jnp.ones((TILE,), jnp.float32)
    pu2, pv2, ps2, m2 = bb._clip(pu, pv, ps, m, one, 0.0, one, True)
    if STAGE == 3:
        out_ref[:] = jnp.concatenate(
            [pu2, pv2, ps2[:7], m2[None].astype(jnp.float32)])
        return

    if STAGE == 4:
        # integer // and % on vectors
        best_edge = (A[5] > 0).astype(jnp.int32) * 7
        ei = best_edge // 3
        ej = best_edge % 3
        out_ref[:] = jnp.stack([ei.astype(jnp.float32),
                                ej.astype(jnp.float32)] * 12)
        return

    if STAGE == 5:
        # bool-times-float arithmetic
        ei = (A[5] > 0).astype(jnp.int32)
        val = jnp.sign(A[6] + 1e-30) * (ei != 1) * jnp.abs(A[7])
        out_ref[:] = jnp.stack([val] * 24)
        return


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
    print(f"STAGE {STAGE}: COMPILED in {time.time()-t0:.0f}s, "
          f"finite={np.all(np.isfinite(out))}", flush=True)
except Exception as e:
    print(f"STAGE {STAGE}: FAIL {type(e).__name__}: {str(e)[:200]}",
          flush=True)
