"""The component-form batched SAT must match the per-pair reference kernel
(ops.boxbox.box_box_manifold) on random pair batches — same depths, normals,
points, and validity, up to slot permutation within a pair."""

import numpy as np
import jax
import jax.numpy as jnp

from physics_tpu.maths import quaternion as quat
from physics_tpu.maths import vec3c as v3
from physics_tpu.ops.boxbox import box_box_manifold
from physics_tpu.ops.boxbox_batched import box_box_manifold_batched


def _random_batch(p, seed, spread=1.2):
    rng = np.random.default_rng(seed)
    pos_a = rng.uniform(-spread, spread, (p, 3)).astype(np.float32)
    pos_b = rng.uniform(-spread, spread, (p, 3)).astype(np.float32)
    qa = quat.from_euler(*[jnp.asarray(rng.uniform(-1, 1, p), jnp.float32)
                           for _ in range(3)])
    qb = quat.from_euler(*[jnp.asarray(rng.uniform(-1, 1, p), jnp.float32)
                           for _ in range(3)])
    ha = rng.uniform(0.3, 0.9, (p, 3)).astype(np.float32)
    hb = rng.uniform(0.3, 0.9, (p, 3)).astype(np.float32)
    return jnp.asarray(pos_a), qa, jnp.asarray(ha), \
        jnp.asarray(pos_b), qb, jnp.asarray(hb)


def _sorted_rows(pts, nrm, dep, val):
    """Canonical per-pair manifold: active rows (point, normal, depth)
    sorted lexicographically."""
    out = []
    for i in range(pts.shape[0]):
        rows = [
            tuple(np.round(np.concatenate([pts[i, k], nrm[i, k],
                                           [dep[i, k]]]), 4))
            for k in range(pts.shape[1]) if val[i, k]
        ]
        out.append(sorted(rows))
    return out


def test_batched_matches_per_pair():
    p = 64
    pa, qa, ha, pb, qb, hb = _random_batch(p, seed=0)

    ref_p, ref_n, ref_d, ref_v = jax.vmap(box_box_manifold)(
        pa, quat.to_matrix(qa), ha, pb, quat.to_matrix(qb), hb)

    man = box_box_manifold_batched(
        v3.unpack(pa), v3.quat_to_mat(qa), v3.unpack(ha),
        v3.unpack(pb), v3.quat_to_mat(qb), v3.unpack(hb))
    bat_p = np.stack(
        [np.stack([np.asarray(c) for c in pt], axis=-1) for pt in man.points],
        axis=1,
    )  # [P, CAP, 3]
    bat_n = np.broadcast_to(
        np.stack([np.asarray(c) for c in man.normal], -1)[:, None, :],
        bat_p.shape)
    bat_d = np.stack([np.asarray(d) for d in man.depth], axis=1)
    bat_v = np.stack([np.asarray(v) for v in man.valid], axis=1)

    ref_rows = _sorted_rows(np.asarray(ref_p), np.asarray(ref_n),
                            np.asarray(ref_d), np.asarray(ref_v))
    bat_rows = _sorted_rows(bat_p, bat_n, bat_d, bat_v)
    mismatches = sum(1 for i in range(p) if ref_rows[i] != bat_rows[i])
    assert mismatches == 0, f"{mismatches}/{p} pairs differ"


def test_batched_stack_case():
    """Axis-aligned resting stack: full 4-point face manifold, +y normal."""
    pa = jnp.asarray([[0.0, 0.98, 0.0]], jnp.float32)
    pb = jnp.zeros((1, 3), jnp.float32)
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    h = jnp.full((1, 3), 0.5, jnp.float32)
    man = box_box_manifold_batched(
        v3.unpack(pa), v3.quat_to_mat(q), v3.unpack(h),
        v3.unpack(pb), v3.quat_to_mat(q), v3.unpack(h))
    val = np.stack([np.asarray(x) for x in man.valid], 1)[0]
    dep = np.stack([np.asarray(x) for x in man.depth], 1)[0]
    assert val.sum() == 4
    np.testing.assert_allclose(dep[val], 0.02, atol=1e-5)
    n = [float(c[0]) for c in man.normal]
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-6)
