"""Quaternion math vs the NumPy oracle (nalgebra conventions)."""

import numpy as np
import jax.numpy as jnp

from physics_tpu.maths import quaternion as quat
from physics_tpu.maths.linalg import inv3x3, skew
from physics_tpu.oracle import reference as oracle


def rand_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_mul_matches_oracle():
    qs = rand_unit_quats(32, 1)
    ps = rand_unit_quats(32, 2)
    ours = np.asarray(quat.mul(jnp.asarray(qs), jnp.asarray(ps)))
    for i in range(32):
        expect = oracle.quat_mul(qs[i], ps[i])
        np.testing.assert_allclose(ours[i], expect, rtol=1e-6, atol=1e-7)


def test_to_matrix_matches_oracle():
    qs = rand_unit_quats(32, 3)
    ours = np.asarray(quat.to_matrix(jnp.asarray(qs)))
    for i in range(32):
        np.testing.assert_allclose(
            ours[i], oracle.quat_to_matrix(qs[i]), rtol=1e-6, atol=1e-7
        )


def test_euler_roundtrip_nalgebra_convention():
    rng = np.random.default_rng(4)
    angles = rng.uniform(-1.4, 1.4, size=(64, 3)).astype(np.float32)
    q = quat.from_euler(
        jnp.asarray(angles[:, 0]), jnp.asarray(angles[:, 1]), jnp.asarray(angles[:, 2])
    )
    back = np.asarray(quat.to_euler(q))
    np.testing.assert_allclose(back, angles, rtol=1e-4, atol=1e-5)


def test_to_euler_matches_oracle():
    qs = rand_unit_quats(64, 5)
    ours = np.asarray(quat.to_euler(jnp.asarray(qs)))
    for i in range(64):
        np.testing.assert_allclose(
            ours[i], oracle.quat_to_euler(qs[i]), rtol=1e-5, atol=1e-6
        )


def test_from_euler_matches_oracle():
    rng = np.random.default_rng(6)
    angles = rng.uniform(-3, 3, size=(32, 3)).astype(np.float32)
    ours = np.asarray(
        quat.from_euler(
            jnp.asarray(angles[:, 0]),
            jnp.asarray(angles[:, 1]),
            jnp.asarray(angles[:, 2]),
        )
    )
    for i in range(32):
        np.testing.assert_allclose(
            ours[i], oracle.quat_from_euler(*angles[i]), rtol=1e-6, atol=1e-7
        )


def test_exp_map_matches_oracle_and_identity():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    ours = np.asarray(quat.exp_map(jnp.asarray(v)))
    for i in range(16):
        np.testing.assert_allclose(
            ours[i], oracle.quat_from_scaled_axis(v[i]), rtol=1e-6, atol=1e-7
        )
    # exact identity at zero (nalgebra from_scaled_axis semantics)
    z = np.asarray(quat.exp_map(jnp.zeros((1, 3))))
    np.testing.assert_array_equal(z[0], np.array([1, 0, 0, 0], np.float32))


def test_rotate_matches_matrix():
    qs = rand_unit_quats(16, 8)
    rng = np.random.default_rng(9)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    via_quat = np.asarray(quat.rotate(jnp.asarray(qs), jnp.asarray(v)))
    mats = np.asarray(quat.to_matrix(jnp.asarray(qs)))
    via_mat = np.einsum("nij,nj->ni", mats, v)
    np.testing.assert_allclose(via_quat, via_mat, rtol=1e-5, atol=1e-6)


def test_inv3x3_matches_numpy():
    rng = np.random.default_rng(10)
    m = rng.normal(size=(8, 3, 3)).astype(np.float32)
    m = m + 3.0 * np.eye(3)  # well-conditioned
    ours = np.asarray(inv3x3(jnp.asarray(m)))
    for i in range(8):
        np.testing.assert_allclose(
            ours[i], np.linalg.inv(m[i].astype(np.float64)), rtol=1e-4, atol=1e-5
        )


def test_skew():
    v = np.array([[1.0, 2.0, 3.0]], np.float32)
    u = np.array([[-4.0, 5.0, 0.5]], np.float32)
    s = np.asarray(skew(jnp.asarray(v)))
    np.testing.assert_allclose(
        s[0] @ u[0], np.cross(v[0], u[0]), rtol=1e-6, atol=1e-6
    )
