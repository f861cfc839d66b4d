"""Joint row assembly + matrix-free matvecs vs dense oracle Jacobians."""

import numpy as np
import jax.numpy as jnp

from physics_tpu.scene import SceneBuilder
from physics_tpu.solver.joints import j_matvec, joint_rows, jt_matvec
from physics_tpu.oracle import reference as oracle


def dense_j(rows, n):
    """Expand our block rows into the dense [R, 6N] matrix for comparison."""
    jn = rows.c.shape[0]
    out = np.zeros((jn * 3, 6 * n), np.float32)
    ja = np.asarray(rows.j_a)
    jb = np.asarray(rows.j_b)
    for j in range(jn):
        a = int(rows.body_a[j])
        b = int(rows.body_b[j])
        out[j * 3:j * 3 + 3, a * 6:a * 6 + 6] += ja[j]
        out[j * 3:j * 3 + 3, b * 6:b * 6 + 6] += jb[j]
    return out


def test_fix_point_and_orientation_rows_match_oracle():
    b = SceneBuilder()
    i = b.add_body(pos=(1.0, 0.5, -0.25), euler=(0.3, -0.2, 0.1))
    b.fix_to_point(i, (0.1, 0.2, 0.3))
    b.fix_orientation(i, (0.0, 0.1, 0.0))
    state = b.build()
    rows = joint_rows(state)

    body = oracle.OracleBody()
    body.position = np.asarray(state.pos[0])
    body.rotation = np.asarray(state.quat[0])
    con1 = oracle.OracleFixToPoint(0, np.array([0.1, 0.2, 0.3], np.float32))
    con2 = oracle.OracleFixedOrientation(0, np.array([0.0, 0.1, 0.0], np.float32))

    c1, j1, _, ks1, kd1 = con1.calculate([body])
    c2, j2, _, ks2, kd2 = con2.calculate([body])

    np.testing.assert_allclose(np.asarray(rows.c[0]), c1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rows.c[1]), c2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rows.j_a[0]), j1[:, :6])
    np.testing.assert_allclose(np.asarray(rows.j_a[1]), j2[:, :6])
    np.testing.assert_allclose(np.asarray(rows.ks[0]), ks1)
    np.testing.assert_allclose(np.asarray(rows.kd[1]), kd2)


def test_matvecs_match_dense():
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    for k in range(4):
        b.add_body(pos=rng.normal(size=3), euler=rng.normal(size=3) * 0.3)
    b.fix_to_point(0, (0, 0, 0))
    b.ball_joint(1, 2, (0.5, 0, 0), (-0.5, 0, 0))
    b.distance_joint(2, 3, (0, 0.3, 0), (0, -0.3, 0), 1.5)
    b.fix_orientation(3, (0, 0, 0))
    state = b.build()
    rows = joint_rows(state)
    n = state.num_bodies
    jd = dense_j(rows, n)

    x = rng.normal(size=(n, 6)).astype(np.float32)
    ours = np.asarray(j_matvec(rows, jnp.asarray(x)))
    np.testing.assert_allclose(ours, jd @ x.reshape(-1), rtol=1e-5, atol=1e-5)

    lam = rng.normal(size=jd.shape[0]).astype(np.float32)
    ours_t = np.asarray(jt_matvec(rows, jnp.asarray(lam), n)).reshape(-1)
    np.testing.assert_allclose(ours_t, jd.T @ lam, rtol=1e-5, atol=1e-5)


def test_inactive_slots_contribute_nothing():
    b = SceneBuilder()
    b.add_body(pos=(0, 1, 0))
    b.fix_to_point(0, (0, 0, 0))
    state = b.build(joint_capacity=8)  # 7 empty slots
    rows = joint_rows(state)
    assert np.all(np.asarray(rows.rowmask)[1:] == 0)
    x = jnp.ones((1, 6), jnp.float32)
    y = np.asarray(j_matvec(rows, x)).reshape(8, 3)
    assert np.all(y[1:] == 0)


def test_ball_joint_row_velocity_consistency():
    """Numeric check: J q̇ ≈ dC/dt for the ball joint."""
    rng = np.random.default_rng(11)
    b = SceneBuilder()
    b.add_body(pos=(0.0, 0.0, 0.0), euler=(0.2, -0.1, 0.4),
               vel=rng.normal(size=3) * 0.1, omega=rng.normal(size=3) * 0.1)
    b.add_body(pos=(1.0, 0.0, 0.0), euler=(-0.3, 0.2, 0.0),
               vel=rng.normal(size=3) * 0.1, omega=rng.normal(size=3) * 0.1)
    b.ball_joint(0, 1, (0.5, 0.1, 0.0), (-0.5, 0.0, 0.1))
    state = b.build()
    rows = joint_rows(state)

    qdot = np.concatenate(
        [np.asarray(state.vel), np.asarray(state.omega)], axis=1
    ).astype(np.float32)
    c_dot_pred = np.asarray(j_matvec(rows, jnp.asarray(qdot)))[:3]

    # finite difference of C under a kinematic (velocity-only) advance
    from physics_tpu.maths import quaternion as quat

    eps = 1e-4
    pos2 = state.pos + state.vel * eps
    dq = quat.exp_map(state.omega * eps)
    quat2 = quat.mul(dq, state.quat)
    state2 = state.replace(pos=pos2, quat=quat2)
    c0 = np.asarray(rows.c[0])
    c1 = np.asarray(joint_rows(state2).c[0])
    c_dot_fd = (c1 - c0) / eps
    np.testing.assert_allclose(c_dot_pred, c_dot_fd, rtol=1e-2, atol=1e-3)


def test_checkpoint_orbax_roundtrip(tmp_path):
    from physics_tpu.io import checkpoint
    from physics_tpu.scene import demo_scene
    import jax.numpy as jnp

    state = demo_scene()
    state = state.replace(vel=state.vel + 1.5)
    checkpoint.save_orbax(str(tmp_path / "ck"), state)
    back = checkpoint.load_orbax(str(tmp_path / "ck"), demo_scene())
    np.testing.assert_array_equal(np.asarray(back.vel), np.asarray(state.vel))
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(state.pos))
