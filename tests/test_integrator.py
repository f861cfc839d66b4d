"""Compat integrator vs the oracle's RigidBody::step, op-for-op."""

import numpy as np
import jax
import jax.numpy as jnp

from physics_tpu.config import compat_config
from physics_tpu.ops.integrator import integrate
from physics_tpu.oracle import reference as oracle
from physics_tpu.state import make_state


def make_random_bodies(n, seed):
    rng = np.random.default_rng(seed)
    bodies = []
    for _ in range(n):
        b = oracle.OracleBody()
        b.position = rng.normal(size=3).astype(np.float32)
        q = rng.normal(size=4).astype(np.float32)
        b.rotation = (q / np.linalg.norm(q)).astype(np.float32)
        b.lin_velocity = rng.normal(size=3).astype(np.float32)
        b.angular_velocity = rng.normal(size=3).astype(np.float32)
        b.force = rng.normal(size=3).astype(np.float32)
        b.torque = rng.normal(size=3).astype(np.float32)
        b.mass = np.float32(rng.uniform(0.5, 3.0))
        a = rng.normal(size=(3, 3)).astype(np.float32)
        b.inertia_tensor = (a @ a.T + 2.0 * np.eye(3)).astype(np.float32)
        bodies.append(b)
    return bodies


def state_from_bodies(bodies):
    return make_state(
        pos=np.stack([b.position for b in bodies]),
        quat=np.stack([b.rotation for b in bodies]),
        vel=np.stack([b.lin_velocity for b in bodies]),
        omega=np.stack([b.angular_velocity for b in bodies]),
        mass=np.array([b.mass for b in bodies]),
        inertia=np.stack([b.inertia_tensor for b in bodies]),
    ).replace(
        force=jnp.asarray(np.stack([b.force for b in bodies])),
        torque=jnp.asarray(np.stack([b.torque for b in bodies])),
    )


def test_compat_integrator_matches_oracle_step():
    bodies = make_random_bodies(16, seed=42)
    state = state_from_bodies(bodies)
    cfg = compat_config(dt=1.0 / 60.0)

    new_state = jax.jit(integrate, static_argnums=1)(state, cfg)

    for b in bodies:
        b.step(1.0 / 60.0)

    np.testing.assert_allclose(
        np.asarray(new_state.pos), np.stack([b.position for b in bodies]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.vel), np.stack([b.lin_velocity for b in bodies]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.omega),
        np.stack([b.angular_velocity for b in bodies]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.quat), np.stack([b.rotation for b in bodies]),
        rtol=1e-6, atol=1e-6,
    )
    # forces cleared (reference rigid_body.rs:38-39)
    assert np.all(np.asarray(new_state.force) == 0)
    assert np.all(np.asarray(new_state.torque) == 0)


def test_zero_omega_gate_is_exact():
    """Quirk Q6: rotation untouched when ω is exactly zero."""
    bodies = make_random_bodies(4, seed=1)
    for b in bodies:
        b.angular_velocity = np.zeros(3, np.float32)
        b.torque = np.zeros(3, np.float32)
    state = state_from_bodies(bodies)
    cfg = compat_config()
    new_state = integrate(state, cfg)
    np.testing.assert_array_equal(
        np.asarray(new_state.quat), np.stack([b.rotation for b in bodies])
    )


def test_noncompat_static_bodies_do_not_move():
    state = make_state(
        pos=np.zeros((2, 3), np.float32),
        mass=np.array([np.inf, 1.0], np.float32),
    ).replace(force=jnp.asarray(np.array([[1, 1, 1], [1, 1, 1]], np.float32)))
    from physics_tpu.config import SimConfig

    cfg = SimConfig(compat=False)
    new_state = integrate(state, cfg)
    np.testing.assert_array_equal(np.asarray(new_state.pos[0]), np.zeros(3))
    assert np.all(np.asarray(new_state.vel[0]) == 0)
    assert np.all(np.asarray(new_state.vel[1]) != 0)


def test_noncompat_quat_stays_normalized():
    from physics_tpu.config import SimConfig

    state = make_state(
        pos=np.zeros((1, 3), np.float32),
        omega=np.array([[3.0, -2.0, 1.0]], np.float32),
    )
    cfg = SimConfig(compat=False, dt=0.01)
    for _ in range(100):
        state = integrate(state, cfg)
    n = np.linalg.norm(np.asarray(state.quat[0]))
    assert abs(n - 1.0) < 1e-5
