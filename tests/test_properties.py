"""Property tests (SURVEY.md §4 item 3): integrator conservation laws,
Baumgarte drift boundedness, and solver invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from physics_tpu import SceneBuilder, SimConfig
from physics_tpu.engine import rollout
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import demo_scene


def test_free_body_conserves_momentum():
    """No forces ⇒ v, ω exactly constant; x advances linearly (symplectic
    Euler is exact for force-free motion)."""
    b = SceneBuilder()
    b.add_body(pos=(0, 0, 0), vel=(0.3, -0.2, 0.1), omega=(0.5, 0.25, -0.4),
               inertia=np.diag([0.2, 0.3, 0.4]).astype(np.float32))
    cfg = SimConfig(compat=False, gravity=(0.0, 0.0, 0.0), dt=1.0 / 60.0)
    final, _ = rollout(b.build(), cfg, num_steps=500)
    np.testing.assert_allclose(np.asarray(final.vel[0]), [0.3, -0.2, 0.1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(final.omega[0]),
                               [0.5, 0.25, -0.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(final.pos[0]),
                               np.array([0.3, -0.2, 0.1]) * 500 / 60.0,
                               rtol=1e-5)


def test_projectile_velocity_closed_form():
    """Symplectic Euler's velocity update is exact for constant gravity:
    v_n = v0 + n·g·dt, x_n = x0 + Σ_{k≤n} v_k·dt."""
    b = SceneBuilder()
    b.add_body(pos=(0, 10.0, 0), vel=(1.0, 2.0, 0.0))
    cfg = SimConfig(compat=False, dt=1.0 / 60.0)
    n, dt, g = 200, 1.0 / 60.0, -9.81
    final, _ = rollout(b.build(), cfg, num_steps=n)
    np.testing.assert_allclose(float(final.vel[0, 1]), 2.0 + n * g * dt,
                               rtol=1e-5)
    # x_n = x0 + n v0 dt + g dt² n(n+1)/2 (velocity-first update order)
    y_expect = 10.0 + n * 2.0 * dt + g * dt * dt * n * (n + 1) / 2
    np.testing.assert_allclose(float(final.pos[0, 1]), y_expect, rtol=1e-4)


def test_baumgarte_constraint_drift_bounded():
    """The demo's FixToPoint (ks=10, kd=1) keeps ‖C‖ = ‖pos − target‖
    bounded over a long horizon — Baumgarte stabilization must not let the
    constraint error grow secularly (reference constants,
    fixed_position_constraint.rs:5-6)."""
    from physics_tpu.config import compat_config

    final, traj = rollout(demo_scene(), compat_config(dt=1.0 / 60.0),
                          num_steps=600, sample_every=20)
    pos = np.asarray(traj[0])[:, 0, :]          # [30, 3]
    r = np.linalg.norm(pos, axis=-1)
    assert np.isfinite(r).all()
    # starts at |C| = 1 (cube at (1,0,0), target origin); swings but the
    # envelope stays bounded — and is decaying by the end of the horizon
    assert r.max() < 1.5, r.max()
    assert r[-5:].max() <= r[:5].max() + 1e-3


def test_friction_cone_invariant():
    """Converged contact impulses satisfy λₙ ≥ 0 and |λₜ| ≤ μ·λₙ per slot."""
    from physics_tpu.engine import step
    from physics_tpu.ops.broadphase import pair_candidates
    from physics_tpu.ops.narrowphase import (
        concat_contacts, convex_data, ground_contacts, pair_contacts,
    )
    from physics_tpu.solver.contacts import solve_impulses

    rng = np.random.default_rng(5)
    b = SceneBuilder()
    for k in range(4):
        i = b.add_body(pos=rng.uniform([-0.6, 0.3, -0.6], [0.6, 1.6, 0.6]),
                       euler=rng.uniform(-0.4, 0.4, 3),
                       vel=rng.uniform(-1, 1, 3),
                       inertia=box_inertia((0.4,) * 3, 1.0))
        b.set_box(i, (0.4, 0.4, 0.4), friction=0.7)
    state = b.build()
    cfg = SimConfig(ground_plane=True, pair_collisions=True,
                    contact_iters=32, dt=1.0 / 60.0)

    def solve(s):
        cvx = convex_data(s)
        contacts = concat_contacts(
            ground_contacts(s, cvx, cfg),
            pair_contacts(s, cvx, pair_candidates(s, cfg), cfg),
        )
        _, _, _, _, lam3, _ = solve_impulses(s, contacts, cfg)
        return lam3, contacts.friction, contacts.active

    lam3, mu, active = jax.jit(solve)(state)
    lam3, mu, active = np.asarray(lam3), np.asarray(mu), np.asarray(active)
    lam_n, lam_t1, lam_t2 = lam3
    assert (lam_n >= -1e-6).all()
    lim = mu * lam_n + 1e-5
    assert (np.abs(lam_t1[active]) <= lim[active]).all()
    assert (np.abs(lam_t2[active]) <= lim[active]).all()
    assert lam_n[active].max() > 0  # something actually collided
