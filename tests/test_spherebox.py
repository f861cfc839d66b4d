"""Analytic sphere-box narrow phase: face, edge, corner regions."""

import pytest
import jax.numpy as jnp
import numpy as np

from physics_tpu.config import SimConfig
from physics_tpu.engine import step
from physics_tpu.io.meshes import box_inertia, sphere_inertia
from physics_tpu.ops.broadphase import pair_candidates
from physics_tpu.ops.narrowphase import convex_data, pair_contacts
from physics_tpu.scene import SceneBuilder

CFG = SimConfig(ground_plane=False, pair_collisions=True)


def _pair_scene(sphere_pos, r=0.5, half=(1.0, 1.0, 1.0)):
    b = SceneBuilder()
    i = b.add_body(pos=(0, 0, 0), inertia=box_inertia(half, 1.0))
    b.set_box(i, half)
    j = b.add_body(pos=sphere_pos, inertia=sphere_inertia(r, 1.0))
    b.set_sphere(j, r)
    return b.build()


def _contacts(state):
    cvx = convex_data(state)
    cand = pair_candidates(state, CFG)
    cts = pair_contacts(state, cvx, cand, CFG)
    act = np.asarray(cts.active)
    return cts, act


def test_face_region():
    # sphere above the +y face, overlapping by 0.1
    state = _pair_scene((0.0, 1.4, 0.0))
    cts, act = _contacts(state)
    assert act.sum() == 1
    k = np.argmax(act)
    np.testing.assert_allclose(np.asarray(cts.depth)[k], 0.1, atol=1e-6)
    n = np.asarray(cts.normal)[:, k]
    # normal B→A: A is the box, B the sphere → points sphere→box = −y
    np.testing.assert_allclose(n, [0, -1, 0], atol=1e-6)


def test_edge_region():
    # sphere diagonally off the +x+y edge
    d = 1.0 + 0.3 / np.sqrt(2)
    state = _pair_scene((d, d, 0.0))
    cts, act = _contacts(state)
    assert act.sum() == 1
    k = np.argmax(act)
    # distance from edge to center = 0.3·√2... compute: center-(1,1,0),
    # closest point (1,1,0)+clip → dist = |(d-1, d-1, 0)| = 0.3
    np.testing.assert_allclose(np.asarray(cts.depth)[k], 0.2, atol=1e-5)
    n = np.asarray(cts.normal)[:, k]
    np.testing.assert_allclose(n, [-1 / np.sqrt(2), -1 / np.sqrt(2), 0],
                               atol=1e-5)


def test_corner_region():
    off = 1.0 + 0.4 / np.sqrt(3)
    state = _pair_scene((off, off, off))
    cts, act = _contacts(state)
    assert act.sum() == 1
    k = np.argmax(act)
    np.testing.assert_allclose(np.asarray(cts.depth)[k], 0.1, atol=1e-5)
    n = np.asarray(cts.normal)[:, k]
    np.testing.assert_allclose(n, [-1 / np.sqrt(3)] * 3, atol=1e-5)


def test_separated_no_contact():
    state = _pair_scene((0.0, 1.6, 0.0))
    _, act = _contacts(state)
    assert act.sum() == 0


@pytest.mark.slow
def test_sphere_rests_on_box():
    b = SceneBuilder()
    i = b.add_body(pos=(0, 0.5, 0), inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_box(i, (0.5,) * 3)
    b.set_static(i) if hasattr(b, "set_static") else None
    j = b.add_body(pos=(0, 1.6, 0), inertia=sphere_inertia(0.3, 1.0))
    b.set_sphere(j, 0.3, friction=0.6)
    state = b.build()
    cfg = SimConfig(ground_plane=True, pair_collisions=True,
                    contact_iters=16)
    for _ in range(60):
        state = step(state, cfg)
    y = float(state.pos[1, 1])
    # sphere settles on the box top: y ≈ 1.0 + 0.3
    assert abs(y - 1.3) < 0.05, y
