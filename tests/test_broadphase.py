"""Broad-phase unit tests: AABBs, all-pairs, and sweep-window equivalence."""

import numpy as np
import jax.numpy as jnp

from physics_tpu import SceneBuilder, SimConfig
from physics_tpu.ops.broadphase import (
    allpairs_candidates,
    body_aabbs,
    sweep_candidates,
)
from physics_tpu.maths import quaternion as quat


def random_scene(n, seed, spread=5.0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for k in range(n):
        i = b.add_body(pos=rng.uniform(-spread, spread, 3),
                       euler=rng.uniform(-1, 1, 3))
        if k % 3 == 0:
            b.set_sphere(i, rng.uniform(0.2, 0.8))
        else:
            b.set_box(i, rng.uniform(0.2, 0.8, 3))
    return b.build()


def pairs_set(cand):
    a = np.asarray(cand.body_a)
    b = np.asarray(cand.body_b)
    m = np.asarray(cand.mask)
    return {tuple(sorted((int(x), int(y)))) for x, y, mm in zip(a, b, m) if mm}


def test_sphere_aabb():
    b = SceneBuilder()
    i = b.add_body(pos=(1, 2, 3))
    b.set_sphere(i, 0.5)
    aabbs = np.asarray(body_aabbs(b.build()))
    np.testing.assert_allclose(aabbs[0, 0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(aabbs[0, 1], [1.5, 2.5, 3.5])


def test_rotated_box_aabb_conservative():
    b = SceneBuilder()
    i = b.add_body(pos=(0, 0, 0), euler=(0.0, 0.0, np.pi / 4))
    b.set_box(i, (1.0, 1.0, 1.0))
    state = b.build()
    aabbs = np.asarray(body_aabbs(state))
    # the AABB must contain every rotated corner
    rot = np.asarray(quat.to_matrix(state.quat))[0]
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    world = corners @ rot.T
    assert np.all(world >= aabbs[0, 0] - 1e-5)
    assert np.all(world <= aabbs[0, 1] + 1e-5)
    # 45° about z: x/y extent = √2
    np.testing.assert_allclose(aabbs[0, 1, 0], np.sqrt(2), rtol=1e-5)


def test_allpairs_finds_overlaps_only():
    b = SceneBuilder()
    for x in (0.0, 0.9, 5.0):
        i = b.add_body(pos=(x, 0, 0))
        b.set_sphere(i, 0.5)
    state = b.build()
    cand = allpairs_candidates(state, body_aabbs(state))
    assert pairs_set(cand) == {(0, 1)}


def test_sweep_matches_allpairs_random():
    state = random_scene(64, seed=0)
    aabbs = body_aabbs(state)
    truth = pairs_set(allpairs_candidates(state, aabbs))
    sweep = sweep_candidates(state, aabbs, window=63)
    assert pairs_set(sweep) == truth
    assert int(sweep.overflow) == 0


def test_sweep_window_overflow_detected():
    # 40 bodies all overlapping at the origin: window 8 cannot cover them
    b = SceneBuilder()
    for _ in range(40):
        i = b.add_body(pos=(0, 0, 0))
        b.set_sphere(i, 1.0)
    state = b.build()
    sweep = sweep_candidates(state, body_aabbs(state), window=8)
    assert int(sweep.overflow) > 0  # loudly reported, never silent


def test_noncollidable_bodies_ignored():
    b = SceneBuilder()
    b.add_body(pos=(0, 0, 0))            # no shape
    i = b.add_body(pos=(0.1, 0, 0))
    b.set_sphere(i, 1.0)
    state = b.build()
    cand = allpairs_candidates(state, body_aabbs(state))
    assert pairs_set(cand) == set()


def test_sweep_pallas_kernel_matches_oracle():
    """The Pallas window-mask kernel must match a NumPy oracle (runs only
    when a TPU is attached; the CPU path uses the XLA formulation)."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU kernel requires a TPU backend")
    import jax.numpy as jnp
    from physics_tpu.ops.sweep_pallas import sweep_window_masks

    rng = np.random.default_rng(0)
    n, k = 256, 16
    mins = np.sort(rng.uniform(-10, 10, (n, 3)).astype(np.float32), axis=0)
    ext = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    aabbs = np.stack([mins, mins + ext], axis=1)
    aabbs = aabbs[np.argsort(aabbs[:, 0, 0])]
    coll = rng.uniform(size=n) > 0.1

    _, full_t = sweep_window_masks(jnp.asarray(aabbs), jnp.asarray(coll), k)
    ref = np.zeros((k, n), bool)
    for d in range(1, k + 1):
        nb_min = np.full((n, 3), np.inf, np.float32)
        nb_max = np.full((n, 3), -np.inf, np.float32)
        nb_c = np.zeros(n, bool)
        nb_min[: n - d] = aabbs[d:, 0]
        nb_max[: n - d] = aabbs[d:, 1]
        nb_c[: n - d] = coll[d:]
        lo = np.maximum(aabbs[:, 0], nb_min)
        hi = np.minimum(aabbs[:, 1], nb_max)
        ref[d - 1] = np.all(lo <= hi, axis=-1) & coll & nb_c
    np.testing.assert_array_equal(np.asarray(full_t), ref)
