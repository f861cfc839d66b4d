"""Failure detection + auto-reset tests."""

import numpy as np
import jax
import jax.numpy as jnp

from physics_tpu import SimConfig
from physics_tpu.envs import (
    auto_reset_step,
    env_ok,
    randomize_positions,
    stack_states,
    where_env,
)
from physics_tpu.scenes import random_env


def test_env_ok_detects_nan_and_unbounded():
    state = random_env(0, 4)
    batched = stack_states(state, 3)
    bad_pos = batched.pos.at[1, 0, 0].set(jnp.nan)
    bad = batched.replace(pos=bad_pos)
    np.testing.assert_array_equal(np.asarray(env_ok(bad)), [True, False, True])

    runaway = batched.replace(vel=batched.vel.at[2].set(1e9))
    np.testing.assert_array_equal(
        np.asarray(env_ok(runaway)), [True, True, False]
    )


def test_where_env_selects_per_env():
    state = random_env(1, 4)
    a = stack_states(state, 2)
    b = jax.tree_util.tree_map(jnp.zeros_like, a)
    mask = jnp.array([True, False])
    out = where_env(mask, a, b)
    np.testing.assert_allclose(np.asarray(out.pos[0]), np.asarray(a.pos[0]))
    np.testing.assert_allclose(np.asarray(out.pos[1]), 0.0)


def test_auto_reset_replaces_diverged_env():
    cfg = SimConfig(compat=False, ground_plane=True, dt=1.0 / 120.0,
                    contact_iters=8)
    state = random_env(2, 4)
    initial = stack_states(state, 4)
    batched = randomize_positions(initial, jax.random.PRNGKey(0), 0.2)

    # poison env 2 with NaN velocity — it must come back as `initial[2]`
    poisoned = batched.replace(vel=batched.vel.at[2, 0, 0].set(jnp.nan))
    stepped = jax.jit(auto_reset_step(cfg))
    out, metrics = stepped(poisoned, initial)

    assert int(metrics["resets"]) == 1
    assert np.all(np.isfinite(np.asarray(out.pos)))
    np.testing.assert_allclose(
        np.asarray(out.pos[2]), np.asarray(initial.pos[2])
    )
    # healthy envs actually stepped (gravity pulled them down)
    assert float(out.vel[0, 0, 1]) < 0.0


def test_auto_reset_noop_when_healthy():
    cfg = SimConfig(compat=False, ground_plane=True, dt=1.0 / 120.0,
                    contact_iters=8)
    state = random_env(3, 4)
    initial = stack_states(state, 4)
    stepped = jax.jit(auto_reset_step(cfg))
    out, metrics = stepped(initial, initial)
    assert int(metrics["resets"]) == 0
