"""Batched environments: failure detection and auto-reset.

The reference's failure story is `unwrap()` panics (SURVEY.md §5); a batched
TPU simulation can't crash one env without losing the other 4095. Instead,
divergence (NaN/Inf from explosive stacking or bad user forces) is detected
in-step per environment and the offending env is reset to its initial state
— RL-style — while a reset counter surfaces the event in metrics. Pure
function transformations; everything stays inside one jitted program.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.engine import step as _step
from physics_tpu.state import SimState

Array = jnp.ndarray


def env_ok(state: SimState, max_abs: float = 1e6) -> Array:
    """Per-env health mask for a batched state ([E] bool).

    An env is healthy iff its dynamic fields are finite and bounded.
    For an unbatched state returns a scalar bool.
    """

    def field_ok(x: Array) -> Array:
        reduce_axes = tuple(range(1, x.ndim)) if x.ndim > 1 else ()
        finite = jnp.all(jnp.isfinite(x), axis=reduce_axes)
        bounded = jnp.all(jnp.abs(x) < max_abs, axis=reduce_axes)
        return finite & bounded

    return (
        field_ok(state.pos)
        & field_ok(state.vel)
        & field_ok(state.omega)
        & field_ok(state.quat)
    )


def where_env(mask: Array, a: SimState, b: SimState) -> SimState:
    """Per-env select: mask[e] ? a[e] : b[e] across every leaf."""

    def sel(la, lb):
        m = mask.reshape(mask.shape + (1,) * (la.ndim - mask.ndim))
        return jnp.where(m, la, lb)

    return jax.tree_util.tree_map(sel, a, b)


def auto_reset_step(
    cfg: SimConfig,
    step_fn: Callable[[SimState, SimConfig], SimState] = _step,
    max_abs: float = 1e6,
) -> Callable[[SimState, SimState], Tuple[SimState, Dict]]:
    """Build a vmapped batched step with per-env divergence auto-reset.

    Returns f(batched_state, initial_state) -> (batched_state, metrics):
    envs whose post-step state is non-finite/unbounded are replaced by their
    slice of `initial_state`; metrics['resets'] counts them this step.
    """

    def stepped(batched: SimState, initial: SimState):
        out = jax.vmap(lambda s: step_fn(s, cfg))(batched)
        ok = env_ok(out, max_abs)
        out = where_env(ok, out, initial)
        return out, {"resets": jnp.sum(jnp.logical_not(ok).astype(jnp.int32))}

    return stepped


def stack_states(state: SimState, n_envs: int) -> SimState:
    """Tile one scene into a batched [E, ...] state."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape), state
    )


def randomize_positions(
    batched: SimState, key: Array, scale: float = 0.5
) -> SimState:
    """Jitter every env's body positions (same scene, different starts)."""
    noise = jax.random.uniform(
        key, batched.pos.shape, minval=-scale, maxval=scale
    )
    return batched.replace(pos=batched.pos + noise)
