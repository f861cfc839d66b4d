"""Force/torque accumulation — vectorized over the body axis.

Mirrors the reference's RigidBody force helpers
(reference: src/physics/rigid_body.rs:43-62): forces and torques accumulate
into per-body registers and are cleared by the integrator at the end of each
step (src/physics/rigid_body.rs:38-39).
"""

from __future__ import annotations

import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.state import SimState

Array = jnp.ndarray


def apply_force_at_center(state: SimState, force: Array) -> SimState:
    """F += f  (reference: apply_force_centre_of_gravity, rigid_body.rs:43-45)."""
    return state.replace(force=state.force + force)


def apply_force_at_position(state: SimState, force: Array, point: Array) -> SimState:
    """F += f; τ += (p − x) × f  (reference: rigid_body.rs:47-54).

    `point` is a world-space position, broadcastable to [N, 3].
    """
    arm = point - state.pos
    return state.replace(
        force=state.force + force,
        torque=state.torque + jnp.cross(arm, force),
    )


def apply_force_at_offset(state: SimState, force: Array, offset: Array) -> SimState:
    """F += f; τ += offset × f  (reference: rigid_body.rs:55-62).

    NOTE the reference treats `offset` as given (it does not rotate it into
    the world frame) — the torque is offset × force verbatim. Reproduced
    as-is; rotate the offset yourself for a body-fixed lever arm.
    """
    force = jnp.broadcast_to(jnp.asarray(force, jnp.float32), state.force.shape)
    offset = jnp.broadcast_to(jnp.asarray(offset, jnp.float32), state.force.shape)
    return state.replace(
        force=state.force + force,
        torque=state.torque + jnp.cross(offset, force),
    )


def apply_torque(state: SimState, torque: Array) -> SimState:
    return state.replace(torque=state.torque + torque)


def apply_gravity(state: SimState, cfg: SimConfig) -> SimState:
    """Per-step gravity.

    compat (quirk Q5, reference src/physics.rs:87-94): gravity is an
    *unscaled force* (0,−9.81,0) applied at offset (0,0,1.5) to every body —
    correct acceleration only for unit mass, and the constant offset
    generates the demo's swing torque.

    non-compat: F += m·g at the center of mass (no spurious torque) unless
    a non-zero `gravity_offset` is configured.
    """
    g = jnp.asarray(cfg.gravity, jnp.float32)
    if cfg.gravity_scale_by_mass:
        # static bodies (mass = inf, inv_mass = 0) must not accumulate an
        # inf force (inf · inv_mass = NaN downstream)
        f = jnp.where(
            (state.inv_mass > 0.0)[:, None], state.mass[:, None] * g, 0.0
        )
    else:
        f = jnp.broadcast_to(g, state.force.shape)
    off = jnp.asarray(cfg.gravity_offset, jnp.float32)
    if any(v != 0.0 for v in cfg.gravity_offset):
        tau = jnp.cross(jnp.broadcast_to(off, f.shape), f)
    else:
        tau = 0.0
    return state.replace(force=state.force + f, torque=state.torque + tau)


def clear_forces(state: SimState) -> SimState:
    """Zero accumulators (reference: rigid_body.rs:38-39)."""
    return state.replace(
        force=jnp.zeros_like(state.force), torque=jnp.zeros_like(state.torque)
    )
