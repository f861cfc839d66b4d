"""Quaternion math, batched over a leading body axis.

Convention: quaternions are stored **(w, x, y, z)** in f32 arrays of shape
[..., 4].  All formulas mirror the conventions of the reference engine's math
library (nalgebra 0.32) so that trajectories are reproducible:

  * rotation matrix form uses the ww+xx-yy-zz layout
    (reference: nalgebra UnitQuaternion::to_rotation_matrix);
  * `from_euler` / `to_euler` use the roll-pitch-yaw (X-Y-Z intrinsic,
    R = Rz(yaw)·Ry(pitch)·Rx(roll)) convention of
    nalgebra's from_euler_angles/euler_angles, which the reference's
    FixedOrientationConstraint depends on
    (reference: src/physics/constraints/fixed_orientation_constraint.rs:17);
  * `exp_map` matches nalgebra `UnitQuaternion::new(rotvec)` /
    `from_scaled_axis` (exact identity at ‖v‖ = 0), which the reference's
    integrator calls (reference: src/physics/rigid_body.rs:35).

Everything is pure jnp; these ops fuse into the surrounding XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def identity(shape=()) -> Array:
    """Identity quaternion(s) of shape [*shape, 4]."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=jnp.float32)
    return q.at[..., 0].set(1.0)


def mul(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 ⊗ q2, (w,x,y,z)-ordered. Batched on leading dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: Array) -> Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q: Array, eps: float = 1e-12) -> Array:
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, eps)


def rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4].

    Uses the expanded 'qvq*' form t = 2 q_v × v; v' = v + w t + q_v × t,
    which is cheaper than two quaternion products and fuses well.
    """
    w = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def rotate_inv(q: Array, v: Array) -> Array:
    """Rotate v by q⁻¹ (world → body for a body-orientation quaternion)."""
    return rotate(conjugate(q), v)


def to_matrix(q: Array) -> Array:
    """Rotation matrix [..., 3, 3] from unit quaternion.

    Uses nalgebra's exact expansion (ww+ii−jj−kk diagonal form, not the
    1−2(...) form) for bit-parity with the reference's euler extraction path.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    xy = x * y * 2.0
    wz = w * z * 2.0
    wy = w * y * 2.0
    xz = x * z * 2.0
    yz = y * z * 2.0
    wx = w * x * 2.0
    r0 = jnp.stack([ww + xx - yy - zz, xy - wz, wy + xz], axis=-1)
    r1 = jnp.stack([wz + xy, ww - xx + yy - zz, yz - wx], axis=-1)
    r2 = jnp.stack([xz - wy, wx + yz, ww - xx - yy + zz], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def to_matrix_np(q) -> "np.ndarray":
    """NumPy twin of `to_matrix` for host-side tooling (viewer playback)."""
    import numpy as np

    q = np.asarray(q, np.float32)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    xy, wz = 2 * x * y, 2 * w * z
    wy, xz = 2 * w * y, 2 * x * z
    yz, wx = 2 * y * z, 2 * w * x
    r0 = np.stack([ww + xx - yy - zz, xy - wz, wy + xz], axis=-1)
    r1 = np.stack([wz + xy, ww - xx + yy - zz, yz - wx], axis=-1)
    r2 = np.stack([xz - wy, wx + yz, ww - xx - yy + zz], axis=-1)
    return np.stack([r0, r1, r2], axis=-2)


def from_euler(roll: Array, pitch: Array, yaw: Array) -> Array:
    """Quaternion from roll-pitch-yaw (R = Rz(yaw)·Ry(pitch)·Rx(roll)).

    Matches nalgebra UnitQuaternion::from_euler_angles, used by the reference
    demo scene (reference: src/lib.rs:22).
    """
    hr, hp, hy = roll * 0.5, pitch * 0.5, yaw * 0.5
    sr, cr = jnp.sin(hr), jnp.cos(hr)
    sp, cp = jnp.sin(hp), jnp.cos(hp)
    sy, cy = jnp.sin(hy), jnp.cos(hy)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def to_euler(q: Array) -> Array:
    """Roll-pitch-yaw [..., 3] from quaternion, nalgebra euler_angles().

    Branchless port of nalgebra 0.32's Slabaugh-style extraction (main branch
    |R₂₀| < 1, plus the two gimbal-lock branches), which the reference's
    FixedOrientationConstraint::calculate relies on
    (reference: src/physics/constraints/fixed_orientation_constraint.rs:17).
    """
    r = to_matrix(q)
    r20 = r[..., 2, 0]
    in_range = jnp.abs(r20) < 1.0

    pitch_m = -jnp.arcsin(jnp.clip(r20, -1.0, 1.0))
    cp = jnp.cos(pitch_m)
    safe_cp = jnp.where(in_range, cp, 1.0)
    roll_m = jnp.arctan2(r[..., 2, 1] / safe_cp, r[..., 2, 2] / safe_cp)
    yaw_m = jnp.arctan2(r[..., 1, 0] / safe_cp, r[..., 0, 0] / safe_cp)

    at_neg = r20 <= -1.0
    roll_g = jnp.where(
        at_neg,
        jnp.arctan2(r[..., 0, 1], r[..., 0, 2]),
        jnp.arctan2(-r[..., 0, 1], -r[..., 0, 2]),
    )
    pitch_g = jnp.where(at_neg, jnp.pi / 2.0, -jnp.pi / 2.0).astype(q.dtype)

    roll = jnp.where(in_range, roll_m, roll_g)
    pitch = jnp.where(in_range, pitch_m, pitch_g)
    yaw = jnp.where(in_range, yaw_m, 0.0)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def exp_map(v: Array, eps: float = 0.0) -> Array:
    """Unit quaternion from a rotation vector v [..., 3] (angle = ‖v‖).

    Matches nalgebra UnitQuaternion::new / from_scaled_axis: exact identity
    when ‖v‖ == 0 (reference: src/physics/rigid_body.rs:35 constructs the
    per-step rotation increment this way).
    """
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(n2)
    nonzero = n > eps
    safe_n = jnp.where(nonzero, n, 1.0)
    half = n * 0.5
    w = jnp.cos(half)
    xyz = v * (jnp.sin(half) / safe_n)
    q = jnp.concatenate([w, xyz], axis=-1)
    iden = jnp.concatenate(
        [jnp.ones_like(w), jnp.zeros_like(xyz)], axis=-1
    )
    return jnp.where(nonzero, q, iden)


def from_axis_angle(axis: Array, angle: Array) -> Array:
    """Unit quaternion from a (unit) axis [...,3] and angle [...]. """
    half = angle * 0.5
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)
