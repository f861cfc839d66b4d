"""Small fixed-size linear algebra helpers (batched 3×3 ops).

The reference inverts each body's 3×3 inertia tensor every step via
nalgebra `try_inverse` (reference: src/physics/rigid_body.rs:31); nalgebra's
Matrix3 inverse is the cofactor/adjugate formula, reproduced here exactly so
the compat integrator is bit-comparable.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def inv3x3(m: Array) -> Array:
    """Inverse of [..., 3, 3] matrices via adjugate/determinant.

    Mirrors nalgebra's Matrix3 inversion (cofactor expansion). No guard for
    singular input — matches the reference's `.try_inverse().unwrap()` which
    would panic; here a singular matrix produces inf/nan.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det

    r0 = jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1)
    r1 = jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1)
    r2 = jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1)
    adj = jnp.stack([r0, r1, r2], axis=-2)
    return adj * inv_det[..., None, None]


def skew(v: Array) -> Array:
    """Skew-symmetric cross-product matrix [...,3,3] with skew(v) @ u = v × u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    r0 = jnp.stack([zero, -z, y], axis=-1)
    r1 = jnp.stack([z, zero, -x], axis=-1)
    r2 = jnp.stack([-y, x, zero], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)
