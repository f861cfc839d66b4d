"""Matrix-free conjugate gradient on the implicit operator A(v) = J·W·(Jᵀv).

Reproduces the reference CG exactly (reference: src/physics/sle_solver.rs:21-46):
  * warm start from the previous frame's λ (sle_solver.rs:22-26),
  * convergence tested *after* the x-update with
    ‖r‖∞ < max(‖rhs‖∞ · MAX_ERROR, MIN_ERROR)     (sle_solver.rs:38-40),
  * at most CONJUGATE_MAX_ITERATIONS = 1000 iterations; non-convergence
    reports converged=False and the caller applies no constraint force that
    step and keeps the stale warm start (quirk Q7, src/physics.rs:45-51).

Implemented as `lax.while_loop`, which JAX batches correctly under `vmap`
(per-element masked updates), so the same code serves the single-scene and
the 4096-env batched paths.

One deviation, documented: α = ‖r‖²/(p·Ap) is guarded against a zero
denominator (the reference divides unguarded, sle_solver.rs:34, and would
produce NaN on an exactly-converged warm start; we return α = 0 instead,
which leaves x unchanged — the NumPy oracle applies the same guard).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def solve(
    operator: Callable[[Array], Array],
    rhs: Array,
    x0: Array,
    max_iters: int = 1000,
    rel_tol: float = 1e-2,
    abs_tol: float = 1e-3,
    axis_name: str | None = None,
) -> Tuple[Array, Array, Array]:
    """Conjugate gradient: solve A x = rhs.

    Returns (x, converged: bool scalar, iters_used: int32 scalar).

    When `axis_name` is given (inside shard_map), the solution vector is
    row-sharded across that mesh axis: dot products become psum and the
    ∞-norm convergence test becomes pmax, so every shard sees identical
    scalars and takes identical iterations.
    """

    def _sum(v: Array) -> Array:
        s = jnp.sum(v)
        return jax.lax.psum(s, axis_name) if axis_name else s

    def _amax(v: Array) -> Array:
        m = jnp.max(jnp.abs(v))
        return jax.lax.pmax(m, axis_name) if axis_name else m

    rhs = rhs.astype(jnp.float32)
    threshold = jnp.maximum(
        _amax(rhs) * jnp.float32(rel_tol), jnp.float32(abs_tol)
    )

    r0 = rhs - operator(x0)
    init = (jnp.int32(0), x0, r0, r0, jnp.bool_(False))

    def cond(carry):
        i, _x, _r, _p, converged = carry
        return jnp.logical_and(i < max_iters, jnp.logical_not(converged))

    def body(carry):
        i, x, r, p, _ = carry
        ap = operator(p)
        rk = _sum(r * r)
        den = _sum(p * ap)
        alpha = jnp.where(den != 0.0, rk / den, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        converged = _amax(r) < threshold
        rk_new = _sum(r * r)
        beta = jnp.where(rk != 0.0, rk_new / rk, 0.0)
        p = r + beta * p
        return (i + 1, x, r, p, converged)

    iters, x, _r, _p, converged = jax.lax.while_loop(cond, body, init)
    return x, converged, iters
