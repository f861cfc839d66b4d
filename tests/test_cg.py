"""Matrix-free CG vs direct solves + reference stopping-rule behavior."""

import numpy as np
import jax.numpy as jnp

from physics_tpu.solver import cg


def test_cg_solves_spd_system():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(12, 12)).astype(np.float32)
    a = a @ a.T + 12 * np.eye(12, dtype=np.float32)
    rhs = rng.normal(size=12).astype(np.float32)

    x, converged, iters = cg.solve(
        lambda v: jnp.asarray(a) @ v,
        jnp.asarray(rhs),
        jnp.zeros(12, jnp.float32),
        rel_tol=1e-6,
        abs_tol=1e-8,
    )
    assert bool(converged)
    expect = np.linalg.solve(a.astype(np.float64), rhs.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-3, atol=1e-4)


def test_cg_warm_start_zero_residual_is_safe():
    """Exactly-converged warm start must not produce NaN (guarded α)."""
    a = np.eye(4, dtype=np.float32) * 2.0
    rhs = np.array([2.0, 4.0, 6.0, 8.0], np.float32)
    x0 = rhs / 2.0  # exact solution
    x, converged, _ = cg.solve(
        lambda v: jnp.asarray(a) @ v, jnp.asarray(rhs), jnp.asarray(x0)
    )
    assert bool(converged)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), x0)


def test_cg_amax_stopping_rule():
    """Converged iff ‖r‖∞ < max(‖rhs‖∞·rel, abs) — reference sle_solver.rs:38."""
    a = np.diag(np.array([1.0, 10.0, 100.0], np.float32))
    rhs = np.array([1.0, 1.0, 1.0], np.float32)
    x, converged, iters = cg.solve(
        lambda v: jnp.asarray(a) @ v,
        jnp.asarray(rhs),
        jnp.zeros(3, jnp.float32),
        max_iters=1000,
        rel_tol=1e-2,
        abs_tol=1e-3,
    )
    assert bool(converged)
    r = rhs - a @ np.asarray(x)
    assert np.max(np.abs(r)) < max(np.max(np.abs(rhs)) * 1e-2, 1e-3)


def test_cg_nonconvergence_reported():
    """Iteration cap reached → converged=False (Q7 upstream handling)."""
    # An indefinite operator CG cannot solve in 2 iterations
    a = np.diag(np.array([1e-8, 1.0, 1e8], np.float32))
    rhs = np.array([1.0, 1.0, 1.0], np.float32)
    x, converged, iters = cg.solve(
        lambda v: jnp.asarray(a) @ v,
        jnp.asarray(rhs),
        jnp.zeros(3, jnp.float32),
        max_iters=2,
        rel_tol=1e-9,
        abs_tol=1e-12,
    )
    assert not bool(converged)
    assert int(iters) == 2


def test_cg_matches_oracle_cg():
    from physics_tpu.oracle.reference import _solve_cg

    rng = np.random.default_rng(5)
    a = rng.normal(size=(9, 9)).astype(np.float32)
    a = a @ a.T + 9 * np.eye(9, dtype=np.float32)
    rhs = rng.normal(size=9).astype(np.float32)
    warm = rng.normal(size=9).astype(np.float32) * 0.1

    x_oracle = _solve_cg(lambda v: (a @ v).astype(np.float32), rhs, warm)
    x_ours, converged, _ = cg.solve(
        lambda v: jnp.asarray(a) @ v, jnp.asarray(rhs), jnp.asarray(warm)
    )
    assert x_oracle is not None and bool(converged)
    np.testing.assert_allclose(np.asarray(x_ours), x_oracle, rtol=1e-4, atol=1e-5)
