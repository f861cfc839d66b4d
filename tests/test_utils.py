"""Profiling/multi-host utility tests (single-process paths)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_fence_and_time_fn():
    from physics_tpu.utils.profiling import fence, time_fn

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((128,))
    assert fence(f(x)) == 256.0
    dt = time_fn(f, x, iters=3)
    assert dt > 0


def test_trace_and_summarize(tmp_path):
    from physics_tpu.utils.profiling import summarize_trace, trace

    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.ones((64, 64))
    _ = f(x)
    with trace(str(tmp_path)):
        np.asarray(f(x))
    summary = summarize_trace(str(tmp_path))
    assert isinstance(summary, dict)


def test_multihost_single_process_noop():
    from physics_tpu.parallel import multihost

    assert multihost.initialize() is False   # no cluster env → no-op
    assert multihost.is_primary()
    assert multihost.local_env_slice(64) == slice(0, 64)


def test_dense_onehot_gather_scatter_exact():
    """The N<=64 dense one-hot gather/scatter (ops/bodygather.py) must be
    numerically EXACT — it is a gather expressed as a matmul. On TPU the
    default matmul precision downcasts f32 operands to bf16 (measured 0.25
    absolute error on a position of 50.0 — larger than a contact depth),
    which is why the einsums pin precision=HIGHEST. On CPU this is
    trivially true; under PHYSICS_TPU_TEST_TPU=1 it guards the MXU path."""
    from physics_tpu.ops.bodygather import lane_gather, lane_scatter_add

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.uniform(-1, 1, (6, 24)).astype(np.float32) * 150.0)
    idx = jnp.asarray(rng.integers(0, 24, 97).astype(np.int32))
    out = jax.jit(lane_gather)(table, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[:, np.asarray(idx)])

    contrib = jnp.asarray(rng.uniform(-1, 1, (6, 97)).astype(np.float32))
    got = np.asarray(jax.jit(
        lambda c, i: lane_scatter_add(c, i, 24))(contrib, idx))
    want = np.zeros((6, 24), np.float32)
    # accumulate in the same lane order the matmul contracts (index order)
    for j, i in enumerate(np.asarray(idx)):
        want[:, i] += np.asarray(contrib)[:, j]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
