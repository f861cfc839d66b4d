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
