"""Measure the per-bucket DENSE Delassus solve's cost envelope (VERDICT
r3 item 1: 'per-bucket dense LDL^T/Cholesky or fixed-count dense
Jacobi-on-matmul, one matmul per bucket per iteration').

The proposal: per 128-rank bucket, build the dense normal-direction
Delassus operator A_nn = J_n W J_n^T over the bucket's C contacts
(C = ccap = 768 at the 4k pile) and W-window DOFs (6·wtot = 1536), then
iterate lambda <- proj(lambda - D^-1(A lambda + b)) with ONE batched
matmul per iteration instead of per-contact one-hot movement.

This probe times the two cost terms on the real chip, batched over the
pile's 32 buckets:
  1. construction:   A = (J W^1/2) (J W^1/2)^T   [32, 768, 1536] x
                     [32, 1536, 768]  — 116 GFLOP/step at 4k
  2. per-iteration:  y = A @ lambda              [32, 768, 768] x
                     [32, 768, 1]    — MXU-hostile matvec
and prints them against the measured banded-movement solve (0.25 ms for
ALL 17 sweeps incl. friction+position rows, docs/PERFORMANCE.md r3).

Run on TPU: python experiments/dense_bucket_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NB, C, DOF = 32, 768, 1536   # 4k-pile shapes: buckets, ccap, 6*wtot


def fence(x):
    return float(jax.device_get(jnp.sum(x)))


def timeit(name, f, *args, reps=20):
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    jw = jnp.asarray(rng.standard_normal((NB, C, DOF)) * 0.1, jnp.float32)
    lam = jnp.asarray(rng.standard_normal((NB, C)) * 0.1, jnp.float32)

    @jax.jit
    def build(jw):
        # bf16 would halve this; use f32-via-bf16 pair semantics ~= 2x
        return jax.lax.dot_general(
            jw.astype(jnp.bfloat16), jw.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [NB, C, C]

    a = build(jw)
    t_build = timeit("A = JW @ JW^T (bf16, 116 GFLOP)", build, jw)

    @jax.jit
    def itr(a, lam):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16),
            lam[..., None].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[..., 0]

    t_it = timeit("A @ lambda (batched matvec)", itr, a, lam)

    # 16 velocity iterations' worth
    print(f"dense total (1 build + 16 iters): "
          f"{(t_build + 16 * t_it)*1e3:.3f} ms  vs  banded movement "
          f"solve 0.25 ms (17 sweeps incl. friction+position)",
          flush=True)


if __name__ == "__main__":
    main()
