"""Minimal TPU repro for the bp_inkernel compile crash
(`array.h:480 Check failed: limits[i] <= dim(i) (6 vs. 1)`).

Bisects the in-kernel broad phase's lane-roll machinery: stages build up
from a bare strided roll of a broadcast row to the full aroll +
concatenate + 2-D mask pipeline of ops/contact_table._make_ct_kernel.

Env: RR_STAGE (int, default all), RR_WTOT (default 256), RR_K (default 48).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


WTOT = int(os.environ.get("RR_WTOT", "256"))
K = int(os.environ.get("RR_K", "48"))


def run(name, kernel, out_rows):
    x = np.arange(WTOT, dtype=np.float32)[None, :] * np.ones(
        (4, 1), np.float32)
    try:
        r = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, WTOT), jnp.float32),
        )(jnp.asarray(x))
        r = jax.device_get(r)
        log(f"{name}: OK sum={r.sum():.1f}")
        return r
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return None


def aroll_groups(v, k):
    b2 = jnp.broadcast_to(v[None, :], (8, WTOT))
    groups = [pltpu.roll(b2, 8 * g + 1, 1, stride=1, stride_axis=0)
              for g in range(-(-k // 8))]
    out = jnp.concatenate(groups, axis=0)
    return out if out.shape[0] == k else out[:k]


def main():
    stage = os.environ.get("RR_STAGE")

    def want(s):
        return stage is None or stage == str(s)

    if want(1):
        # single 8-row strided roll of a broadcast row
        def k1(x_ref, o_ref):
            v = x_ref[0, :]
            b2 = jnp.broadcast_to(v[None, :], (8, WTOT))
            o_ref[0:8, :] = pltpu.roll(b2, 1, 1, stride=1, stride_axis=0)
        run("stage1-single-roll", k1, 8)

    if want(2):
        # 6 grouped rolls concatenated to [48, WTOT]
        def k2(x_ref, o_ref):
            v = x_ref[0, :]
            o_ref[:] = aroll_groups(v, K)
        run("stage2-aroll-concat", k2, K)

    if want(3):
        # aroll + broadcast compare (the keep mask shape)
        def k3(x_ref, o_ref):
            v = x_ref[0, :]
            a = aroll_groups(v, K)
            b = jnp.broadcast_to(x_ref[1, :][None, :], (K, WTOT))
            o_ref[:] = (a <= b).astype(jnp.float32)
        run("stage3-aroll-compare", k3, K)

    if want(4):
        # iota validity mask + keep combine
        def k4(x_ref, o_ref):
            v = x_ref[0, :]
            a = aroll_groups(v, K)
            b = jnp.broadcast_to(x_ref[1, :][None, :], (K, WTOT))
            ii2 = jax.lax.broadcasted_iota(jnp.int32, (K, WTOT), 1)
            dd = jax.lax.broadcasted_iota(jnp.int32, (K, WTOT), 0) + 1
            valid = (ii2 >= dd) & (ii2 < dd + 128)
            o_ref[:] = (valid & (a <= b)).astype(jnp.float32)
        run("stage4-mask", k4, K)

    if want(5):
        # many arolls (the real kernel rolls ~20 window fields)
        def k5(x_ref, o_ref):
            acc = jnp.zeros((K, WTOT), jnp.float32)
            for r in range(4):
                acc = acc + aroll_groups(x_ref[r, :], K)
            o_ref[:] = acc
        run("stage5-many-arolls", k5, K)


if __name__ == "__main__":
    main()
