"""A/B: one-hot-matmul banded gather vs vreg lane-shuffle gather.

gather_probe.py found this jaxlib lowers `jnp.take_along_axis` inside a
TPU Pallas kernel at EXACTLY [8, 128] (one vreg): a true cross-lane
shuffle with per-sublane indices. The banded solve's movement engine
(solver/contacts_pallas.py) streams [wtot, tile] bf16 one-hots per
endpoint per sweep — the kernel's dominant cost term — so if a
decomposed shuffle gather (one [8,128] op per out-group × win-group ×
row-group, indices split per 128-lane window group) is cheap, the solve
kernel's cost model changes structurally.

This bench runs S·T iterations of one sweep-tile's TWO endpoint gathers
([16, WTOT] window → [16, TILE]) both ways inside one kernel each, with
an iteration-dependent index perturbation so nothing hoists.

Run on TPU: python experiments/shuffle_gather_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WTOT, TILE, ROWS = 256, 768, 16
ITERS = 544          # 17 sweeps x 32 buckets — one 4k-pile solve's worth


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_onehot_kernel(lowp):
    def kernel(win_ref, idx_ref, out_ref):
        win = win_ref[:]

        def body(i, acc):
            la = (idx_ref[0, :] + i) % WTOT
            row = jax.lax.broadcasted_iota(jnp.int32, (WTOT, TILE), 0)
            oh = (row == la[None, :]).astype(jnp.bfloat16)
            if lowp:
                g = jax.lax.dot_general(
                    win.astype(jnp.bfloat16), oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                w_hi, w_lo = _split(win)
                g = jax.lax.dot_general(
                    w_hi, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g += jax.lax.dot_general(
                    w_lo, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((ROWS, TILE), jnp.float32))

    return kernel


def make_onehot_persist_kernel(lowp):
    """One-hot built once, reused every iteration (the persist_oh mode —
    isolates the per-sweep matmul cost from the iota-compare build)."""

    def kernel(win_ref, idx_ref, out_ref):
        win = win_ref[:]
        la = idx_ref[0, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (WTOT, TILE), 0)
        oh = (row == la[None, :]).astype(jnp.bfloat16)

        def body(i, acc):
            w = win + acc[0, 0] * 1e-30      # loop-carried dependency
            if lowp:
                g = jax.lax.dot_general(
                    w.astype(jnp.bfloat16), oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                w_hi, w_lo = _split(w)
                g = jax.lax.dot_general(
                    w_hi, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g += jax.lax.dot_general(
                    w_lo, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((ROWS, TILE), jnp.float32))

    return kernel


def shuffle_gather(win, la):
    """[ROWS, WTOT] f32, la [TILE] int32 in [0, WTOT) →
    [ROWS, TILE] via [8,128] take_along_axis ops only."""
    outs = []
    for r0 in range(0, ROWS, 8):
        row_groups = []
        for o0 in range(0, TILE, 128):
            sel = la[o0:o0 + 128]                      # [128]
            acc = None
            for w0 in range(0, WTOT, 128):
                src = win[r0:r0 + 8, w0:w0 + 128]      # [8, 128] vreg
                loc = jnp.clip(sel - w0, 0, 127)
                idx8 = jnp.broadcast_to(loc[None, :], (8, 128))
                g = jnp.take_along_axis(src, idx8, axis=1)
                hit = ((sel >= w0) & (sel < w0 + 128))[None, :]
                g = jnp.where(hit, g, 0.0)
                acc = g if acc is None else acc + g
            row_groups.append(acc)
        outs.append(jnp.concatenate(row_groups, axis=1))
    return jnp.concatenate(outs, axis=0)               # [ROWS, TILE]


def make_shuffle_kernel():
    def kernel(win_ref, idx_ref, out_ref):
        win = win_ref[:]

        def body(i, acc):
            la = (idx_ref[0, :] + i) % WTOT
            return acc + shuffle_gather(win, la)

        out_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((ROWS, TILE), jnp.float32))

    return kernel


def run(name, kernel, check_ref=None):
    win = jnp.asarray(
        np.random.default_rng(0).standard_normal((ROWS, WTOT)) * 0.5,
        jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, WTOT, (8, TILE)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = f(win, idx)
        out.block_until_ready()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    # fenced timing over several calls
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(win, idx)
    s = float(jax.device_get(jnp.sum(out)))
    dt = (time.perf_counter() - t0) / reps
    per_gather_us = dt * 1e6 / ITERS
    print(f"{name}: {dt*1e3:.3f} ms/call, {per_gather_us:.3f} us/iter "
          f"(sum {s:.1f})", flush=True)
    return np.asarray(out)


def main():
    print("jax", jax.__version__, flush=True)
    # correctness: shuffle vs one-hot exact-f32 on one iteration
    win = jnp.asarray(
        np.random.default_rng(0).standard_normal((ROWS, WTOT)), jnp.float32)
    la = jnp.asarray(
        np.random.default_rng(1).integers(0, WTOT, (TILE,)), jnp.int32)

    def one_kernel(win_ref, idx_ref, out_ref):
        out_ref[:] = shuffle_gather(win_ref[:], idx_ref[0, :])

    out = pl.pallas_call(
        one_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, jnp.broadcast_to(la[None, :], (8, TILE)))
    ref = np.asarray(win)[:, np.asarray(la)]
    print("shuffle correctness:", np.array_equal(np.asarray(out), ref),
          flush=True)

    run("onehot-hi/lo (rebuild)", make_onehot_kernel(lowp=False))
    run("onehot-bf16 (rebuild)", make_onehot_kernel(lowp=True))
    run("onehot-bf16 (persist)", make_onehot_persist_kernel(lowp=True))
    run("shuffle (f32 exact)", make_shuffle_kernel())


if __name__ == "__main__":
    main()
