"""Pallas TPU kernel for the broad-phase sweep window test.

The sort-by-x sweep (ops.broadphase.sweep_candidates) pairs each body with
its next `window` neighbors in sorted order and tests AABB overlap. In XLA
that is `window` shifted dynamic slices of the sorted AABB array plus
compare/reduce chains — ~0.5 ms/step at N = 4k, window = 64 on v5e, mostly
HBM re-reads of the same data. Here the whole test runs in ONE Pallas
kernel: the sorted AABBs live in VMEM once and the window loop is a static
unroll of register-level compares.

Layout: AABBs arrive transposed [8, N + window] (rows = min xyz, max xyz,
collidable flag, pad — sublane axis), bodies on the lane axis; outputs are
[window, N] masks, written in lane chunks (grid over body ranges) so the
output blocks stay within VMEM at any N — the full [window, N] masks are
~25 MB at N = 65k, window = 48, but one [8, N] input table is ~2 MB and
each grid step only holds [window, chunk] blocks. The kernel is gated to
the TPU backend; other backends use the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# output lanes per grid step: 2 × [window, CHUNK] f32 blocks ≤ ~3 MB at
# window = 64 — safely inside VMEM alongside the [8, N + window] table
_CHUNK = 8192


def _window_mask_kernel(table_ref, out_x_ref, out_full_ref, *, window,
                        chunk):
    from jax.experimental import pallas as pl

    wpad = -(-window // 128) * 128
    base = pl.multiple_of(pl.program_id(0) * chunk, 128)
    t = table_ref[:, pl.ds(base, chunk + wpad)]         # [8, chunk + wp]
    cur_min = [t[k, :chunk] for k in range(3)]
    cur_max = [t[3 + k, :chunk] for k in range(3)]
    cur_coll = t[6, :chunk]
    for d in range(1, window + 1):
        nb_min = [t[k, d:d + chunk] for k in range(3)]
        nb_max = [t[3 + k, d:d + chunk] for k in range(3)]
        nb_coll = t[6, d:d + chunk]
        # x-overlap: neighbor's min-x starts before our max-x (sorted by
        # min-x, so the converse always holds)
        x_ov = nb_min[0] <= cur_max[0]
        full = x_ov
        for k in range(3):
            full = full & (jnp.maximum(cur_min[k], nb_min[k])
                           <= jnp.minimum(cur_max[k], nb_max[k]))
        live = (cur_coll > 0) & (nb_coll > 0)
        out_x_ref[d - 1, :] = (x_ov & live).astype(jnp.float32)
        out_full_ref[d - 1, :] = (full & live).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("window",))
def sweep_window_masks(aabb_sorted: Array, coll_sorted: Array, window: int):
    """(x_overlap [window, N] bool, full_overlap [window, N] bool) for the
    sorted sweep, where row d-1 tests body i against sorted neighbor i+d.

    aabb_sorted: [N, 2, 3] sorted by min-x; coll_sorted: [N] bool.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = aabb_sorted.shape[0]
    chunk = min(_CHUNK, -(-n // 128) * 128)
    nchunks = -(-n // chunk)
    npad = nchunks * chunk
    wpad = -(-window // 128) * 128      # lane-aligned window slice width
    # transposed [8, npad + wpad] table; out-of-range neighbors get +inf
    # mins (never overlap) and collidable = 0
    tail = npad + wpad - n
    mins = aabb_sorted[:, 0, :].T                       # [3, N]
    maxs = aabb_sorted[:, 1, :].T
    pad = jnp.full((3, tail), jnp.inf, jnp.float32)
    table = jnp.concatenate([
        jnp.concatenate([mins, pad], axis=1),
        jnp.concatenate([maxs, -pad], axis=1),
        jnp.concatenate([coll_sorted.astype(jnp.float32),
                         jnp.zeros((tail,), jnp.float32)])[None, :],
        jnp.zeros((1, npad + wpad), jnp.float32),
    ])                                                  # [8, npad + wp]

    kernel = functools.partial(_window_mask_kernel, window=window,
                               chunk=chunk)
    out_x, out_full = pl.pallas_call(
        kernel,
        grid=(nchunks,),
        out_shape=(
            jax.ShapeDtypeStruct((window, npad), jnp.float32),
            jax.ShapeDtypeStruct((window, npad), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((window, chunk), lambda c: (0, c)),
            pl.BlockSpec((window, chunk), lambda c: (0, c)),
        ),
    )(table)
    return out_x[:, :n] > 0, out_full[:, :n] > 0
