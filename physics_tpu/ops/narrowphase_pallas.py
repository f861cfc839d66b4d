"""Banded Pallas narrow phase: box-box SAT manifolds in one TPU kernel.

Companion to solver/contacts_pallas.py — the same banded one-hot machinery
(candidate pairs are rank-banded by the sweep / env_blocks broad phase, so
each 1024-pair tile reads a ≤512-wide window of a VMEM-resident body
table), driving the component-form SAT + clipping of ops/boxbox_batched
IN-KERNEL (mosaic=True path: no 3-D one-hot tensors, no cumsum, no
sublane roll, no bool-dtype selects — each individually crashes or is
rejected by Mosaic; see experiments/pallas_sat_split.py for the bisect).

Replaces the XLA fast path's two [18, P] lane gathers + the SAT fusions +
the slot top-k with one kernel whose only HBM traffic is the candidate
index blocks and the [rows, tile] manifold output. Inactive candidates
(la = −1) gather all-zero body rows, which automatically deactivates them:
movable = 0 kills every slot's score.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.config import SimConfig
from physics_tpu.maths import vec3c as v3
from physics_tpu.ops.boxbox_batched import (
    _CAP,
    _argmax_unrolled,
    _select,
    box_box_manifold_batched,
)
from physics_tpu.ops.broadphase import PairCandidates
from physics_tpu.state import SHAPE_BOX, SimState

Array = jnp.ndarray

# body-table rows: pos(0:3) | world R row-major (3:12) | half(12:15) |
# friction(15) | restitution(16) | movable(17) | body id(18) | pad(19:24)
# The body-id row rides the same one-hot gather so the wrapper needs zero
# XLA-side id gathers; ids are exact through the hi/lo bf16 split for
# n < 2^16 (residual ≤ 128, exactly representable in bf16).
NP_GEOM_ROWS = 24
NP_ID_EXACT_MAX = 1 << 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_np_kernel(tile, wtot, kk, mosaic=True):
    """Manifold kernel: per pair tile, gather endpoint boxes and emit the
    top-`kk` contact slots (point, depth, source-slot id) + shared rows
    (normal, friction, restitution).

    `mosaic=False` for interpret mode: the interpreter executes the kernel
    as XLA:CPU ops, where the Mosaic-safe unrolled clip emission triggers
    the documented superlinear-compile pathology — the 3-D tensor form is
    what XLA handles well."""

    def kernel(base_ref, la_ref, lb_ref, geom_ref, out_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(base_ref[t], 128)
        win = geom_ref[:, pl.ds(start, wtot)]             # [24, WTOT]
        w_hi, w_lo = _split(win)
        la = la_ref[0, 0, :]
        lb = lb_ref[0, 0, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (wtot, tile), 0)
        oh_a = (row == la[None, :]).astype(jnp.bfloat16)
        oh_b = (row == lb[None, :]).astype(jnp.bfloat16)

        def bgather(oh):
            g1 = jax.lax.dot_general(
                w_hi, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return g1 + jax.lax.dot_general(
                w_lo, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [24, TILE]

        ga = bgather(oh_a)
        gb = bgather(oh_b)

        man = box_box_manifold_batched(
            (ga[0], ga[1], ga[2]), tuple(ga[3 + k] for k in range(9)),
            (ga[12], ga[13], ga[14]),
            (gb[0], gb[1], gb[2]), tuple(gb[3 + k] for k in range(9)),
            (gb[12], gb[13], gb[14]),
            mosaic=mosaic,
        )

        movable = (ga[17] > 0.0) | (gb[17] > 0.0)
        mu = jnp.sqrt(ga[15] * gb[15])
        rest = jnp.maximum(ga[16], gb[16])

        big_neg = jnp.float32(-1e30)
        score = [
            jnp.where(man.valid[s] & movable, man.depth[s], big_neg)
            for s in range(_CAP)
        ]
        rows = []
        for _ in range(kk):
            best, bidx = _argmax_unrolled(score)
            active = best > 0.0
            pt = _select(bidx, man.points)
            d = jnp.where(active, best, 0.0)
            rows += [pt[0], pt[1], pt[2], d, bidx.astype(jnp.float32)]
            score = [
                jnp.where(bidx == jnp.int32(s), big_neg, score[s])
                for s in range(_CAP)
            ]
        rows += [man.normal[0], man.normal[1], man.normal[2], mu, rest,
                 ga[18], gb[18]]
        pad = _round_up(len(rows), 8) - len(rows)
        rows += [jnp.zeros((tile,), jnp.float32)] * pad
        out_ref[:] = jnp.stack(rows)

    return kernel


def pair_manifolds_banded(
    state: SimState,
    cand: PairCandidates,
    cfg: SimConfig,
    order: Array | None,
    chunked: bool = False,
) -> Tuple[Array, Array, int]:
    """Run the manifold kernel over all candidate pairs.

    Returns (rows [R, Pp], pad_to, kk): rows as laid out by
    `_make_np_kernel` with the pair axis padded to the kernel tile.

    `chunked=True` means `cand` is a SHARD'S slice of the bucket-major
    candidate array (row-sharded narrow phase): the static bucket-derived
    bases assume the array starts at bucket 0, so chunked mode falls back
    to the dynamic tile-min bases (correct for any contiguous slice; one
    extra [ntiles]-reduction).
    """
    n = state.num_bodies
    p0 = cand.body_a.shape[0]
    kk = min(cfg.max_contacts_per_pair, _CAP)
    tile = min(cfg.pallas_tile, max(_round_up(p0, 128), 128))
    pp = _round_up(p0, tile)
    wtot = cfg.pallas_window
    npad = _round_up(max(n + wtot, wtot), 128)
    interpret = jax.default_backend() != "tpu"

    # rank-space body table (zeros after column n ⇒ la = -1 handling and
    # non-box shapes are deactivated via movable = 0)
    r9 = v3.quat_to_mat(state.quat)
    is_box = (state.shapes.stype == SHAPE_BOX).astype(jnp.float32)
    movable = ((state.inv_mass > 0.0).astype(jnp.float32))
    rows = jnp.stack(
        [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
        + list(r9)
        + [state.shapes.params[:, 0], state.shapes.params[:, 1],
           state.shapes.params[:, 2], state.shapes.friction,
           state.shapes.restitution, movable * is_box,
           jnp.arange(n, dtype=jnp.float32)]
        + [jnp.zeros((n,), jnp.float32)] * (NP_GEOM_ROWS - 19)
    )                                                     # [24, N]
    if order is not None:
        rows = rows[:, order]
    geom = jnp.zeros((NP_GEOM_ROWS, npad), jnp.float32).at[:, :n].set(rows)

    mask = cand.mask
    ra = jnp.pad(cand.rank_a, (0, pp - p0))
    rb = jnp.pad(cand.rank_b, (0, pp - p0))
    maskp = jnp.pad(mask, (0, pp - p0))

    ntiles = pp // tile
    if cfg.pair_buckets and not chunked:
        # bucketed candidates: tile t covers candidate slots
        # [t·tile, (t+1)·tile) = buckets [t·tile/cap, …], whose rank span
        # is bounded by construction — bases are STATIC (no device-side
        # tile_min reduction), and a span > window is a config error
        # caught here at trace time, never a silent drop.
        import numpy as onp

        from physics_tpu.ops.broadphase import bucket_shape

        block, cap, _ = bucket_shape(n, cfg)
        k_sweep = min(cfg.sweep_window, n - 1)
        t_arr = onp.arange(ntiles)
        lo_blk = (t_arr * tile) // cap
        hi_blk = ((t_arr + 1) * tile - 1) // cap
        min_rank = lo_blk * block
        max_rank = onp.minimum(hi_blk * block + block - 1 + k_sweep, n - 1)
        bases_np = onp.clip((min_rank // 128) * 128, 0, npad - wtot)
        span = int((max_rank - bases_np).max()) + 1
        if span > wtot:
            raise ValueError(
                f"narrowphase_pallas: bucketed tile rank span {span} > "
                f"pallas_window {wtot}; raise pallas_window or lower "
                f"bucket_block/pallas_tile"
            )
        bases = jnp.asarray(bases_np, jnp.int32)
    else:
        lo_key = jnp.where(maskp, ra, npad - 1)
        tile_min = jnp.min(lo_key.reshape(ntiles, tile), axis=1)
        bases = jnp.clip((tile_min // 128) * 128, 0, npad - wtot).astype(
            jnp.int32)
    base_per = jnp.repeat(bases, tile)
    la = jnp.where(maskp, ra - base_per, -1)
    lb = jnp.where(maskp, rb - base_per, -1)
    in_band = (la >= 0) & (la < wtot) & (lb >= 0) & (lb < wtot)
    la = jnp.where(in_band, la, -1)
    lb = jnp.where(in_band, lb, -1)

    la3 = jnp.broadcast_to(la.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    lb3 = jnp.broadcast_to(lb.reshape(ntiles, 1, tile), (ntiles, 8, tile))

    r_out = _round_up(kk * 5 + 5, 8)
    kernel = _make_np_kernel(tile, wtot, kk, mosaic=not interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_out, tile), lambda t, b: (0, t)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_out, pp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases, la3, lb3, geom)
    return out, pp, kk
