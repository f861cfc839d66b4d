"""Fused bucket-aligned contact table: narrow phase + ground contacts +
per-bucket compaction in ONE Pallas kernel.

This replaces, for boxes_only bucketed-sweep scenes, the whole XLA span
between the broad phase and the contact solver:

    pair SAT manifolds      (ops/narrowphase_pallas.py kernel)   ~0.25 ms
    ground corner contacts  (_ground_contacts_boxes XLA)         ~0.1  ms
    contact compaction      (argsort + [18, C] field gather)     ~0.3  ms
    rank sort for the banded solver (argsort + gather)           ~0.27 ms

with one kernel whose grid steps each own ONE rank bucket (128 body ranks,
matching the bucketed sweep with bucket_block=128): SAT manifolds for the
bucket's candidates, ground contacts for the bucket's own ranks, then an
in-kernel compaction of the active contacts into a fixed `ccap`-slot
output segment. Because buckets are processed independently and each
bucket's contacts involve ranks [b·128, b·128 + 128 + sweep_window), the
resulting contact table is rank-banded BY CONSTRUCTION with STATIC solver
tile bases (b·128) — the banded solve consumes it with zero sorts, zero
gathers, zero padding ops.

In-kernel compaction (no cumsum — unsupported; no gathers — rejected):
  * exclusive prefix-sum of the activity mask via two triangular matmuls
    (within-sublane over lanes, then sublane offsets), precision=HIGHEST
    so counts are exact in f32;
  * chunked one-hot scatter: oh[j, slot_j] contracted against the payload
    rows with hi/lo bf16 splits — f32 payloads exact to ~2⁻¹⁹ relative,
    integer payloads < 2¹⁶ exact (validated in experiments/compact_proto.py).

Feature keys are shipped COMPONENT-FORM as four exact-in-f32 rows
(max id, min id, slot, ground flag — see the CT_K* row comments): the
legacy packed (min·n + max)·8 + slot int32 of the XLA narrow-phase paths
overflows at n ≥ 16k bodies, while the components stay exact at any
supported n. `table_keys_scalar` reconstructs the packed form for parity
tests against the XLA paths (ops/narrowphase.py `_ground_contacts_boxes`;
the reference has no contacts at all — SURVEY.md §0).

New capability vs reference (no collision detection in the reference,
SURVEY.md §0); the TPU-shaping rules it follows are docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as onp

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
from physics_tpu.ops.broadphase import (
    PairCandidates,
    band_window,
    bucket_shape,
)
from physics_tpu.state import SHAPE_BOX, SHAPE_HULL, SimState

Array = jnp.ndarray

HIGHEST = jax.lax.Precision.HIGHEST

# contact-table rows (f32 [CT_ROWS, NB·ccap])
CT_PT = 0        # 0:3  contact point
CT_N = 3         # 3:6  normal (B→A)
CT_D = 6         # depth
CT_MU = 7        # friction
CT_REST = 8      # restitution
CT_ACT = 9       # 1.0 = active
CT_KL = 10       # key low component: max body id (pair) / body id (ground)
CT_KH = 11       # key high component: min body id (pair) / 0 (ground)
CT_KSGN = 12     # 1.0 ⇒ ground contact
CT_RA = 13       # global body rank of endpoint a (lower rank)
CT_RB1 = 14      # global rank of endpoint b + 1 (0 = ghost/world)
CT_KS = 15       # key slot component: manifold slot / corner / vertex id
CT_ROWS = 16
# anchored-table extension (cfg.contact_rebuild > 1): the kernel emits
# per-contact BODY-FRAME anchors so the solve kernel can re-derive
# point/normal/depth exactly from current transforms between rebuilds.
# Both bodies anchor AT the build-time contact point pt₀:
#   depth(t) = CT_D − n̂(t)·(a_pt(t) − b_pt(t)),  n̂(t) = R_a(t)·n_loc
# (0 relative displacement at build ⇒ depth(0) = CT_D exactly).
CT_AAX = 16      # 16:19 anchor in A's body frame: R_aᵀ(pt₀ − pos_a)
CT_BAX = 19      # 19:22 anchor in B's frame; WORLD pt₀ for ground (no B)
CT_NLOC = 22     # 22:25 contact normal in A's body frame
CT2_ROWS = 32    # padded to the sublane multiple

# Feature keys are COMPONENT-FORM (three exact-in-f32 rows) rather than one
# packed integer: a packed (min·n + max)·slots key overflows int32 at
# n ≥ 16k bodies, while the components stay exact at any supported n
# (ids < 2¹⁶, slot ids < 128). The warm match compares two derived scalars
#   ck = KL + 65536·(2·KS + KSGN) + 2·(ACT − 1)   (< 2²⁴, exact in f32)
#   ch = KH
# which uniquely identify (pair-or-ground, ids, slot) — same two-compare
# cost as the old packed halves. `table_keys` packs the components into
# [2, C] int32 for cross-step storage (row0 = KL | (2·KS + KSGN) << 16,
# row1 = KH + 1; zeros = inactive).
_KS_LIMIT = 128   # slot ids must stay < 128 so ck stays < 2^24 (f32-exact)

# geometry body-table rows — identical to ops/narrowphase_pallas.py:
# pos(0:3) | world R row-major (3:12) | half(12:15) | friction(15) |
# restitution(16) | movable·is_box(17) | body id(18) | pad(19:24)
GEOM_ROWS = 24

BLOCK = 128      # ranks per bucket — fixed: ground slice + bases stay
                 # 128-aligned with zero scalar prefetch

# compile-crash bisect gate (experiments/ct_bp_run.py): > 0 truncates the
# kernel after the numbered bp-phase stage and writes a reduction of that
# stage's tensor, so the Mosaic-crashing op can be located on real TPU.
# Never set in production (0 = full kernel).
_BP_DBG = int(os.environ.get("CT_BP_DEBUG", "0"))

_BOX_SIGNS = [
    (sx, sy, sz)
    for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _exclusive_prefix(mask):
    """mask [SUB, L] 0/1 f32 (L a lane multiple) → exclusive prefix
    counts in row-major order, via triangular matmuls ONLY — no
    reshape/transpose anywhere. The earlier [1, SUB] ↔ [SUB, 1]
    reshapes crashed Mosaic's layout assignment once SUB exceeded one
    vreg of sublanes (the bp_inkernel shapes: SUB = 48/96 — array.h
    limits check; bisected via CT_BP_DEBUG stage 3), so the row-offset
    term is now a [SUB, SUB] × [SUB, L] matmul against the row totals
    broadcast over lanes."""
    sub, lanes = mask.shape
    ci = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    t_l = (ci < cj).astype(jnp.float32)
    within = jax.lax.dot_general(
        mask, t_l, (((1,), (0,)), ((), ())), precision=HIGHEST)
    totals_b = jnp.broadcast_to(
        jnp.sum(mask, axis=1, keepdims=True), (sub, lanes))
    ri = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    t_r = (ri < rj).astype(jnp.float32)
    # offs[i, c] = Σ_j (j < i) · totals[j]  (contract the FIRST dims)
    offs = jax.lax.dot_general(
        t_r, totals_b, (((0,), (0,)), ((), ())), precision=HIGHEST)
    return within + offs


def _make_ct_kernel(cap, wtot, kk, kg, ccap, n, gh, mosaic=True,
                    warm=False, cap2=0, bp_k=0, row0=0, env_k=0,
                    anchors=False, gate=False):
    """One grid step = one rank bucket: SAT + ground + compaction.

    warm=True adds in-kernel warm-start key matching: the previous step's
    table-aligned (key, λ) rows ride in as a [ccap, 8] column block per
    bucket, and the epilogue computes λ₀ for each fresh contact by an
    equality one-hot matmul over the SAME bucket's previous contacts —
    replacing the XLA sort-merge (warm_start_lambda_keys) AND the
    epilogue key sort. A contact whose lower endpoint migrates across a
    128-rank bucket boundary between steps loses its warm start (rare:
    ranks drift slowly; the solve re-converges in one extra sweep).

    cap2 > 0 engages the two-phase narrow phase: a 6-face-axis SAT
    prefilter (~100 VPU ops) runs on all `cap` candidates, survivors
    compact to `cap2` lanes (prefix + one-hot scatter of the local
    ranks, then a re-gather of their geometry), and only those run the
    full 15-axis manifold / emit / contact compaction — whose cost all
    scales with candidate lanes. Conservative: only pairs strictly
    separated on a FACE axis are dropped (they produce no contact).
    Survivors beyond cap2 are counted into meta[0, b·128+2].

    bp_k > 0 folds the ENTIRE broad phase into the kernel: no candidate
    inputs at all — the bucket's raw candidate set is (rank i, rank i+d)
    for i in [0, 128), d in [1, bp_k], and both endpoints' geometry falls
    out of SHIFTED STATIC SLICES of the window (cur = lane i, neighbor =
    lane i+d — zero gathers). AABB overlap runs as [bp_k, 128] 2-D ops on
    all 128·bp_k raw candidates (cheap: one roll per AABB field + 6
    compares); survivors compact once into `cap` lanes (iota-derived
    local ranks ride the one-hot scatter) and are gathered. With cap2 the
    face-axis SAT prefilter then runs on those `cap` gathered lanes and
    compacts to cap2 — two-stage, so the ~100-op SAT never touches the
    128·bp_k raw set (round-3's single-stage bp_inkernel ran face-SAT on
    all raw candidates and measured neutral). Replaces the XLA sweep-mask
    kernel + segmented candidate sort + la/lb prep. Survivors dropped at
    either compaction are counted into meta[0, b·128+2]; ranks whose
    x-interval still overlaps at d = bp_k (pairs may exist beyond the
    window) into meta[0, b·128+3]."""
    sat_cap = cap2 if cap2 else cap
    sub_pair = kk * (sat_cap // 128)
    sub = sub_pair + kg
    m = sub * 128
    chunk_rows = 4                       # scatter chunk: 512 contacts

    def kernel(base_ref, *args):
        if bp_k:
            geom_ref, *refs = args
        else:
            la_ref, lb_ref, geom_ref, *refs = args
        if gate:
            prev_tab_ref, *refs = refs
        else:
            prev_tab_ref = None
        if warm:
            prev_ref, out_ref, meta_ref, warm_ref = refs
        else:
            (out_ref, meta_ref), prev_ref, warm_ref = refs, None, None
        b = pl.program_id(0)
        # scalar-prefetched global window base: b·128 single-device, or
        # (bucket0 + b)·128 for this shard's bucket range (row sharding)
        start = pl.multiple_of(base_ref[b], 128)

        def _dbg(val):
            out_ref[:] = jnp.zeros(
                (CT2_ROWS if anchors else CT_ROWS, ccap),
                jnp.float32) + val
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            if warm:
                warm_ref[:] = jnp.zeros((8, ccap), jnp.float32)
        def _compute():
            # row0=24 when fed the unified table (this kernel's block sits
            # after the solve layout; see unified_geom)
            win = geom_ref[row0:row0 + GEOM_ROWS,
                           pl.ds(start, wtot)]                # [24, WTOT]
            w_hi, w_lo = _split(win)

            def bgather(oh):
                g1 = jax.lax.dot_general(
                    w_hi, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return g1 + jax.lax.dot_general(
                    w_lo, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [24, CAP]

            def onehots(lav, lbv):
                c = lav.shape[0]
                row = jax.lax.broadcasted_iota(jnp.int32, (wtot, c), 0)
                return ((row == lav[None, :]).astype(jnp.bfloat16),
                        (row == lbv[None, :]).astype(jnp.bfloat16))

            def face_sat_sep(t, ra, rb, ha, hb):
                """Best separation over the 6 FACE axes (any broadcastable
                shapes; ra/rb row-major 9-tuples). > 0 ⇒ no contact possible
                on a face axis (edge axes can't beat both faces for boxes'
                contact EXISTENCE — a separating edge axis implies a
                separating face axis does not hold in general, but a pair
                separated on a face axis definitely has no contact)."""
                # C[i][j] = u_i · w_j (columns of Ra vs columns of Rb)
                cabs = [[jnp.abs(ra[i] * rb[j] + ra[3 + i] * rb[3 + j]
                                 + ra[6 + i] * rb[6 + j]) for j in range(3)]
                        for i in range(3)]
                sep_best = None
                for i in range(3):
                    ut = ra[i] * t[0] + ra[3 + i] * t[1] + ra[6 + i] * t[2]
                    rad = (ha[i] + hb[0] * cabs[i][0] + hb[1] * cabs[i][1]
                           + hb[2] * cabs[i][2])
                    s = jnp.abs(ut) - rad
                    sep_best = s if sep_best is None else jnp.maximum(
                        sep_best, s)
                for j in range(3):
                    wt = rb[j] * t[0] + rb[3 + j] * t[1] + rb[6 + j] * t[2]
                    rad = (hb[j] + ha[0] * cabs[0][j] + ha[1] * cabs[1][j]
                           + ha[2] * cabs[2][j])
                    sep_best = jnp.maximum(sep_best, jnp.abs(wt) - rad)
                return sep_best

            def compact_pair_lanes(keepf, la2, lb2, out_cap):
                """Order-preserving compaction of candidate lanes: keepf
                [SUB, L] 0/1 f32 (L a 128-multiple), la2/lb2 [SUB, L] f32
                local ranks. Returns (la [out_cap] i32, lb [out_cap] i32,
                dropped f32) — empty slots −1. Local ranks < 2¹⁶ ⇒ exact in
                bf16 hi/lo. Scatter chunks are [chunk_rows, 128] tiles taken
                with 128-aligned lane slices and flattened [CR,128]→[1,CW]
                (the one Mosaic-proven flatten); wider flattens and the
                [SUB·(L/128), 128] re-tiling both crash layout assignment at
                bp_inkernel shapes."""
                nsub, lanes = keepf.shape
                slot1 = _exclusive_prefix(keepf)
                slot1 = slot1 * keepf + (1.0 - keepf) * jnp.float32(out_cap)
                pay_a = (la2 + 1.0) * keepf
                pay_b = (lb2 + 1.0) * keepf
                acc2 = jnp.zeros((2, out_cap), jnp.float32)
                ohr = jax.lax.broadcasted_iota(
                    jnp.int32, (out_cap, chunk_rows * 128), 0)
                for r0 in range(0, nsub, chunk_rows):
                    cr = min(chunk_rows, nsub - r0)
                    cwr = cr * 128
                    for h in range(lanes // 128):
                        hs = slice(h * 128, (h + 1) * 128)
                        sl = slot1[r0:r0 + cr, hs].reshape(
                            1, cwr).astype(jnp.int32)
                        oht = (ohr[:, :cwr] == sl).astype(jnp.bfloat16)
                        pay = jnp.stack(
                            [pay_a[r0:r0 + cr, hs].reshape(1, cwr)[0],
                             pay_b[r0:r0 + cr, hs].reshape(1, cwr)[0]])
                        p_hi, p_lo = _split(pay)
                        acc2 += jax.lax.dot_general(
                            p_hi, oht, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc2 += jax.lax.dot_general(
                            p_lo, oht, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                dropped = jnp.maximum(
                    jnp.sum(keepf) - jnp.float32(out_cap), 0.0)
                return (acc2[0].astype(jnp.int32) - 1,
                        acc2[1].astype(jnp.int32) - 1, dropped)

            dropped2 = jnp.float32(0.0)
            winovf = jnp.float32(0.0)
            if bp_k:
                # ---- phase 0: whole broad phase in-kernel ----
                # Raw candidate (d, i2) = sorted ranks (start + i2 − d,
                # start + i2), d ∈ [1, bp_k], valid lanes d ≤ i2 < 128 + d.
                # Endpoint B's fields are the window rows broadcast over d
                # (lane i2 IS b's window lane); endpoint A's fields come
                # from ONE strided lane-roll per field (row d−1 right-rolled
                # by d, small positive shifts — tpu.dynamic_rotate). The
                # natural orientation (A = lane i broadcast, B = left-
                # shifted slices) is NOT Mosaic-lowerable: stacking
                # unaligned lane slices trips the concatenate layout check
                # (offset mismatch on the non-concat dim), and left rolls
                # (≡ right rolls by wtot − d > 128) exceed the rotate
                # unit's max in-vreg shift. Wrapped lanes (i2 < d) carry
                # garbage from the window tail — masked by `valid`.
                # d-axis padded to whole 8-row sublane groups: a [:bp_k]
                # sublane slice of the rolled groups crashes Mosaic's layout
                # assignment when bp_k is not a multiple of 8 (array.h
                # limits check, seen at env bp_k = 7) — mask rows d > bp_k
                # via `valid` instead of slicing them off.
                bpp = -(-bp_k // 8) * 8

                def aroll(v):
                    # strided roll in 8-row groups: the rotate unit handles a
                    # sublane-replicated single-vreg input (row j of group g
                    # shifts by 8g+1+j), but a multi-vreg broadcast input
                    # crashes the compiler's strided-rotate lowering
                    # (array.h limits check, 48 rows = 6 vregs vs 1).
                    b2 = jnp.broadcast_to(v[None, :], (8, wtot))
                    groups = [
                        pltpu.roll(b2, 8 * g + 1, 1, stride=1, stride_axis=0)
                        for g in range(bpp // 8)
                    ]
                    return jnp.concatenate(groups, axis=0)     # [bpp, wtot]

                def bcast(v):
                    return jnp.broadcast_to(v[None, :], (bpp, wtot))

                ii2 = jax.lax.broadcasted_iota(jnp.int32, (bpp, wtot), 1)
                dd = jax.lax.broadcasted_iota(
                    jnp.int32, (bpp, wtot), 0) + 1
                valid = ((ii2 >= dd) & (ii2 < dd + BLOCK)
                         & (dd <= jnp.int32(bp_k)))

                ext = []
                for c in range(3):
                    ext.append(jnp.abs(win[3 + 3 * c]) * win[12]
                               + jnp.abs(win[4 + 3 * c]) * win[13]
                               + jnp.abs(win[5 + 3 * c]) * win[14])
                pos3 = (win[0], win[1], win[2])
                mins = tuple(pos3[c] - ext[c] for c in range(3))
                maxs = tuple(pos3[c] + ext[c] for c in range(3))

                # sorted by min-x: pair (a, a+d) overlaps iff b's min-x ≤
                # a's max-x
                x_ov = bcast(mins[0]) <= aroll(maxs[0])
                keep = valid & x_ov
                for c in range(3):
                    keep = keep & (
                        jnp.maximum(aroll(mins[c]), bcast(mins[c]))
                        <= jnp.minimum(aroll(maxs[c]), bcast(maxs[c])))
                live = (aroll(win[19]) > 0.0) & (bcast(win[19]) > 0.0)
                keep = keep & live
                keep = keep & ((aroll(win[17]) > 0.0)
                               | (bcast(win[17]) > 0.0))
                if _BP_DBG == 1:
                    _dbg(jnp.sum(keep.astype(jnp.float32)))
                    return
                # NOTE: no face-axis SAT here — it runs AFTER compaction on
                # the `cap` gathered lanes (the cap2 phase below), so the
                # expensive ~100-op test never touches the 128·bp_k raw set
                if _BP_DBG == 2:
                    _dbg(jnp.sum(keep.astype(jnp.float32)))
                    return
                if env_k:
                    # packed-env mode: only within-env pairs are real —
                    # rank r belongs to env r // env_k, so (a, a+d) is
                    # same-env iff (a mod env_k) + d < env_k, a = i2 − d.
                    # Independent envs may overlap spatially (each is its
                    # own world).
                    keep = keep & (((ii2 - dd) % env_k) + dd < env_k)
                keepf = keep.astype(jnp.float32)

                la2 = (ii2 - dd).astype(jnp.float32)
                lb2 = ii2.astype(jnp.float32)

                la, lb, dropped2 = compact_pair_lanes(keepf, la2, lb2, cap)
                if _BP_DBG == 3:
                    _dbg(jnp.sum(la.astype(jnp.float32)) + dropped2)
                    return
                if env_k:
                    # the band is exact in env mode (d = env_k - 1 covers the
                    # whole within-env triangle): no window-edge overflow
                    winovf = jnp.float32(0.0)
                else:
                    # ranks whose x-interval still overlaps the furthest
                    # window neighbor: pairs may exist beyond d = bp_k —
                    # counted, never silent (matches
                    # ops/broadphase.sweep_candidates overflow)
                    lov = ((x_ov & live & valid)[bp_k - 1]).astype(
                        jnp.float32)
                    winovf = jnp.sum(lov)
            else:
                la = la_ref[0, 0, :]
                lb = lb_ref[0, 0, :]

            oh_a, oh_b = onehots(la, lb)
            ga = bgather(oh_a)
            gb = bgather(oh_b)        # inactive (la = −1): all-zero columns
            if _BP_DBG == 4:
                _dbg(jnp.sum(ga) + jnp.sum(gb))
                return

            if cap2:
                # ---- phase 1: face-axis SAT prefilter on all candidates ----
                t = (gb[0] - ga[0], gb[1] - ga[1], gb[2] - ga[2])
                ra = tuple(ga[3 + k] for k in range(9))        # world R row-major
                rb = tuple(gb[3 + k] for k in range(9))
                ha = (ga[12], ga[13], ga[14])
                hb = (gb[12], gb[13], gb[14])
                sep_best = face_sat_sep(t, ra, rb, ha, hb)
                mv1 = (ga[17] > 0.0) | (gb[17] > 0.0)
                keep = (sep_best < 0.0) & mv1 & (la >= 0)
                keepf = keep.astype(jnp.float32)
                dropped_bp = dropped2         # raw→cap compaction drops

                # ---- compact surviving (la, lb) into cap2 lanes ----
                km = jnp.stack([
                    jax.lax.slice_in_dim(keepf, r * 128, (r + 1) * 128)
                    for r in range(cap // 128)
                ]) if mosaic else keepf.reshape(cap // 128, 128)
                laf = la.astype(jnp.float32)
                lbf = lb.astype(jnp.float32)
                if mosaic:
                    la2 = jnp.stack([
                        jax.lax.slice_in_dim(laf, r * 128, (r + 1) * 128)
                        for r in range(cap // 128)])
                    lb2 = jnp.stack([
                        jax.lax.slice_in_dim(lbf, r * 128, (r + 1) * 128)
                        for r in range(cap // 128)])
                else:
                    la2 = laf.reshape(cap // 128, 128)
                    lb2 = lbf.reshape(cap // 128, 128)
                la, lb, dropped2 = compact_pair_lanes(km, la2, lb2, cap2)
                dropped2 = dropped2 + dropped_bp

                # ---- phase 2: re-gather survivor geometry ----
                oh_a, oh_b = onehots(la, lb)
                ga = bgather(oh_a)
                gb = bgather(oh_b)

            man = box_box_manifold_batched(
                (ga[0], ga[1], ga[2]), tuple(ga[3 + k] for k in range(9)),
                (ga[12], ga[13], ga[14]),
                (gb[0], gb[1], gb[2]), tuple(gb[3 + k] for k in range(9)),
                (gb[12], gb[13], gb[14]),
                mosaic=mosaic,
            )
            if _BP_DBG == 5:
                _dbg(jnp.sum(man.depth[0]) + jnp.sum(man.normal[0]))
                return

            movable = (ga[17] > 0.0) | (gb[17] > 0.0)
            mu_p = jnp.sqrt(ga[15] * gb[15])
            rest_p = jnp.maximum(ga[16], gb[16])
            ia = ga[18].astype(jnp.int32)
            ib = gb[18].astype(jnp.int32)
            # component-form key rows: (min id, max id, slot) — exact in f32
            # at any n ≤ 2^16 (a packed (mn·n+mx)·slots int32 overflows ≥ 16k)
            kl_p = jnp.maximum(ia, ib).astype(jnp.float32)
            kh_p = jnp.minimum(ia, ib).astype(jnp.float32)

            big_neg = jnp.float32(-1e30)
            score = [
                jnp.where(man.valid[s] & movable, man.depth[s], big_neg)
                for s in range(_CAP)
            ]
            # rank rows for pair contacts: global ranks from la/lb + base
            ra_p = (start + la).astype(jnp.float32)
            rb1_p = (start + lb + 1).astype(jnp.float32)
            live = (la >= 0).astype(jnp.float32)
            ra_p = ra_p * live
            rb1_p = rb1_p * live

            # payload rows are built as lists of [128] lane vectors (one per
            # output sublane) and stacked to [sub, 128] — a 1-D lane
            # concatenate to [sub·128] crashes Mosaic's layout assignment
            # (layout.h offsets<tiling check; bisected in
            # experiments/ct_bisect.py stage 18), while 128-aligned static
            # lane slices + jnp.stack are proven safe. Interpret mode keeps
            # the single-concatenate form (fewer ops for XLA:CPU's
            # superlinear compile on unrolled graphs).
            rows_n = CT2_ROWS if anchors else CT_ROWS
            rows = [[] for _ in range(rows_n)]

            def emit(ptx, pty, ptz, nx, ny, nz, d, act, mu, rest,
                     kl, kh, ksgn, ra, rb1, ks, anc=None):
                af = act.astype(jnp.float32)
                vals = [
                    ptx, pty, ptz, nx, ny, nz, d, mu, rest, af,
                    kl * af, kh * af, ksgn * af, ra * af, rb1 * af,
                    ks * af,
                ]
                if anchors:
                    # anc = 9 anchor rows (a_loc, b_loc-or-world, n_loc)
                    vals += [v * af for v in anc]
                    vals += [jnp.zeros_like(af)] * (CT2_ROWS - 25)
                for r, v in enumerate(vals):
                    if not mosaic:
                        rows[r].append(v)
                        continue
                    for j in range(v.shape[0] // 128):
                        rows[r].append(
                            jax.lax.slice_in_dim(v, j * 128, (j + 1) * 128))

            def t_apply(g, w):
                # Rᵀ·w for the geometry rows' row-major R at g[3:12]
                return (g[3] * w[0] + g[6] * w[1] + g[9] * w[2],
                        g[4] * w[0] + g[7] * w[1] + g[10] * w[2],
                        g[5] * w[0] + g[8] * w[1] + g[11] * w[2])

            for _ in range(kk):
                best, bidx = _argmax_unrolled(score)
                act = best > 0.0
                pt = _select(bidx, man.points)
                ks = bidx.astype(jnp.float32)                  # slot < _CAP
                anc = None
                if anchors:
                    a_loc = t_apply(ga, (pt[0] - ga[0], pt[1] - ga[1],
                                         pt[2] - ga[2]))
                    b_loc = t_apply(gb, (pt[0] - gb[0], pt[1] - gb[1],
                                         pt[2] - gb[2]))
                    n_loc = t_apply(ga, (man.normal[0], man.normal[1],
                                         man.normal[2]))
                    anc = list(a_loc) + list(b_loc) + list(n_loc)
                emit(pt[0], pt[1], pt[2],
                     man.normal[0], man.normal[1], man.normal[2],
                     jnp.where(act, best, 0.0), act, mu_p, rest_p,
                     kl_p, kh_p, jnp.zeros_like(kl_p), ra_p, rb1_p, ks,
                     anc=anc)
                if mosaic:
                    score = [
                        jnp.where(
                            (bidx == jnp.int32(s)), big_neg, score[s])
                        for s in range(_CAP)
                    ]
                else:
                    score = [
                        jnp.where(bidx == s, big_neg, score[s])
                        for s in range(_CAP)
                    ]

            if _BP_DBG == 6:
                _dbg(sum(jnp.sum(r[0]) for r in rows if r))
                return

            # ---- ground contacts for the bucket's own 128 ranks ----
            if kg > 0:
                gl = win[:, 0:BLOCK]                           # [24, 128]
                px, py, pz = gl[0], gl[1], gl[2]
                r9 = tuple(gl[3 + k] for k in range(9))
                hx, hy, hz = gl[12], gl[13], gl[14]
                mv = gl[17] > 0.0
                pts_g, dep_g = [], []
                for (sx, sy, sz) in _BOX_SIGNS:
                    wx, wy, wz = sx * hx, sy * hy, sz * hz
                    cx = px + r9[0] * wx + r9[1] * wy + r9[2] * wz
                    cy = py + r9[3] * wx + r9[4] * wy + r9[5] * wz
                    cz = pz + r9[6] * wx + r9[7] * wy + r9[8] * wz
                    pts_g.append((cx, cy, cz))
                    dep_g.append(jnp.float32(gh) - cy)
                gsc = [jnp.where(mv & (d > 0.0), d, big_neg) for d in dep_g]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, BLOCK), 1)[0]
                body_id = gl[18].astype(jnp.int32)
                ra_g = (start + lane).astype(jnp.float32)
                one_g = jnp.ones((BLOCK,), jnp.float32)
                body_f = body_id.astype(jnp.float32)
                for _ in range(kg):
                    best, bidx = _argmax_unrolled(gsc)
                    act = best > 0.0
                    pt = _select(bidx, pts_g)
                    ks = bidx.astype(jnp.float32)              # corner < 8
                    anc = None
                    if anchors:
                        a_loc = ((pt[0] - gl[0]) * gl[3]
                                 + (pt[1] - gl[1]) * gl[6]
                                 + (pt[2] - gl[2]) * gl[9],
                                 (pt[0] - gl[0]) * gl[4]
                                 + (pt[1] - gl[1]) * gl[7]
                                 + (pt[2] - gl[2]) * gl[10],
                                 (pt[0] - gl[0]) * gl[5]
                                 + (pt[1] - gl[1]) * gl[8]
                                 + (pt[2] - gl[2]) * gl[11])
                        # no body B: the anchor is the WORLD point itself;
                        # n_loc = Rᵀ·ŷ = R's middle row
                        anc = (list(a_loc) + [pt[0], pt[1], pt[2]]
                               + [gl[6], gl[7], gl[8]])
                    emit(pt[0], pt[1], pt[2],
                         jnp.zeros_like(one_g), one_g, jnp.zeros_like(one_g),
                         jnp.where(act, best, 0.0), act, gl[15], gl[16],
                         body_f, jnp.zeros_like(one_g), one_g, ra_g,
                         jnp.zeros_like(one_g), ks, anc=anc)
                    if mosaic:
                        gsc = [
                            jnp.where((bidx == jnp.int32(s)), big_neg, gsc[s])
                            for s in range(8)
                        ]
                    else:
                        gsc = [
                            jnp.where(bidx == s, big_neg, gsc[s])
                            for s in range(8)
                        ]

            if mosaic:
                pay2 = [jnp.stack(r) for r in rows]            # 16 × [sub, 128]
            else:
                pay2 = [jnp.concatenate(r).reshape(sub, 128) for r in rows]
            if _BP_DBG == 7:
                _dbg(jnp.sum(pay2[CT_ACT]))
                return

            # ---- per-bucket compaction (order-preserving) ----
            mask = pay2[CT_ACT]                                # [sub, 128]
            slot = _exclusive_prefix(mask)
            slot = slot * mask + (1.0 - mask) * jnp.float32(ccap)

            # chunked one-hot scatter. The one-hot is built TRANSPOSED
            # ([ccap, cw]: sublane iota vs the flattened slot lane-vector
            # broadcast along sublanes) because Mosaic accepts the
            # sublanes→lanes flatten [CR,128]→[1,CW] but not a lane-vector →
            # column reshape; the dot then contracts both dim-1s.
            acc = jnp.zeros((rows_n, ccap), jnp.float32)
            oh_row = jax.lax.broadcasted_iota(
                jnp.int32, (ccap, chunk_rows * 128), 0)
            for r0 in range(0, sub, chunk_rows):
                cr = min(chunk_rows, sub - r0)
                cwr = cr * 128
                sl = slot[r0:r0 + cr].reshape(1, cwr).astype(jnp.int32)
                oht = (oh_row[:, :cwr] == sl).astype(jnp.bfloat16)
                pay = jnp.stack(
                    [pay2[r][r0:r0 + cr].reshape(1, cwr)[0]
                     for r in range(rows_n)])                  # [rows_n, CWR]
                p_hi, p_lo = _split(pay)
                acc += jax.lax.dot_general(
                    p_hi, oht, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    p_lo, oht, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = acc


            n_act = jnp.sum(mask)
            r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            at00 = ((r_i == 0) & (c_i == 0)).astype(jnp.float32)
            at01 = ((r_i == 0) & (c_i == 1)).astype(jnp.float32)
            at02 = ((r_i == 0) & (c_i == 2)).astype(jnp.float32)
            at03 = ((r_i == 0) & (c_i == 3)).astype(jnp.float32)
            dropped = jnp.maximum(n_act - jnp.float32(ccap), 0.0)
            meta_ref[:] = (at00 * dropped + at01 * n_act + at02 * dropped2
                           + at03 * winovf)

        if gate:
            # per-bucket motion gate (refresh steps): recompute this
            # bucket's contacts from CURRENT geometry when its bodies
            # (or the forward window's) are moving; otherwise pass the
            # persisted table block through untouched. Counters for
            # passthrough buckets are zero (the caller folds them with
            # the persisted rebuild counters).
            g = base_ref[pl.num_programs(0) + b]

            @pl.when(g > 0)
            def _():
                _compute()

            @pl.when(g <= 0)
            def _():
                out_ref[:] = prev_tab_ref[:]
                meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
        else:
            _compute()

        if warm:
            # (runs after the gate branches: `acc` is read back from the
            # out block, so passthrough buckets warm-match against their
            # own identical keys -> identity lambda carry)
            acc = out_ref[:]
            # per-bucket warm-start match: eq[i, j] = 1 iff previous
            # contact i and fresh contact j carry the same feature key
            # and both are active; λ₀ = prev_λᵀ·eq. Keys are unique per
            # (pair, slot) so each column has ≤ 1 match. Activity folds
            # into the keys themselves (fresh inactive → −2, previous
            # inactive → −1, never within 0.5 of each other or of a real
            # key) so the block compare is TWO |Δ|<0.5 tests, not five —
            # the [128, ccap] compare lanes are most of the warm cost.
            ck = (acc[CT_KL]
                  + 65536.0 * (2.0 * acc[CT_KS] + acc[CT_KSGN])
                  + 2.0 * (acc[CT_ACT] - 1.0)).reshape(1, ccap)
            ch = acc[CT_KH].reshape(1, ccap)
            lam0 = jnp.zeros((3, ccap), jnp.float32)
            for r0 in range(0, ccap, 128):
                pk = prev_ref[r0:r0 + 128, 0:1]            # [128, 1]
                ph = prev_ref[r0:r0 + 128, 1:2]
                eq = ((jnp.abs(pk - ck) < 0.5)
                      & (jnp.abs(ph - ch) < 0.5))
                eq_bf = eq.astype(jnp.bfloat16)            # [128, ccap]
                plam = prev_ref[r0:r0 + 128, 4:7]          # [128, 3]
                p_hi, p_lo = _split(plam)
                lam0 += jax.lax.dot_general(
                    p_hi, eq_bf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lam0 += jax.lax.dot_general(
                    p_lo, eq_bf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            zc = jnp.zeros((ccap,), jnp.float32)
            warm_ref[:] = jnp.stack(
                [lam0[0], lam0[1], lam0[2], zc, zc, zc, zc, zc])


    return kernel


def geom_pad(n: int, cfg: SimConfig) -> Tuple[int, int]:
    """(wtot, npad) of the rank-space geometry window for an n-body scene
    — shared by this kernel and solve_impulses_table (identical formulas
    so one table serves both)."""
    nb = -(-n // BLOCK)
    wtot = _round_up(BLOCK + min(band_window(cfg), BLOCK), 128)
    npad = max(_round_up(n + wtot, 128), nb * BLOCK + wtot)
    return wtot, npad


def unified_geom(state: SimState, cfg: SimConfig,
                 order: Array | None, hulls: bool = False) -> Array:
    """ONE rank-space geometry table [48, NPAD] for the whole contact
    step — built once, gathered through `order` once, shared by the
    contact-table kernel, the solve-constants kernel, and the solve
    kernel's fused integration epilogue:

      rows  0:24  solve layout (solver/contacts_pallas._make_prep_kernel):
                  pos | world I⁻¹ row-major | inv_mass | vel | omega |
                  quat (19:23, read only by the integration epilogue)
      rows 24:48  narrow-phase layout (this kernel's existing rows,
                  offset by 24 — pos is duplicated so BOTH kernels read
                  one contiguous 24-row block)

    hulls=True (ops/hull_table.py): the shape rows describe the shared
    hull instead of a box — half extents carry the hull's local-AABB
    half extents, the movable/live rows use is_hull, and rows 44:47 hold
    the world OBB center (pos + R·co) for the in-kernel prefilter.
    """
    n = state.num_bodies
    _, npad = geom_pad(n, cfg)
    movable = (state.inv_mass > 0.0).astype(jnp.float32)
    r9 = v3.quat_to_mat(state.quat)
    iw9 = v3.sandwich(r9, v3.mat_unpack(state.inv_inertia))
    zero = jnp.zeros((n,), jnp.float32)
    pos3 = [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
    if hulls:
        # per-TYPE local AABBs gathered per body; the live row (43)
        # carries is_hull·(1 + hull type) so the hull table kernel can
        # derive each lane's ordered type pair (round 5 multi-type)
        is_shape = (state.shapes.stype == SHAPE_HULL).astype(jnp.float32)
        nh = state.hulls.verts.shape[0]
        vmask = (jnp.arange(state.hulls.verts.shape[1])[None, :]
                 < state.hulls.vert_count[:, None])         # [H, V]
        big = jnp.float32(1e30)
        lo_t = jnp.min(jnp.where(vmask[..., None],
                                 state.hulls.verts, big), axis=1)
        hi_t = jnp.max(jnp.where(vmask[..., None],
                                 state.hulls.verts, -big), axis=1)
        hidx = jnp.clip(state.shapes.hull_index, 0, nh - 1)
        co_b = ((lo_t + hi_t) * 0.5)[hidx]                  # [n, 3]
        hh_b = ((hi_t - lo_t) * 0.5)[hidx]
        half3 = [hh_b[:, 0], hh_b[:, 1], hh_b[:, 2]]
        tail = [pos3[c] + r9[3 * c] * co_b[:, 0]
                + r9[3 * c + 1] * co_b[:, 1]
                + r9[3 * c + 2] * co_b[:, 2] for c in range(3)] + [zero]
        is_shape = is_shape * (1.0 + hidx.astype(jnp.float32))
    else:
        is_shape = (state.shapes.stype == SHAPE_BOX).astype(jnp.float32)
        half3 = [state.shapes.params[:, 0], state.shapes.params[:, 1],
                 state.shapes.params[:, 2]]
        tail = [zero] * 4
    rows = jnp.stack(
        pos3
        + list(iw9)
        + [state.inv_mass,
           state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
           state.omega[:, 0], state.omega[:, 1], state.omega[:, 2],
           state.quat[:, 0], state.quat[:, 1], state.quat[:, 2],
           state.quat[:, 3], zero]
        + pos3
        + list(r9)
        + half3
        + [state.shapes.friction,
           state.shapes.restitution, movable * is_shape,
           jnp.arange(n, dtype=jnp.float32), is_shape]
        + tail
    )                                                     # [48, N]
    if order is not None:
        rows = rows[:, order]
    return jnp.zeros((48, npad), jnp.float32).at[:, :n].set(rows)


def table_shape(n: int, cfg: SimConfig) -> Tuple[int, int, int]:
    """(nb, ccap, cp) of the contact table for an n-body scene."""
    nb = -(-n // BLOCK)
    if cfg.bucket_ccap > 0:
        ccap = _round_up(cfg.bucket_ccap, 128)
    else:
        total = cfg.max_contacts if cfg.max_contacts > 0 else 6 * n
        ccap = _round_up(max(total // nb, 128), 128)
    return nb, ccap, nb * ccap


def bucket_contact_table(
    state: SimState,
    cand: PairCandidates | None,
    cfg: SimConfig,
    order: Array | None,
    prev: Tuple[Array, Array] | None = None,
    geom: Array | None = None,
    buckets: Tuple[Array, int] | None = None,
    gate: Tuple[Array, Array] | None = None,
) -> Tuple[Array, Array, Array | None]:
    """Run the fused kernel. Returns (table [CT_ROWS, NB·ccap],
    meta [8, NB·128] — meta[0, b·128] = dropped count of bucket b,
    meta[0, b·128+1] = active count, meta[0, b·128+2] = prefilter
    survivors dropped beyond bucket_cap2 (or beyond the compaction cap
    with the in-kernel broad phase), meta[0, b·128+3] = ranks whose
    x-interval still overlaps at the window edge (in-kernel broad phase
    only — pairs may exist beyond the window), warm [8, NB·ccap] | None).

    cand=None (cfg.bp_inkernel) folds the broad phase into the kernel:
    candidates are derived from the sorted geometry window by shifted
    static slices (see _make_ct_kernel bp_k) — no sweep-mask kernel, no
    segmented candidate sort, no candidate tensors in HBM.

    `order` is the sweep's body order (body id per rank); None = identity.
    `prev = (keys [2, cp] int32 from table_keys, lam3 [3, cp])` — the
    previous step's TABLE-ALIGNED feature keys and converged impulses; the
    kernel computes warm-start λ₀ per fresh contact in its epilogue
    (rows 0:3 of the warm output) via per-bucket key matching.
    Requires cfg.pair_buckets with bucket_block == 128 (the kernel's
    ground slice and window bases assume it) and n ≤ 2¹⁶ (body ids ride
    the geometry table through the hi/lo bf16 split, which is exact for
    integers < 2¹⁶ + 2⁹).

    `buckets = (bucket0, nb_local)` restricts the kernel to the
    `nb_local` buckets starting at traced scalar `bucket0` (row-sharded
    steps: each shard builds its own bucket range against the replicated
    geometry; outputs are the LOCAL [*, nb_local·ccap] blocks). The
    caller must then pass `cand`/`prev` already sliced to that range.
    """
    n = state.num_bodies
    assert n <= (1 << 16), "contact_table: body ids exceed exact-f32 range"
    bp_k = 0
    env_k = 0
    if cfg.broadphase == "env_blocks":
        # packed-env mode (envs.pack_envs): identity order, candidates
        # (r, r+d), d < K, same-env masked in-kernel — requires the
        # in-kernel broad phase (no bucketed candidate tensors exist)
        env_k = cfg.env_block_size
        assert cand is None and cfg.bp_inkernel, (
            "env_blocks contact_table requires cfg.bp_inkernel")
        assert env_k > 1 and BLOCK % env_k == 0 and n % env_k == 0, (
            f"env_blocks contact_table: env_block_size {env_k} must "
            f"divide {BLOCK} and num_bodies {n}")
    if cand is None:
        bp_k = min(band_window(cfg), BLOCK, n - 1)
        # stage-1 compaction width = the bucket cap; the face-SAT cap2
        # stage then narrows to bucket_cap2 like the candidate path
        _, cap, _ = bucket_shape(n, cfg)
        cap = min(cap, _round_up(128 * bp_k, 128))
    else:
        block, cap, nb_cand = bucket_shape(n, cfg)
        if block != BLOCK:
            raise ValueError(
                f"contact_table requires bucket_block == {BLOCK} "
                f"(got {block})")
    nb, ccap, cp = table_shape(n, cfg)
    if cand is not None:
        assert nb == nb_cand, (nb, nb_cand)
    kk = min(cfg.max_contacts_per_pair, _CAP)
    kg = min(cfg.max_contacts_per_pair, 8) if cfg.ground_plane else 0
    wtot, npad = geom_pad(n, cfg)

    row0 = 0
    if geom is None:
        movable = (state.inv_mass > 0.0).astype(jnp.float32)
        is_box = (state.shapes.stype == SHAPE_BOX).astype(jnp.float32)
        r9 = v3.quat_to_mat(state.quat)
        rows = jnp.stack(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
            + list(r9)
            + [state.shapes.params[:, 0], state.shapes.params[:, 1],
               state.shapes.params[:, 2], state.shapes.friction,
               state.shapes.restitution, movable * is_box,
               jnp.arange(n, dtype=jnp.float32), is_box]
            + [jnp.zeros((n,), jnp.float32)] * (GEOM_ROWS - 20)
        )                                                 # [24, N]
        if order is not None:
            rows = rows[:, order]
        geom = jnp.zeros((GEOM_ROWS, npad), jnp.float32).at[:, :n].set(
            rows)
    else:
        # the shared unified table (unified_geom): this kernel's block
        # sits at rows 24:48
        assert geom.shape == (48, npad), (geom.shape, npad)
        row0 = 24

    # local bucket range (row sharding): nb_l buckets starting at the
    # traced bucket0; single-device = the full static range
    if buckets is not None:
        bucket0, nb_l = buckets
        bucket_idx = bucket0 + jnp.arange(nb_l, dtype=jnp.int32)
    else:
        bucket0, nb_l = None, nb
        bucket_idx = jnp.arange(nb, dtype=jnp.int32)
    cp_l = nb_l * ccap
    bases = bucket_idx * BLOCK                             # [nb_l] int32

    cap2 = cfg.bucket_cap2
    if cap2:
        if cap2 % 128:
            raise ValueError(
                f"bucket_cap2 must be a 128-multiple; got {cap2}")
        # clamp, don't raise: production configs set cap2 for the big
        # scenes they're tuned on, and a tiny scene's bucket cap can be
        # smaller — the prefilter cap is an optimization bound, not a
        # semantic (a clamped cap2 == cap disables the extra pass)
        cap2 = min(cap2, cap)
        if cap2 == cap:
            cap2 = 0        # no-op prefilter: skip the extra pass
    if cand is not None:
        # candidate locals: bucket-major [NB_L·cap] ranks → local to
        # the bucket's base rank
        p = cand.rank_a.shape[0]
        assert p == nb_l * cap, (p, nb_l, cap)
        base_per = jnp.repeat(bases, cap)
        la = jnp.where(cand.mask, cand.rank_a - base_per, -1)
        lb = jnp.where(cand.mask, cand.rank_b - base_per, -1)
        la3 = jnp.broadcast_to(la.reshape(nb_l, 1, cap), (nb_l, 8, cap))
        lb3 = jnp.broadcast_to(lb.reshape(nb_l, 1, cap), (nb_l, 8, cap))
    interpret = jax.default_backend() != "tpu"
    anchors = cfg.contact_rebuild > 1
    rows_n = CT2_ROWS if anchors else CT_ROWS
    kernel = _make_ct_kernel(
        cap, wtot, kk, kg, ccap, n, cfg.ground_height,
        mosaic=not interpret, warm=prev is not None, cap2=cap2,
        bp_k=bp_k, row0=row0, env_k=env_k, anchors=anchors,
        gate=gate is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] if bp_k else [
        pl.BlockSpec((1, 8, cap), lambda b, bs: (b, 0, 0)),
        pl.BlockSpec((1, 8, cap), lambda b, bs: (b, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((rows_n, ccap), lambda b, bs: (0, b)),
        pl.BlockSpec((8, 128), lambda b, bs: (0, b)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows_n, cp_l), jnp.float32),
        jax.ShapeDtypeStruct((8, nb_l * 128), jnp.float32),
    ]
    operands = [geom] if bp_k else [la3, lb3, geom]
    if gate is not None:
        # per-bucket motion gate: scalar row rides the prefetch array
        # (bases | gate), the persisted table streams in per bucket
        gate_arr, prev_table = gate
        assert gate_arr.shape == (nb_l,), (gate_arr.shape, nb_l)
        assert prev_table.shape == (rows_n, cp_l), (
            prev_table.shape, rows_n, cp_l)
        bases = jnp.concatenate([bases, gate_arr.astype(jnp.int32)])
        in_specs.append(pl.BlockSpec((rows_n, ccap), lambda b, bs: (0, b)))
        operands.append(prev_table)
    if prev is not None:
        pkey, plam = prev
        pcols = prev_key_cols(pkey, plam)                  # [cp_l, 8]
        assert pcols.shape[0] == cp_l, (pcols.shape, cp_l)
        in_specs.append(pl.BlockSpec((ccap, 8), lambda b, bs: (b, 0)))
        out_specs.append(pl.BlockSpec((8, ccap), lambda b, bs: (0, b)))
        out_shape.append(jax.ShapeDtypeStruct((8, cp_l), jnp.float32))
        operands.append(pcols)
    # the geometry table lives whole in VMEM; at large N (≥ ~48k bodies)
    # it alone approaches the 16 MB default scoped-vmem cap — lift the
    # cap only when the shapes need it (same policy as banded_sweeps)
    fixed_bytes = geom.size * 4
    block_bytes = 2 * 4 * (2 * 8 * cap + CT_ROWS * ccap + 8 * 128
                           + (2 * 8 * ccap if prev is not None else 0))
    needed = int((fixed_bytes + block_bytes) * 1.25)
    params = {}
    if needed > 16 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=needed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_l,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(bases, *operands)
    if prev is not None:
        out, meta, warm_rows = res
        return out, meta, warm_rows
    out, meta = res
    return out, meta, None


def table_keys(table: Array) -> Array:
    """Pack the component-form key rows into [2, C] int32 for cross-step
    storage (state.contact_key): row0 = KL | (2·KS + KSGN) << 16,
    row1 = KH + 1; both 0 ⇔ inactive slot. row0 ≥ 1 for every active
    contact (pair: KL = max id ≥ 1; ground: the KSGN bit)."""
    act = table[CT_ACT] > 0.0
    row0 = (table[CT_KL].astype(jnp.int32)
            + ((2 * table[CT_KS].astype(jnp.int32)
                + table[CT_KSGN].astype(jnp.int32)) << 16))
    row1 = table[CT_KH].astype(jnp.int32) + 1
    z = jnp.zeros_like(row0)
    return jnp.stack([jnp.where(act, row0, z), jnp.where(act, row1, z)])


def prev_key_cols(pkey: Array, plam: Array) -> Array:
    """Previous-step (keys [2, C] int32 from `table_keys`, λ [3, C]) →
    the [C, 8] per-slot column block the table kernels' warm match reads:
    col 0 = ck (KL + 65536·(2·KS+KSGN); −1 inactive), col 1 = KH (−1
    inactive), col 3 = activity, cols 4:7 = λ."""
    cp = pkey.shape[1]
    act_p = pkey[0] != 0
    neg1 = jnp.float32(-1.0)
    return jnp.stack([
        jnp.where(act_p, pkey[0].astype(jnp.float32), neg1),
        jnp.where(act_p, (pkey[1] - 1).astype(jnp.float32), neg1),
        jnp.zeros((cp,), jnp.float32),
        act_p.astype(jnp.float32),
        plam[0], plam[1], plam[2],
        jnp.zeros((cp,), jnp.float32),
    ], axis=1)                                             # [cp, 8]


def table_keys_scalar(table: Array, n: int, pair_stride: int,
                      ground_stride: int) -> Array:
    """Reconstruct the legacy packed int32 key per slot — pair:
    (mn·n + mx)·pair_stride + slot, ground: −(body·ground_stride + slot
    + 1) — matching the XLA narrow-phase paths' keys for parity tests.
    Only valid when the packed value fits int32 (n ≲ 16k)."""
    act = table[CT_ACT] > 0.0
    sgn = table[CT_KSGN] > 0.0
    ks = table[CT_KS].astype(jnp.int32)
    pair = ((table[CT_KH].astype(jnp.int32) * n
             + table[CT_KL].astype(jnp.int32)) * pair_stride + ks)
    gnd = -(table[CT_KL].astype(jnp.int32) * ground_stride + ks + 1)
    return jnp.where(act, jnp.where(sgn, gnd, pair), 0)
