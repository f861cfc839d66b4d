"""Fused bucket-aligned HULL contact table: shared-hull SAT narrow phase +
vertex ground contacts + per-bucket compaction in ONE Pallas kernel.

The hulls_only analogue of ops/contact_table.py. It replaces, for
single-shared-hull bucketed-sweep scenes (mesh rain), the whole XLA span
between the broad phase and the banded contact solver:

    OBB face-SAT prefilter + compaction (hull_obb_prefilter)     ~0.06 ms
    hull SAT supports/axes/clip (hullhull_batched, many XLA ops) ~0.13 ms
    slot-major top-k epilogue (_pair_contacts_hulls_fast)        ~0.19 ms
    hull ground contacts (_ground_contacts_hulls_fast)           ~0.04 ms
    contact rank sort + warm sort-merge (solve prologue)         ~0.13 ms
    (plus the XLA op-boundary wall gap these ~150 launches cost)

with one kernel whose grid steps each own ONE rank bucket (BLOCK = 128
body ranks, matching the bucketed sweep): OBB prefilter on the bucket's
candidates → survivors compact to `bucket_cap2` lanes → the full hull SAT
(face supports, edge axes, incident-face Sutherland–Hodgman clip,
edge-edge closest point — the math of ops/hullhull_batched.py, reshaped
for VMEM residency) → per-pair top-k slot selection → vertex ground
contacts for the bucket's own ranks → in-kernel compaction into the
rank-banded contact table with STATIC solver tile bases → warm-start key
matching. The banded solve (solver/contacts_pallas.solve_impulses_table)
consumes the table unchanged; fuse_prep/fuse_integrate compose.

The key identity carried over from ops/hullhull_batched.py: with one
SHARED hull shape every pairwise SAT quantity is LINEAR in the extended
per-pair vector m_ext = [M (9) | dpa (3) | dpb (3) | 1] where
M = R_aT R_b, dpa = R_aT(p_b-p_a), dpb = R_bT(p_a-p_b) — so ALL pairs'
face separations fall out of static [rows, 16] x [16, cap2] coefficient
matmuls followed by min-reductions over vertex row groups (the
face-support constant terms n_f.dpa - off ride the same matmul through
the dpa/const columns, so the min over vertices directly yields the
separation). Selection one-hots ([F, cap2] iota-compare, first-tie via a
triangular-matmul prefix) turn every "gather the chosen face's data"
into a static-coefficient matmul — P stays in the lane dimension
throughout, nothing leaves VMEM between phases.

Feature keys are component-form rows (ops/contact_table.py CT_K*
comment: max id / min id / slot, slot < S = 2E+1 for pairs, the vertex
id for ground) — identifying the same (pair, slot) features as the XLA
fast paths' packed keys ((min.n+max).S + slot / -(body.Vcap + vertex
+ 1)) without the int32 overflow at large n. table_keys_scalar
reconstructs the packed form for parity tests (tests/test_hull_table.py
against _pair_contacts_hulls_fast / _ground_contacts_hulls_fast).

New capability vs the reference (no collision detection there,
SURVEY.md §0); TPU shaping rules per docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.config import SimConfig
from physics_tpu.maths import vec3c as v3
from physics_tpu.ops.boxbox_batched import _clip
from physics_tpu.ops.broadphase import PairCandidates, bucket_shape
from physics_tpu.ops.contact_table import (
    BLOCK,
    CT_ACT,
    CT_KH,
    CT_KL,
    CT_KS,
    CT_KSGN,
    CT_ROWS,
    CT2_ROWS,
    GEOM_ROWS,
    _KS_LIMIT,
    _exclusive_prefix,
    _round_up,
    _split,
    geom_pad,
    prev_key_cols,
    table_shape,
)
from physics_tpu.ops.hullhull_batched import build_hull_tables
from physics_tpu.state import SimState

Array = jnp.ndarray

HIGHEST = jax.lax.Precision.HIGHEST

BIG = 1e30

# the fused kernel runs its SAT block once per ORDERED hull-type pair
# (H^2 passes over the candidate lanes, per-lane pair masks) — compile
# time and VPU cost scale with H^2, so the table path caps the library;
# larger libraries ride the type-pair-segmented XLA fast path. H = 3
# (9 passes) measured: contact-set parity with the segmented path and
# still ahead of the XLA fallback per body; the stacked coefficient
# tables are KB-scale per pair, so VMEM is not the binding constraint.
MAX_TABLE_HULL_TYPES = 3

# Mosaic-crash bisect hook (HT_DEBUG=k truncates the kernel after
# stage k and writes dummy outputs) — same pattern as CT_BP_DEBUG.
_HT_DBG = int(os.environ.get("HT_DEBUG", "0"))


def _round8(x: int) -> int:
    return -(-x // 8) * 8


class HullCoef(NamedTuple):
    """Static per-scene coefficient tables for the kernel (device arrays,
    built from state.hulls each trace — a few µs of tiny einsums).

    c16 [2·V·FP + 3·D2P + 2·V·D2P, 16] — rows contracted against
        m_ext = [M | dpa | dpb | 1]:
          A_FACE  [v·FP + f]: a_fv | face_n | 0 | (−off or −BIG pad)
          B_FACE  [v·FP + f]: b_fv | 0 | face_n | (−off or −BIG pad)
          LAX     [c·D2P + a]: edge-axis component coefficients (masked)
          EAV/EBV [v·D2P + a]: endpoint support coefficients
    c32 [608, FP] — rows contracted against face one-hots [FP, cap2]:
          INC_RA/INC_RB [k·FP + o]: incident-face alignment (ref on A/B)
          POLY [c·E + e]: face-polygon vertex coords
          FCNT/FN/OFF: per-face vertex count, normal, plane offset
    c88 [2·9·V, D2P] — SAV/SBV [k·V + u]: selected-axis endpoint supports
    c48 [168, V] — S0/S1 [E2P, V] edge-endpoint one-hots; VT verts.T
    c80 [8, E2P] — V01 rows 0:6: edge endpoint coords (v0 xyz | v1 xyz)
    cb  [160, 1] — bias columns: FBIAS(+BIG pad faces), EBIAS(+BIG pad
        edges), VBIAS(−BIG pad verts)
    v3c [V, 3]   — hull vertices (ground-height matmul LHS)
    """

    c16: Array
    c32: Array
    c88: Array
    c48: Array
    c80: Array
    cb: Array
    v3c: Array


class HullDims(NamedTuple):
    """Static (python int) shape constants shared by builder and kernel."""

    f: int        # real faces
    fp: int       # padded faces (8-mult)
    vcap: int     # hull vertex capacity (= rows of verts)
    d2: int       # edge-dir pairs D²
    d2p: int      # padded (8-mult)
    e: int        # max verts per face (clip slots = 2e, S = 2e+1)
    e2: int       # unique edges
    e2p: int      # padded (8-mult)


# c32 row offsets (k·FP blocks sized at trace time). Round 5: the
# polygon / count / normal / plane-offset blocks are SIDED (separate A
# and B tables) so a type PAIR's kernel pass can pick the reference /
# incident face data from the hull that actually owns it — for the
# shared-hull case both sides hold identical tables.
def _c32_offsets(fp: int, e: int):
    inc_ra = 0
    inc_rb = 9 * fp
    poly_a = 18 * fp
    poly_b = poly_a + 3 * e
    fcnt_a = poly_b + 3 * e
    fcnt_b = fcnt_a + 1
    fn_a = fcnt_b + 1
    fn_b = fn_a + 3
    off_a = fn_b + 3
    off_b = off_a + 1
    total = _round8(off_b + 1)
    return (inc_ra, inc_rb, poly_a, poly_b, fcnt_a, fcnt_b, fn_a, fn_b,
            off_a, off_b, total)


def hull_dims(hulls) -> HullDims:
    f = hulls.face_normals.shape[1]
    vcap = hulls.verts.shape[1]
    d2 = hulls.edge_dirs.shape[1] ** 2
    e = hulls.face_verts.shape[2]
    e2 = hulls.edge_i0.shape[1]
    return HullDims(f=f, fp=_round8(f), vcap=vcap, d2=d2, d2p=_round8(d2),
                    e=e, e2=e2, e2p=_round8(e2))


def build_hull_coef(state: SimState, ia: int = 0, ib: int = 0
                    ) -> Tuple[HullCoef, HullDims]:
    """Reorder ops/hullhull_batched.build_hull_tables' coefficient tables
    for hull type pair (ia, ib) into the kernel's vertex-major /
    component-major padded layouts. All face/edge/vertex blocks are
    SIDED (A = type ia, B = type ib); the shared-hull case ia == ib
    degenerates to identical sides."""
    ht = build_hull_tables(state.hulls, ia, ib)
    dm = hull_dims(state.hulls)
    f, fp, vcap = dm.f, dm.fp, dm.vcap
    d2, d2p, e, e2, e2p = dm.d2, dm.d2p, dm.e, dm.e2, dm.e2p

    def padf(x, width, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, width - x.shape[axis])
        return jnp.pad(x, pad)

    def face_const(mask, off):
        # pad faces MUST carry -BIG in the const column (zero-padding
        # would give them separation 0, which wins the argmax whenever
        # all real faces overlap - selecting a garbage reference face)
        c = jnp.where(mask > 0, -off, -jnp.float32(BIG))
        return jnp.concatenate([c, jnp.full((fp - f,), -jnp.float32(BIG))])

    const_a = face_const(ht.face_mask_a, ht.face_off_a)      # [FP]
    const_b = face_const(ht.face_mask_b, ht.face_off_b)
    n32a = padf(ht.face_n_a, fp, 0)                          # [FP, 3]
    n32b = padf(ht.face_n_b, fp, 0)
    zeros3 = jnp.zeros((vcap, fp, 3), jnp.float32)

    def face_block(coef, nrm, const, dpa_side: bool):
        # coef [F.V, 9] rows (f.V + u) -> [V, FP, 16]
        c9 = padf(coef.reshape(f, vcap, 9).transpose(1, 0, 2), fp, 1)
        nb = jnp.broadcast_to(nrm[None], (vcap, fp, 3))
        cols = ([c9, nb, zeros3] if dpa_side else [c9, zeros3, nb])
        cols.append(jnp.broadcast_to(const[None, :, None],
                                     (vcap, fp, 1)))
        return jnp.concatenate(cols, axis=-1).reshape(vcap * fp, 16)

    a_face = face_block(ht.a_fv, n32a, const_a, True)
    b_face = face_block(ht.b_fv, n32b, const_b, False)

    def pad16(x):                                     # [R, 9] -> [R, 16]
        return jnp.pad(x, ((0, 0), (0, 7)))

    # LAX [c.D2P + a]: rows (a.3 + c) -> [3, D2P, 9], masked axes zeroed
    lax = (ht.l_ax.reshape(d2, 3, 9).transpose(1, 0, 2)
           * ht.ax_mask[None, :, None])
    lax = pad16(padf(lax, d2p, 1).reshape(3 * d2p, 9))
    # EAV/EBV [v.D2P + a]: rows (a.V + u)
    eav = pad16(padf(ht.c_av.reshape(d2, vcap, 9).transpose(1, 0, 2),
                     d2p, 1).reshape(vcap * d2p, 9))
    ebv = pad16(padf(ht.c_bv.reshape(d2, vcap, 9).transpose(1, 0, 2),
                     d2p, 1).reshape(vcap * d2p, 9))
    c16 = jnp.concatenate([a_face, b_face, lax, eav, ebv])

    ff3 = ht.ff.reshape(f, f, 9)                      # [a, b, 9]
    # ref on A -> incident over B: rows [k.FP + o], cols a_ref
    inc_ra = padf(padf(ff3.transpose(2, 1, 0), fp, 1), fp, 2
                  ).reshape(9 * fp, fp)
    # ref on B -> incident over A: rows [k.FP + o], cols b_ref
    inc_rb = padf(padf(ff3.transpose(2, 0, 1), fp, 1), fp, 2
                  ).reshape(9 * fp, fp)

    def poly_block(verts, face_verts, face_cnt, nrm32, off):
        poly = padf(verts[face_verts].transpose(2, 1, 0), fp, 2
                    ).reshape(3 * e, fp)              # [c.E + e, FP]
        fcnt = padf(face_cnt.astype(jnp.float32), fp, 0)[None, :]
        offr = padf(off, fp, 0)[None, :]
        return poly, fcnt, nrm32.T, offr

    pa_, fca, fna, offa = poly_block(ht.verts_a, ht.face_verts_a,
                                     ht.face_cnt_a, n32a, ht.face_off_a)
    pb_, fcb, fnb, offb = poly_block(ht.verts_b, ht.face_verts_b,
                                     ht.face_cnt_b, n32b, ht.face_off_b)
    *_, c32_rows = _c32_offsets(fp, e)
    c32 = jnp.concatenate([inc_ra, inc_rb, pa_, pb_, fca, fcb,
                           fna, fnb, offa, offb])
    c32 = jnp.pad(c32, ((0, c32_rows - c32.shape[0]), (0, 0)))

    # SAV/SBV [k.V + u, D2P]: from c_av rows (a.V + u, k)
    sav = padf(ht.c_av.reshape(d2, vcap, 9).transpose(2, 1, 0), d2p, 2
               ).reshape(9 * vcap, d2p)
    sbv = padf(ht.c_bv.reshape(d2, vcap, 9).transpose(2, 1, 0), d2p, 2
               ).reshape(9 * vcap, d2p)
    c88 = jnp.concatenate([sav, sbv])

    def edge_onehots(i0, i1, emask):
        s0 = padf(jax.nn.one_hot(i0, vcap, dtype=jnp.float32)
                  * emask[:, None], e2p, 0)           # [E2P, V]
        s1 = padf(jax.nn.one_hot(i1, vcap, dtype=jnp.float32)
                  * emask[:, None], e2p, 0)
        return s0, s1

    s0a, s1a = edge_onehots(ht.edge_i0_a, ht.edge_i1_a, ht.edge_mask_a)
    s0b, s1b = edge_onehots(ht.edge_i0_b, ht.edge_i1_b, ht.edge_mask_b)
    c48 = jnp.concatenate([s0a, s1a, s0b, s1b])
    c48 = jnp.pad(c48, ((0, _round8(c48.shape[0]) - c48.shape[0]), (0, 0)))

    def edge_pts(verts, i0, i1):
        v0e = padf(verts[i0].T, e2p, 1)               # [3, E2P]
        v1e = padf(verts[i1].T, e2p, 1)
        return jnp.concatenate([v0e, v1e])

    c80 = jnp.concatenate([edge_pts(ht.verts_a, ht.edge_i0_a,
                                    ht.edge_i1_a),
                           edge_pts(ht.verts_b, ht.edge_i0_b,
                                    ht.edge_i1_b)])   # [12, E2P]
    c80 = jnp.pad(c80, ((0, 16 - c80.shape[0]), (0, 0)))

    def fbias(mask):
        return jnp.where(padf(mask, fp, 0) > 0, 0.0, jnp.float32(BIG))

    def ebias(mask):
        return jnp.where(padf(mask, e2p, 0) > 0, 0.0, jnp.float32(BIG))

    cb = jnp.concatenate([fbias(ht.face_mask_a), fbias(ht.face_mask_b),
                          ebias(ht.edge_mask_a), ebias(ht.edge_mask_b)
                          ])[:, None]
    cb = jnp.pad(cb, ((0, _round8(cb.shape[0]) - cb.shape[0]), (0, 0)))

    return HullCoef(c16=c16, c32=c32, c88=c88, c48=c48, c80=c80, cb=cb,
                    v3c=ht.verts_a), dm


def cb_offsets(fp: int, e2p: int):
    """(FBIAS_A, FBIAS_B, EBIAS_A, EBIAS_B) row offsets of the sided
    bias column."""
    return 0, fp, 2 * fp, 2 * fp + e2p


def build_hull_coef_multi(state: SimState
                          ) -> Tuple[HullCoef, HullDims, int]:
    """Stack per-ordered-type-pair coefficient tables for the
    multi-type kernel: each HullCoef field gains a leading [H*H] pair
    axis (pair p = ia*H + ib; H = 1 degenerates to today's tables), and
    v3c becomes the per-TYPE ground vertex stack [H*round8(V), 3]
    (+ the per-type vertex-bias/vertex-transpose tables ride separate
    operands built in bucket_hull_contact_table)."""
    h = state.hulls.verts.shape[0]
    coefs = []
    dm = None
    for ia in range(h):
        for ib in range(h):
            c, dm = build_hull_coef(state, ia, ib)
            coefs.append(c)
    stacked = HullCoef(*[
        jnp.stack([getattr(c, f) for c in coefs])
        for f in ("c16", "c32", "c88", "c48", "c80", "cb")
    ] + [None])
    # per-type ground vertex stack (round8 stride so every per-type row
    # slice in the kernel is sublane-aligned)
    vs = _round8(dm.vcap)
    gv = jnp.stack([
        jnp.pad(state.hulls.verts[t], ((0, vs - dm.vcap), (0, 0)))
        for t in range(h)
    ]).reshape(h * vs, 3)
    stacked = stacked._replace(v3c=gv)
    return stacked, dm, h


def _dot(a, b):
    """Exact-f32 matmul (small static-coefficient contractions)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=HIGHEST,
                               preferred_element_type=jnp.float32)


def _first_true(eq):
    """eq [S, L] 0/1 f32 → one-hot of the FIRST true row per column
    (triangular-matmul prefix; exact counts via precision=HIGHEST)."""
    s = eq.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri = (rj < ri).astype(jnp.float32)
    pre = jax.lax.dot_general(tri, eq, (((1,), (0,)), ((), ())),
                              precision=HIGHEST,
                              preferred_element_type=jnp.float32)
    return eq * (pre < 0.5).astype(jnp.float32)


def _argmax2d(x):
    """x [S, L] → (max [L], first-tie one-hot [S, L] f32)."""
    best = jnp.max(x, axis=0)
    oh = _first_true((x == best[None, :]).astype(jnp.float32))
    return best, oh


def _make_hull_kernel(cap, wtot, kk, kg, ccap, n, gh, dm: HullDims,
                      mosaic=True, warm=False, cap2=0, anchors=False,
                      ntypes=1):
    """One grid step = one rank bucket: OBB prefilter → hull SAT →
    top-k emit → vertex ground contacts → compaction (+ warm match).

    Mirrors ops/contact_table._make_ct_kernel's bucket contract exactly
    (output rows, meta columns, warm rows) so the banded solve and the
    table-path plumbing are shared; only the narrow-phase body differs.

    `anchors` (cfg.contact_rebuild > 1) emits the CT2_ROWS table with
    per-contact BODY-FRAME anchors (rows CT_AAX..CT_NLOC, same layout
    and conventions as the box kernel) so the fused solve's anchored
    refresh re-derives point/normal/depth between rebuilds — anchors
    are shape-agnostic (a contact point and normal), which is what lets
    hulls share the solve kernel's refresh math unchanged."""
    f, fp, vcap = dm.f, dm.fp, dm.vcap
    d2p, e, e2p = dm.d2p, dm.e, dm.e2p
    cap_sl = 2 * e                        # clip slots
    ns = cap_sl + 1                       # contact slots incl. edge
    sat_cap = cap2 if cap2 else cap
    sub_pair = kk * (sat_cap // 128)
    sub = sub_pair + kg
    chunk_rows = 4
    # c16 row offsets
    A_FACE = 0
    B_FACE = vcap * fp
    LAX = 2 * vcap * fp
    EAV = LAX + 3 * d2p
    EBV = EAV + vcap * d2p
    (INC_RA, INC_RB, POLY_A, POLY_B, FCNT_A, FCNT_B, FN_A, FN_B,
     OFF_A, OFF_B, _) = _c32_offsets(fp, e)
    SAV, SBV = 0, 9 * vcap
    S0A, S1A, S0B, S1B = 0, e2p, 2 * e2p, 3 * e2p
    FBIAS_A, FBIAS_B, EBIAS_A, EBIAS_B = cb_offsets(fp, e2p)
    vs = _round8(vcap)
    pairs = [(ia, ib) for ia in range(ntypes) for ib in range(ntypes)]

    def kernel(*args):
        (base_ref, la_ref, lb_ref, geom_ref, c16_ref, c32_ref, c88_ref,
         c48_ref, c80_ref, cb_ref, v3_ref, vt_ref, vb_ref, *refs) = args
        if warm:
            prev_ref, out_ref, meta_ref, warm_ref = refs
        else:
            (out_ref, meta_ref), prev_ref, warm_ref = refs, None, None
        b = pl.program_id(0)
        # scalar-prefetched global window base: b·128 single-device, or
        # (bucket0 + b)·128 for this shard's bucket range (row sharding
        # — same contract as the box kernel's)
        start = pl.multiple_of(base_ref[b], 128)

        rows_n = CT2_ROWS if anchors else CT_ROWS

        def _dbg(val):
            out_ref[:] = jnp.zeros((rows_n, ccap), jnp.float32) + val
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            if warm:
                warm_ref[:] = jnp.zeros((8, ccap), jnp.float32)

        win = geom_ref[24:24 + GEOM_ROWS, pl.ds(start, wtot)]
        w_hi, w_lo = _split(win)

        def bgather(oh):
            g1 = jax.lax.dot_general(
                w_hi, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return g1 + jax.lax.dot_general(
                w_lo, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def onehots(lav, lbv):
            c = lav.shape[0]
            row = jax.lax.broadcasted_iota(jnp.int32, (wtot, c), 0)
            return ((row == lav[None, :]).astype(jnp.bfloat16),
                    (row == lbv[None, :]).astype(jnp.bfloat16))

        la = la_ref[0, 0, :]
        lb = lb_ref[0, 0, :]
        oh_a, oh_b = onehots(la, lb)
        ga = bgather(oh_a)
        gb = bgather(oh_b)                            # [24, cap]

        dropped2 = jnp.float32(0.0)
        if cap2:
            # ---- phase 1: shared-OBB face-axis SAT prefilter ----
            # (hull ⊆ its local AABB: center rows 20:23, halves 12:15 of
            # the hull geometry block — see unified_geom hulls mode)
            t = (gb[20] - ga[20], gb[21] - ga[21], gb[22] - ga[22])
            ra = tuple(ga[3 + k2] for k2 in range(9))
            rb = tuple(gb[3 + k2] for k2 in range(9))
            h3a = (ga[12], ga[13], ga[14])
            h3b = (gb[12], gb[13], gb[14])
            cabs = [[jnp.abs(ra[i] * rb[j] + ra[3 + i] * rb[3 + j]
                             + ra[6 + i] * rb[6 + j]) for j in range(3)]
                    for i in range(3)]
            sep_best = None
            for i in range(3):
                ut = ra[i] * t[0] + ra[3 + i] * t[1] + ra[6 + i] * t[2]
                rad = (h3a[i] + h3b[0] * cabs[i][0] + h3b[1] * cabs[i][1]
                       + h3b[2] * cabs[i][2])
                s = jnp.abs(ut) - rad
                sep_best = s if sep_best is None else jnp.maximum(
                    sep_best, s)
            for j in range(3):
                wt = rb[j] * t[0] + rb[3 + j] * t[1] + rb[6 + j] * t[2]
                rad = (h3b[j] + h3a[0] * cabs[0][j] + h3a[1] * cabs[1][j]
                       + h3a[2] * cabs[2][j])
                sep_best = jnp.maximum(sep_best, jnp.abs(wt) - rad)
            mv1 = (ga[17] > 0.0) | (gb[17] > 0.0)
            hull1 = (ga[19] > 0.0) & (gb[19] > 0.0)
            keep = (sep_best < 0.0) & mv1 & hull1 & (la >= 0)
            keepf = keep.astype(jnp.float32)

            # ---- compact surviving (la, lb) into cap2 lanes ----
            # (same machinery as contact_table's compact_pair_lanes)
            if mosaic:
                km = jnp.stack([
                    jax.lax.slice_in_dim(keepf, r * 128, (r + 1) * 128)
                    for r in range(cap // 128)])
                la2 = jnp.stack([
                    jax.lax.slice_in_dim(la.astype(jnp.float32),
                                         r * 128, (r + 1) * 128)
                    for r in range(cap // 128)])
                lb2 = jnp.stack([
                    jax.lax.slice_in_dim(lb.astype(jnp.float32),
                                         r * 128, (r + 1) * 128)
                    for r in range(cap // 128)])
            else:
                km = keepf.reshape(cap // 128, 128)
                la2 = la.astype(jnp.float32).reshape(cap // 128, 128)
                lb2 = lb.astype(jnp.float32).reshape(cap // 128, 128)
            nsub = cap // 128
            slot1 = _exclusive_prefix(km)
            slot1 = slot1 * km + (1.0 - km) * jnp.float32(cap2)
            pay_a = (la2 + 1.0) * km
            pay_b = (lb2 + 1.0) * km
            acc2 = jnp.zeros((2, cap2), jnp.float32)
            ohr = jax.lax.broadcasted_iota(
                jnp.int32, (cap2, chunk_rows * 128), 0)
            for r0 in range(0, nsub, chunk_rows):
                cr = min(chunk_rows, nsub - r0)
                cwr = cr * 128
                sl = slot1[r0:r0 + cr].reshape(1, cwr).astype(jnp.int32)
                oht = (ohr[:, :cwr] == sl).astype(jnp.bfloat16)
                pay = jnp.stack(
                    [pay_a[r0:r0 + cr].reshape(1, cwr)[0],
                     pay_b[r0:r0 + cr].reshape(1, cwr)[0]])
                p_hi, p_lo = _split(pay)
                acc2 += jax.lax.dot_general(
                    p_hi, oht, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc2 += jax.lax.dot_general(
                    p_lo, oht, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dropped2 = jnp.maximum(jnp.sum(km) - jnp.float32(cap2), 0.0)
            la = acc2[0].astype(jnp.int32) - 1
            lb = acc2[1].astype(jnp.int32) - 1
            oh_a, oh_b = onehots(la, lb)
            ga = bgather(oh_a)
            gb = bgather(oh_b)                        # [24, cap2]

        p2 = la.shape[0]
        valid = (la >= 0) & ((ga[17] > 0.0) | (gb[17] > 0.0)) \
            & (ga[19] > 0.0) & (gb[19] > 0.0)
        if _HT_DBG == 1:
            _dbg(jnp.sum(valid.astype(jnp.float32)))
            return

        # ---- m_ext = [M = RaT·Rb | dpa | dpb | 1] ----
        ra = tuple(ga[3 + k2] for k2 in range(9))
        rb = tuple(gb[3 + k2] for k2 in range(9))
        m9 = [ra[3 * 0 + i] * rb[3 * 0 + j]
              + ra[3 * 1 + i] * rb[3 * 1 + j]
              + ra[3 * 2 + i] * rb[3 * 2 + j]
              for i in range(3) for j in range(3)]
        dp = (gb[0] - ga[0], gb[1] - ga[1], gb[2] - ga[2])
        dpa = tuple(ra[0 + i] * dp[0] + ra[3 + i] * dp[1]
                    + ra[6 + i] * dp[2] for i in range(3))
        dpb = tuple(-(rb[0 + i] * dp[0] + rb[3 + i] * dp[1]
                      + rb[6 + i] * dp[2]) for i in range(3))
        mext = jnp.stack(list(m9) + list(dpa) + list(dpb)
                         + [jnp.ones((p2,), jnp.float32)])   # [16, P]

        def sat_pass(p_i):
            # one type pair's SAT / clip / edge narrow phase over ALL
            # candidate lanes (lanes of other pairs produce finite
            # garbage that the per-lane pair masks discard below);
            # cpXX are this pair's static coefficient tables
            cp16 = c16_ref[p_i]
            cp32 = c32_ref[p_i]
            cp88 = c88_ref[p_i]
            cp48 = c48_ref[p_i]
            cp80 = c80_ref[p_i]
            cpb = cb_ref[p_i]
            # ---- face separations: chunked coef matmuls + vertex-min ----
            def face_sep(base):
                acc = None
                for v0 in range(0, vcap, 8):
                    sv = _dot(cp16[base + v0 * fp:base + (v0 + 8) * fp, :],
                              mext)                       # [8·FP, P]
                    for j in range(8):
                        s = sv[j * fp:(j + 1) * fp]
                        acc = s if acc is None else jnp.minimum(acc, s)
                return acc                                # [FP, P]

            sep_a = face_sep(A_FACE)
            sep_b = face_sep(B_FACE)
            if _HT_DBG == 2:
                _dbg(jnp.sum(sep_a) + jnp.sum(sep_b))
                return

            # ---- edge axes ----
            axes = _dot(cp16[LAX:LAX + 3 * d2p, :], mext)     # [3·D2P, P]
            ax0, ax1 = axes[0:d2p], axes[d2p:2 * d2p]
            ax2c = axes[2 * d2p:3 * d2p]
            ax_sq = ax0 * ax0 + ax1 * ax1 + ax2c * ax2c
            alen = jnp.sqrt(jnp.maximum(ax_sq, 1e-18))
            t_ax = -(ax0 * dpa[0][None, :] + ax1 * dpa[1][None, :]
                     + ax2c * dpa[2][None, :])            # [D2P, P]

            def edge_minmax(base):
                mn = mx = None
                for v0 in range(0, vcap, 8):
                    sv = _dot(
                        cp16[base + v0 * d2p:base + (v0 + 8) * d2p, :],
                        mext)                             # [8·D2P, P]
                    for j in range(8):
                        s = sv[j * d2p:(j + 1) * d2p]
                        mn = s if mn is None else jnp.minimum(mn, s)
                        mx = s if mx is None else jnp.maximum(mx, s)
                return mn, mx

            min_a, max_a = edge_minmax(EAV)
            min_b, max_b = edge_minmax(EBV)
            flip = t_ax < 0.0
            sep_num = jnp.where(flip, min_b - max_a - t_ax,
                                min_a - max_b + t_ax)
            ax_ok = alen > 1e-6
            sep_e = jnp.where(ax_ok, sep_num / alen, -jnp.float32(BIG))
            if _HT_DBG == 3:
                _dbg(jnp.sum(sep_e * (jnp.abs(sep_e) < BIG)))
                return

            # ---- axis choice (policy of hullhull_batched) ----
            sep_faces = jnp.concatenate([sep_a, sep_b], axis=0)  # [2FP, P]
            face_sep_v, oh_bf = _argmax2d(sep_faces)
            edge_sep, oh_e = _argmax2d(sep_e)
            separated = jnp.maximum(face_sep_v, edge_sep) > 0.0
            edge_wins = (~separated) & (
                edge_sep > face_sep_v + 1e-4 + 0.05 * jnp.abs(face_sep_v))
            ref_is_a = jnp.sum(oh_bf[:fp], axis=0) > 0.5         # [P]
            oh_ref = oh_bf[:fp] + oh_bf[fp:]                     # [FP, P]

            # ---- incident face: most anti-parallel on the OTHER hull ----
            def align(base):
                ce = _dot(cp32[base:base + 9 * fp, :], oh_ref)
                al = None
                for k2 in range(9):
                    term = ce[k2 * fp:(k2 + 1) * fp] * m9[k2][None, :]
                    al = term if al is None else al + term
                return al                                 # [FP, P]

            raf = ref_is_a.astype(jnp.float32)[None, :]
            fb = (cpb[FBIAS_A:FBIAS_A + fp, 0:1] * (1.0 - raf)
                  + cpb[FBIAS_B:FBIAS_B + fp, 0:1] * raf)
            al = align(INC_RA) * raf + align(INC_RB) * (1.0 - raf) + fb
            _, oh_inc = _argmax2d(-al)
            if _HT_DBG == 4:
                _dbg(jnp.sum(oh_inc) + jnp.sum(oh_ref))
                return

            # ---- face polygons (owner frame) + world transforms ----
            polyA = cp32[POLY_A:POLY_A + 3 * e, :]
            polyB = cp32[POLY_B:POLY_B + 3 * e, :]
            # the reference face lives on A or B per lane; the incident face
            # on the OTHER hull — sided tables, lane-selected by raf
            refL = (_dot(polyA, oh_ref) * raf
                    + _dot(polyB, oh_ref) * (1.0 - raf))
            incL = (_dot(polyB, oh_inc) * raf
                    + _dot(polyA, oh_inc) * (1.0 - raf))
            ref_cnt = (_dot(cp32[FCNT_A:FCNT_A + 1, :], oh_ref)[0] * raf[0]
                       + _dot(cp32[FCNT_B:FCNT_B + 1, :], oh_ref)[0]
                       * (1.0 - raf[0]))
            inc_cnt = (_dot(cp32[FCNT_B:FCNT_B + 1, :], oh_inc)[0] * raf[0]
                       + _dot(cp32[FCNT_A:FCNT_A + 1, :], oh_inc)[0]
                       * (1.0 - raf[0]))
            ref_cnt_i = ref_cnt.astype(jnp.int32)

            r_ref = tuple(jnp.where(ref_is_a, ra[k2], rb[k2])
                          for k2 in range(9))
            r_inc = tuple(jnp.where(ref_is_a, rb[k2], ra[k2])
                          for k2 in range(9))
            pa3 = (ga[0], ga[1], ga[2])
            pb3 = (gb[0], gb[1], gb[2])
            p_ref = v3.where(ref_is_a, pa3, pb3)
            p_inc = v3.where(ref_is_a, pb3, pa3)

            def to_world(loc, r, tvec):
                out = []
                for k2 in range(e):
                    x, y, z = loc[k2], loc[e + k2], loc[2 * e + k2]
                    out.append((
                        r[0] * x + r[1] * y + r[2] * z + tvec[0],
                        r[3] * x + r[4] * y + r[5] * z + tvec[1],
                        r[6] * x + r[7] * y + r[8] * z + tvec[2]))
                return out

            ref_w = to_world(refL, r_ref, p_ref)
            inc_w = to_world(incL, r_inc, p_inc)

            nloc_a = _dot(cp32[FN_A:FN_A + 3, :], oh_ref)
            nloc_b = _dot(cp32[FN_B:FN_B + 3, :], oh_ref)
            nloc = nloc_a * raf + nloc_b * (1.0 - raf)    # [3, P] owner frame
            n_ref = v3.mat_vec(r_ref, (nloc[0], nloc[1], nloc[2]))
            off_sel = (_dot(cp32[OFF_A:OFF_A + 1, :], oh_ref)[0] * raf[0]
                       + _dot(cp32[OFF_B:OFF_B + 1, :], oh_ref)[0]
                       * (1.0 - raf[0]))
            off_ref = off_sel + v3.dot(n_ref, p_ref)

            # ---- 2-D clip in the reference-face frame ----
            edge0 = v3.sub(ref_w[1], ref_w[0])
            t1 = v3.scale(edge0, 1.0 / jnp.maximum(v3.norm(edge0), 1e-9))
            t2 = v3.cross(n_ref, t1)
            p0 = ref_w[0]
            ru, rv = [], []
            for k2 in range(e):
                rel = v3.sub(ref_w[k2], p0)
                ru.append(v3.dot(rel, t1))
                rv.append(v3.dot(rel, t2))
            iu_l, iv_l, is_l = [], [], []
            for k2 in range(e):
                q = inc_w[k2]
                rel = v3.sub(q, p0)
                iu_l.append(v3.dot(rel, t1))
                iv_l.append(v3.dot(rel, t2))
                is_l.append(v3.dot(q, n_ref) - off_ref)
            zero_p = jnp.zeros((p2,), jnp.float32)
            pu = jnp.stack(iu_l + [zero_p] * e)           # [2E, P]
            pv = jnp.stack(iv_l + [zero_p] * e)
            ps = jnp.stack(is_l + [zero_p] * e)
            m_cnt = inc_cnt.astype(jnp.int32)
            for k2 in range(e):
                if k2 + 1 < e:
                    wrapped = (k2 + 1) == ref_cnt_i
                    ru_n = jnp.where(wrapped, ru[0], ru[k2 + 1])
                    rv_n = jnp.where(wrapped, rv[0], rv[k2 + 1])
                else:
                    ru_n, rv_n = ru[0], rv[0]
                e_u = ru_n - ru[k2]
                e_v = rv_n - rv[k2]
                on = (k2 < ref_cnt_i).astype(jnp.float32)
                cu = e_v * on
                cv = -e_u * on
                dclip = ((e_v * ru[k2] - e_u * rv[k2]) * on
                         + (1.0 - on) * jnp.float32(BIG))
                pu, pv, ps, m_cnt = _clip(pu, pv, ps, m_cnt, cu, cv, dclip,
                                          mosaic=mosaic)

            n_face = v3.where(ref_is_a, v3.neg(n_ref), n_ref)    # B → A
            if _HT_DBG == 5:
                _dbg(jnp.sum(ps) + jnp.sum(pu) + jnp.sum(pv)
                     + jnp.sum(m_cnt.astype(jnp.float32)))
                return

            # ---- edge-edge closest-point contact ----
            ohe_f = oh_e
            ax_sel = (jnp.sum(ohe_f * ax0, axis=0),
                      jnp.sum(ohe_f * ax1, axis=0),
                      jnp.sum(ohe_f * ax2c, axis=0))
            alen_sel = jnp.sum(ohe_f * alen, axis=0)
            flip_sel = jnp.sum(ohe_f * flip.astype(jnp.float32), axis=0) > 0.5
            sgn = jnp.where(flip_sel, -1.0, 1.0)
            ax_u = v3.scale(ax_sel, sgn / jnp.maximum(alen_sel, 1e-9))
            n_edge = v3.mat_vec(ra, ax_u)

            def sel_support(base):
                ce = _dot(cp88[base:base + 9 * vcap, :], ohe_f)
                acc = None
                for k2 in range(9):
                    term = ce[k2 * vcap:(k2 + 1) * vcap] * m9[k2][None, :]
                    acc = term if acc is None else acc + term
                return acc                                # [V, P]

            sa_sel = sel_support(SAV) * sgn[None, :]
            sb_sel = sel_support(SBV) * sgn[None, :]
            sa0 = _dot(cp48[S0A:S0A + e2p, :], sa_sel)
            sa1 = _dot(cp48[S1A:S1A + e2p, :], sa_sel)    # [E2P, P]
            sb0 = _dot(cp48[S0B:S0B + e2p, :], sb_sel)
            sb1 = _dot(cp48[S1B:S1B + e2p, :], sb_sel)
            score_a = (jnp.maximum(sa0, sa1)
                       + cpb[EBIAS_A:EBIAS_A + e2p, 0:1])
            score_b = (jnp.minimum(sb0, sb1)
                       - cpb[EBIAS_B:EBIAS_B + e2p, 0:1])
            _, oh_ea = _argmax2d(-score_a)
            _, oh_eb = _argmax2d(score_b)
            epa = _dot(cp80[0:6, :], oh_ea)            # [6, P] v0|v1 local A
            epb = _dot(cp80[6:12, :], oh_eb)           # [6, P] v0|v1 local B
            ea0 = v3.add(v3.mat_vec(ra, (epa[0], epa[1], epa[2])), pa3)
            ea1 = v3.add(v3.mat_vec(ra, (epa[3], epa[4], epa[5])), pa3)
            eb0 = v3.add(v3.mat_vec(rb, (epb[0], epb[1], epb[2])), pb3)
            eb1 = v3.add(v3.mat_vec(rb, (epb[3], epb[4], epb[5])), pb3)
            d1 = v3.sub(ea1, ea0)
            d2v = v3.sub(eb1, eb0)
            r0v = v3.sub(ea0, eb0)
            a11 = v3.dot(d1, d1)
            a22 = v3.dot(d2v, d2v)
            a12 = v3.dot(d1, d2v)
            b1 = v3.dot(d1, r0v)
            b2 = v3.dot(d2v, r0v)
            den = a11 * a22 - a12 * a12
            sparm = jnp.where(jnp.abs(den) > 1e-9,
                              (a12 * b2 - a22 * b1) / den, 0.0)
            sparm = jnp.clip(sparm, 0.0, 1.0)
            tparm = jnp.where(a22 > 1e-9, (b2 + a12 * sparm) / a22, 0.0)
            tparm = jnp.clip(tparm, 0.0, 1.0)
            sparm = jnp.where(a11 > 1e-9,
                              jnp.clip((a12 * tparm - b1) / a11, 0.0, 1.0),
                              sparm)
            pa_c = v3.add(ea0, v3.scale(d1, sparm))
            pb_c = v3.add(eb0, v3.scale(d2v, tparm))
            edge_point = v3.scale(v3.add(pa_c, pb_c), 0.5)
            edge_depth = -edge_sep
            if _HT_DBG == 6:
                _dbg(jnp.sum(edge_point[0]) + jnp.sum(edge_depth))
                return

            return (ps, pu, pv, m_cnt.astype(jnp.float32),
                    n_face, (p0[0], p0[1], p0[2]), t1, t2, n_ref,
                    separated.astype(jnp.float32),
                    edge_wins.astype(jnp.float32),
                    edge_point, edge_depth, n_edge)

        if 2 <= _HT_DBG <= 6:
            sat_pass(0)          # writes the dbg outputs and bails
            return
        if len(pairs) == 1:
            (ps, pu, pv, m_cnt_f, n_face, p0, t1, t2, n_ref, sep_f,
             ew_f, edge_point, edge_depth, n_edge) = sat_pass(0)
        else:
            # per-lane ordered-type-pair masks: row 19 of the geometry
            # block carries is_hull*(1 + type)
            ta = ga[19] - 1.0
            tb = gb[19] - 1.0
            outs = [sat_pass(p_i) for p_i in range(len(pairs))]
            masks = [
                ((jnp.abs(ta - ia_t) < 0.5)
                 & (jnp.abs(tb - ib_t) < 0.5)).astype(jnp.float32)
                for (ia_t, ib_t) in pairs
            ]

            def sel(j):
                acc = None
                for mq, o in zip(masks, outs):
                    v = o[j]
                    if isinstance(v, tuple):
                        contrib = tuple(c * mq for c in v)
                        acc = (contrib if acc is None else
                               tuple(x + y for x, y in zip(acc, contrib)))
                    else:
                        mm = mq if v.ndim == 1 else mq[None, :]
                        acc = v * mm if acc is None else acc + v * mm
                return acc

            (ps, pu, pv, m_cnt_f, n_face, p0, t1, t2, n_ref, sep_f,
             ew_f, edge_point, edge_depth, n_edge) = (
                sel(j) for j in range(14))
        m_cnt = m_cnt_f.astype(jnp.int32)
        separated = sep_f > 0.5
        edge_wins = ew_f > 0.5
        zero_p = jnp.zeros((p2,), jnp.float32)

        # ---- slot scores + top-k emit ----
        face_ok = valid & (~separated) & (~edge_wins)
        big_neg = jnp.float32(-BIG)
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (cap_sl, p2), 0)
        d_rows = -ps                                   # [2E, P]
        ok_rows = ((slot_iota < m_cnt[None, :]) & (d_rows > 0.0)
                   & face_ok[None, :])
        score = [jnp.where(ok_rows[s2], d_rows[s2], big_neg)
                 for s2 in range(cap_sl)]
        edge_ok = valid & edge_wins & (edge_depth > 0.0)
        score.append(jnp.where(edge_ok, edge_depth, big_neg))

        mu_p = jnp.sqrt(ga[15] * gb[15])
        rest_p = jnp.maximum(ga[16], gb[16])
        ia = ga[18].astype(jnp.int32)
        ib = gb[18].astype(jnp.int32)
        # component-form key rows (ops/contact_table.py CT_K* comment):
        # exact in f32 at any n ≤ 2^16, vs int32 overflow for the packed
        # (mn·n + mx)·ns form at large n
        kl_p = jnp.maximum(ia, ib).astype(jnp.float32)
        kh_p = jnp.minimum(ia, ib).astype(jnp.float32)
        live = (la >= 0).astype(jnp.float32)
        ra_p = (start + la).astype(jnp.float32) * live
        rb1_p = (start + lb + 1).astype(jnp.float32) * live

        pu_rows = [pu[s2] for s2 in range(cap_sl)] + [zero_p]
        pv_rows = [pv[s2] for s2 in range(cap_sl)] + [zero_p]
        ps_rows = [ps[s2] for s2 in range(cap_sl)] + [zero_p]

        rows = [[] for _ in range(rows_n)]

        def emit(ptx, pty, ptz, nx, ny, nz, d, act, mu, rest,
                 kl, kh, ksgn, ra_r, rb1_r, ks, anc=None):
            af = act.astype(jnp.float32)
            vals = [
                ptx, pty, ptz, nx, ny, nz, d, mu, rest, af,
                kl * af, kh * af, ksgn * af, ra_r * af, rb1_r * af,
                ks * af,
            ]
            if anchors:
                # anc = 9 anchor rows (a_loc, b_loc-or-world, n_loc) —
                # identical layout to the box kernel's CT_AAX..CT_NLOC
                vals += [v * af for v in anc]
                vals += [jnp.zeros_like(af)] * (CT2_ROWS - 25)
            for r, vq in enumerate(vals):
                if not mosaic:
                    rows[r].append(vq)
                    continue
                for j in range(vq.shape[0] // 128):
                    rows[r].append(
                        jax.lax.slice_in_dim(vq, j * 128, (j + 1) * 128))

        def t_apply(r9t, w):
            # Rᵀ·w for a row-major 9-tuple R
            return (r9t[0] * w[0] + r9t[3] * w[1] + r9t[6] * w[2],
                    r9t[1] * w[0] + r9t[4] * w[1] + r9t[7] * w[2],
                    r9t[2] * w[0] + r9t[5] * w[1] + r9t[8] * w[2])

        def argmax_list(vals):
            best = vals[0]
            idx = jnp.zeros_like(vals[0], dtype=jnp.int32)
            for k2 in range(1, len(vals)):
                take = vals[k2] > best
                best = jnp.where(take, vals[k2], best)
                idx = jnp.where(take, jnp.int32(k2), idx)
            return best, idx

        def select_list(idx, items):
            out = items[0]
            for k2 in range(1, len(items)):
                out = jnp.where(idx == jnp.int32(k2), items[k2], out)
            return out

        for _ in range(kk):
            best, bidx = argmax_list(score)
            act = best > 0.0
            is_edge = bidx == jnp.int32(cap_sl)
            u_sel = select_list(bidx, pu_rows)
            v_sel = select_list(bidx, pv_rows)
            s_sel = select_list(bidx, ps_rows)
            ptx = jnp.where(is_edge, edge_point[0],
                            p0[0] + u_sel * t1[0] + v_sel * t2[0]
                            + s_sel * n_ref[0])
            pty = jnp.where(is_edge, edge_point[1],
                            p0[1] + u_sel * t1[1] + v_sel * t2[1]
                            + s_sel * n_ref[1])
            ptz = jnp.where(is_edge, edge_point[2],
                            p0[2] + u_sel * t1[2] + v_sel * t2[2]
                            + s_sel * n_ref[2])
            nx = jnp.where(is_edge, n_edge[0], n_face[0])
            ny = jnp.where(is_edge, n_edge[1], n_face[1])
            nz = jnp.where(is_edge, n_edge[2], n_face[2])
            ks = bidx.astype(jnp.float32)                  # slot < ns
            anc = None
            if anchors:
                a_loc = t_apply(ra, (ptx - ga[0], pty - ga[1],
                                     ptz - ga[2]))
                b_loc = t_apply(rb, (ptx - gb[0], pty - gb[1],
                                     ptz - gb[2]))
                n_loc = t_apply(ra, (nx, ny, nz))
                anc = list(a_loc) + list(b_loc) + list(n_loc)
            emit(ptx, pty, ptz, nx, ny, nz,
                 jnp.where(act, best, 0.0), act, mu_p, rest_p,
                 kl_p, kh_p, jnp.zeros_like(kl_p), ra_p, rb1_p, ks,
                 anc=anc)
            score = [jnp.where(bidx == jnp.int32(s2), big_neg, score[s2])
                     for s2 in range(ns)]

        if _HT_DBG == 7:
            _dbg(sum(jnp.sum(r) for rr in rows for r in rr))
            return

        # ---- vertex ground contacts for the bucket's own 128 ranks ----
        if kg > 0:
            gl = win[:, 0:BLOCK]                      # [24, 128]
            ry3 = jnp.stack([gl[6], gl[7], gl[8]])    # R row 1 (world y)
            # per-TYPE vertex tables, lane-selected by the body's type
            # (row 19 = is_hull*(1 + type)); single-type degenerates to
            # one masked pass
            typef = gl[19]
            tmasks = [
                (jnp.abs(typef - (t + 1.0)) < 0.5
                 ).astype(jnp.float32)[None, :]       # [1, 128]
                for t in range(ntypes)
            ]
            wy = None
            vbl = None
            for t in range(ntypes):
                wy_t = _dot(v3_ref[t * vs:t * vs + vcap, :], ry3)
                vb_t = vb_ref[t * vs:t * vs + vcap, 0:1]    # [V, 1]
                cw = wy_t * tmasks[t]
                cv = vb_t * tmasks[t]
                wy = cw if wy is None else wy + cw
                vbl = cv if vbl is None else vbl + cv
            wy = wy + gl[1][None, :]                  # [V, 128]
            depth_g = jnp.float32(gh) - wy
            mvg = (gl[17] > 0.0)[None, :]
            gsc = jnp.where(mvg & (depth_g > 0.0), depth_g + vbl,
                            jnp.float32(-BIG))
            body_id = gl[18].astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)[0]
            ra_g = (start + lane).astype(jnp.float32)
            one_g = jnp.ones((BLOCK,), jnp.float32)
            # vertex index of the selected one-hot via a [1, V] iota
            # matmul — a float ADD sublane-reduction here is rejected by
            # Mosaic because ohg inherits a nonzero sublane offset from
            # the gl[1] row slice upstream
            virow = jax.lax.broadcasted_iota(
                jnp.int32, (1, vcap), 1).astype(jnp.float32)
            for _ in range(kg):
                bestg, ohg = _argmax2d(gsc)
                act = bestg > 0.0
                lsel = None
                for t in range(ntypes):
                    ls_t = _dot(vt_ref[t * 8:t * 8 + 3, :], ohg)
                    cl = ls_t * tmasks[t]
                    lsel = cl if lsel is None else lsel + cl
                lx, ly, lz = lsel[0], lsel[1], lsel[2]
                cx = gl[0] + gl[3] * lx + gl[4] * ly + gl[5] * lz
                cy = gl[1] + gl[6] * lx + gl[7] * ly + gl[8] * lz
                cz = gl[2] + gl[9] * lx + gl[10] * ly + gl[11] * lz
                vidx = _dot(virow, ohg)[0]                 # vertex < vcap
                anc = None
                if anchors:
                    # ground: a's anchor IS the local hull vertex; no
                    # body B, so the B slot carries the WORLD point;
                    # n_loc = Rᵀ·ŷ = R's middle row (box convention)
                    anc = [lx, ly, lz, cx, cy, cz,
                           gl[6], gl[7], gl[8]]
                emit(cx, cy, cz,
                     jnp.zeros_like(one_g), one_g, jnp.zeros_like(one_g),
                     jnp.where(act, bestg, 0.0), act, gl[15], gl[16],
                     body_id.astype(jnp.float32), jnp.zeros_like(one_g),
                     one_g, ra_g, jnp.zeros_like(one_g), vidx, anc=anc)
                gsc = jnp.where(ohg > 0.5, jnp.float32(-BIG), gsc)

        if mosaic:
            pay2 = [jnp.stack(r) for r in rows]       # 16 × [sub, 128]
        else:
            pay2 = [jnp.concatenate(r).reshape(sub, 128) for r in rows]

        # ---- per-bucket compaction (order-preserving) ----
        mask = pay2[CT_ACT]
        slot = _exclusive_prefix(mask)
        slot = slot * mask + (1.0 - mask) * jnp.float32(ccap)
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
                 for r in range(rows_n)])
            p_hi, p_lo = _split(pay)
            acc += jax.lax.dot_general(
                p_hi, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                p_lo, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

        if warm:
            ck = (acc[CT_KL]
                  + 65536.0 * (2.0 * acc[CT_KS] + acc[CT_KSGN])
                  + 2.0 * (acc[CT_ACT] - 1.0)).reshape(1, ccap)
            ch = acc[CT_KH].reshape(1, ccap)
            lam0 = jnp.zeros((3, ccap), jnp.float32)
            for r0 in range(0, ccap, 128):
                pk = prev_ref[r0:r0 + 128, 0:1]
                ph = prev_ref[r0:r0 + 128, 1:2]
                eq = ((jnp.abs(pk - ck) < 0.5)
                      & (jnp.abs(ph - ch) < 0.5))
                eq_bf = eq.astype(jnp.bfloat16)
                plam = prev_ref[r0:r0 + 128, 4:7]
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

        n_act = jnp.sum(mask)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        at00 = ((r_i == 0) & (c_i == 0)).astype(jnp.float32)
        at01 = ((r_i == 0) & (c_i == 1)).astype(jnp.float32)
        at02 = ((r_i == 0) & (c_i == 2)).astype(jnp.float32)
        dropped = jnp.maximum(n_act - jnp.float32(ccap), 0.0)
        meta_ref[:] = at00 * dropped + at01 * n_act + at02 * dropped2

    return kernel


def hull_slots(hulls) -> int:
    """Contact slots per pair (2E face-clip slots + 1 edge) — the key
    stride, shared with ops/narrowphase._pair_contacts_hulls_fast."""
    return 2 * hulls.face_verts.shape[2] + 1


def bucket_hull_contact_table(
    state: SimState,
    cand: PairCandidates,
    cfg: SimConfig,
    order: Array | None,
    prev: Tuple[Array, Array] | None = None,
    geom: Array | None = None,
    buckets: Tuple[Array, int] | None = None,
) -> Tuple[Array, Array, Array | None]:
    """Run the fused hull kernel. Same contract as
    ops/contact_table.bucket_contact_table: returns (table
    [CT_ROWS, NB·ccap], meta [8, NB·128] — cols 0/1/2 = dropped contacts /
    active count / prefilter survivors dropped beyond bucket_cap2, warm
    [8, NB·ccap] | None). Requires the unified hull geometry table
    (ops/contact_table.unified_geom hulls mode, rows 24:48: pos | world R |
    OBB half | friction | restitution | movable·is_hull | id | is_hull |
    OBB center).

    `buckets = (bucket0, nb_local)` restricts the kernel to the
    `nb_local` buckets starting at traced scalar `bucket0` (row-sharded
    steps) — the caller passes bucket-local candidate/prev slices and
    all-gathers the local tables, exactly the box-table contract."""
    n = state.num_bodies
    assert n <= (1 << 16), "hull_table: body ids exceed exact-f32 range"
    assert state.hulls.verts.shape[0] <= MAX_TABLE_HULL_TYPES, (
        "hull_table supports at most MAX_TABLE_HULL_TYPES hull types "
        "(H^2 SAT passes) — larger libraries use the XLA fast path")
    block, cap, nb_cand = bucket_shape(n, cfg)
    if block != BLOCK:
        raise ValueError(
            f"hull_table requires bucket_block == {BLOCK} (got {block})")
    nb, ccap, cp = table_shape(n, cfg)
    assert nb == nb_cand, (nb, nb_cand)
    dm = hull_dims(state.hulls)
    kk = min(cfg.max_contacts_per_pair, 2 * dm.e + 1)
    kg = (min(cfg.max_contacts_per_pair, 8, dm.vcap)
          if cfg.ground_plane else 0)
    # slot ids ride the component-form keys (< 2^24-exact ck compound)
    assert 2 * dm.e + 1 <= _KS_LIMIT and dm.vcap <= _KS_LIMIT, (
        "hull_table: slot/vertex ids exceed the key slot-row range")
    wtot, npad = geom_pad(n, cfg)
    assert geom is not None and geom.shape == (48, npad), (
        "hull_table consumes the unified hull geometry table")

    coef, _, ntypes = build_hull_coef_multi(state)
    vs = _round8(dm.vcap)
    # per-type ground vertex-transpose ([H*8, V]: rows t*8..t*8+3) and
    # vertex-validity bias ([H*vs, 1]) tables
    vt = jnp.pad(jnp.transpose(state.hulls.verts, (0, 2, 1)),
                 ((0, 0), (0, 5), (0, 0))).reshape(ntypes * 8, dm.vcap)
    vb = jnp.where(
        jnp.arange(vs)[None, :] < state.hulls.vert_count[:, None],
        0.0, -jnp.float32(BIG)).reshape(ntypes * vs, 1)

    # local bucket range (row sharding): nb_l buckets starting at the
    # traced bucket0; single-device = the full static range
    if buckets is not None:
        bucket0, nb_l = buckets
        bucket_idx = bucket0 + jnp.arange(nb_l, dtype=jnp.int32)
    else:
        nb_l = nb
        bucket_idx = jnp.arange(nb, dtype=jnp.int32)
    cp_l = nb_l * ccap
    bases = bucket_idx * BLOCK                             # [nb_l] int32

    p = cand.rank_a.shape[0]
    assert p == nb_l * cap, (p, nb_l, cap)
    base_per = jnp.repeat(bases, cap)
    la = jnp.where(cand.mask, cand.rank_a - base_per, -1)
    lb = jnp.where(cand.mask, cand.rank_b - base_per, -1)
    la3 = jnp.broadcast_to(la.reshape(nb_l, 1, cap), (nb_l, 8, cap))
    lb3 = jnp.broadcast_to(lb.reshape(nb_l, 1, cap), (nb_l, 8, cap))

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
            cap2 = 0

    interpret = jax.default_backend() != "tpu"
    anchors = cfg.contact_rebuild > 1
    rows_n = CT2_ROWS if anchors else CT_ROWS
    kernel = _make_hull_kernel(
        cap, wtot, kk, kg, ccap, n, cfg.ground_height, dm,
        mosaic=not interpret, warm=prev is not None, cap2=cap2,
        anchors=anchors, ntypes=ntypes)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8, cap), lambda b, bs: (b, 0, 0)),
        pl.BlockSpec((1, 8, cap), lambda b, bs: (b, 0, 0)),
        const_spec,                                   # geom
        const_spec, const_spec, const_spec, const_spec,  # c16/c32/c88/c48
        const_spec, const_spec, const_spec,           # c80/cb/v3c(gv)
        const_spec, const_spec,                       # vt/vb (per type)
    ]
    out_specs = [
        pl.BlockSpec((rows_n, ccap), lambda b, bs: (0, b)),
        pl.BlockSpec((8, 128), lambda b, bs: (0, b)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows_n, cp_l), jnp.float32),
        jax.ShapeDtypeStruct((8, nb_l * 128), jnp.float32),
    ]
    operands = [la3, lb3, geom, coef.c16, coef.c32, coef.c88, coef.c48,
                coef.c80, coef.cb, coef.v3c, vt, vb]
    if prev is not None:
        pkey, plam = prev
        pcols = prev_key_cols(pkey, plam)             # [cp_l, 8]
        assert pcols.shape[0] == cp_l, (pcols.shape, cp_l)
        in_specs.append(pl.BlockSpec((ccap, 8), lambda b, bs: (b, 0)))
        out_specs.append(pl.BlockSpec((8, ccap), lambda b, bs: (0, b)))
        out_shape.append(jax.ShapeDtypeStruct((8, cp_l), jnp.float32))
        operands.append(pcols)
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
    )(bases, *operands)
    if prev is not None:
        out, meta, warm_rows = res
        return out, meta, warm_rows
    out, meta = res
    return out, meta, None
