"""Fused banded contact solve: the whole projected-Jacobi sweep loop as ONE
Pallas TPU kernel.

Motivation (docs/PERFORMANCE.md): in the XLA solver every Jacobi sweep pays
two HBM lane gathers and one lane scatter at ~4-7 ns/index — ~8 ms of the
4k-pile step. This kernel keeps the packed velocity table ("z", real +
split-impulse pseudo velocities) resident in VMEM across ALL sweeps and
turns each gather/scatter into banded one-hot MXU matmuls, which is
possible because the sweep broad phase guarantees a band structure: pair
candidates are (rank i, rank i+d), d ≤ sweep_window, in AABB-min-x sorted
body order (ops/broadphase.py sweep_candidates). Measured on the settled
4k pile: max rank distance 44, per-1024-contact-tile body span ≤ 244 — a
static 512-wide window per tile covers everything.

Layout/precision notes (all v5e trace-measured, see
experiments/pallas_fused_sweep.py):
  * one-hot matrices are built in-kernel by iota-compare (never touch HBM)
    in bf16; gathered/scattered payloads are split hi/lo into two bf16
    matmuls accumulated in f32 — exact to ~2⁻¹⁹ relative (the MXU's f32
    mode via precision=HIGHEST costs ~5×; full-f32 semantics are not
    needed inside a fixed-point iteration).
  * Jacobi semantics are preserved exactly: each sweep reads a snapshot
    (tab_read) taken at tile 0 while deltas accumulate into tab_acc, so
    tile ordering does not leak into the math (matches the XLA solver up
    to f32 summation order).
  * the warm-start impulse application (XLA path: one extra lane scatter)
    rides the kernel as sweep 0.

Out-of-window safety: contacts whose endpoints do not fit their tile's
window are deactivated (zero one-hot column — they contribute nothing and
read zeros) and counted into the `band_overflow` metric — never silently
dropped (SURVEY.md §7 design stance). With broadphase='sweep' and
pallas_window ≥ tile span + sweep_window this is provably zero; a
ValueError guards non-sweep broad phases.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.config import SimConfig
from physics_tpu.maths import vec3c as v3
from physics_tpu.ops.narrowphase import Contacts
from physics_tpu.solver.contacts import (
    _field_gather,
    warm_start_lambda,
)
from physics_tpu.state import SimState

Array = jnp.ndarray

# consts table row indices ([R_CONST, C] f32, tile-blocked into the kernel)
_R_RA = 0        # 0:3   r_a
_R_RB = 3        # 3:6   r_b
_R_N = 6         # 6:9   normal
_R_T1 = 9        # 9:12  tangent 1
_R_T2 = 12       # 12:15 tangent 2
_R_IKN = 15      # 1/k_n
_R_IKT1 = 16
_R_IKT2 = 17
_R_VTGT = 18     # velocity-solve target (restitution / Baumgarte)
_R_BIAS = 19     # position-solve bias velocity
_R_FRIC = 20
_R_RELAX = 21    # relaxation * activity
_R_IMA = 22      # inv_mass_a * act
_R_IMB = 23
_R_IWA = 24      # 24:33 world inv inertia a (row major), * act
_R_IWB = 33      # 33:42 world inv inertia b
_R_LAM0 = 42     # 42:45 warm-start (λn, λt1, λt2), pre-masked
R_CONST = 48     # padded to a multiple of 8 sublanes

# z table rows: 0:3 vel | 3:6 omega | 8:11 pseudo vel | 11:14 pseudo omega
Z_ROWS = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split(x):
    """hi/lo bf16 split: x == hi + lo to ~19 significant bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _sweep_tile_math(win, la, lb, cs, lam4, *, tile, wtot,
                     vel_on, pos_on, is_warm_f, degf, oh=None,
                     lowp=False):
    """One Jacobi sweep over one contact tile — the shared math of the
    fused multi-sweep kernel and the single-sweep (sharded) kernel.

    `win` is the [16, WTOT] snapshot of the z table; `vel_on`/`pos_on`/
    `is_warm_f`/`degf` are 0/1 floats (traced scalars in the fused kernel,
    python constants in the single-sweep kernel). `oh` optionally supplies
    the precomputed MERGED [WTOT, 2·TILE] bf16 one-hot (columns
    [0, TILE) = endpoint a, [TILE, 2·TILE) = endpoint b — the fused
    kernel persists it in VMEM scratch across sweeps; the iota-compare
    rebuild was ~60% of a sweep's VPU work). Both endpoints ride ONE
    gather matmul and ONE scatter matmul (the per-endpoint pairs halved
    the MXU op count for the same MACs). Returns
    (lam_new [4, TILE], cab [16, 2·TILE], oh_ab) where cab is the merged
    per-endpoint contribution stack ready for the one-hot scatter.
    """
    if lowp:
        # single-pass movement (cfg.z_bf16): one bf16 matmul per gather
        # — z reads round to ~2⁻⁸ relative; the f32 accumulator and the
        # per-sweep shrinking deltas keep resting contacts exact enough
        # (docs/PERFORMANCE.md lever 4)
        w_hi, w_lo = win.astype(jnp.bfloat16), None
    else:
        w_hi, w_lo = _split(win)

    def bgather(oh1):
        g1 = jax.lax.dot_general(
            w_hi, oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if w_lo is None:
            return g1
        return g1 + jax.lax.dot_general(
            w_lo, oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if oh is None:
        # no persisted scratch (sharded single-sweep kernel): build the
        # endpoint one-hots separately — a 1-D lane concatenate of
        # la/lb to one [2T] vector crashes Mosaic's layout assignment
        row = jax.lax.broadcasted_iota(jnp.int32, (wtot, tile), 0)
        oh_a = (row == la[None, :]).astype(jnp.bfloat16)  # [WTOT, TILE]
        oh_b = (row == lb[None, :]).astype(jnp.bfloat16)
        oh_ab = (oh_a, oh_b)
        ga = bgather(oh_a)
        gb = bgather(oh_b)   # ghost endpoints (lb = -1): all-zero column
    else:
        # persisted merged one-hot [WTOT, 2T]: both endpoints ride ONE
        # gather matmul (and one scatter matmul downstream)
        oh_ab = oh
        gab = bgather(oh_ab)
        ga = gab[:, :tile]
        gb = gab[:, tile:]

    r_a = (cs[_R_RA], cs[_R_RA + 1], cs[_R_RA + 2])
    r_b = (cs[_R_RB], cs[_R_RB + 1], cs[_R_RB + 2])
    nrm = (cs[_R_N], cs[_R_N + 1], cs[_R_N + 2])
    t1 = (cs[_R_T1], cs[_R_T1 + 1], cs[_R_T1 + 2])
    t2 = (cs[_R_T2], cs[_R_T2 + 1], cs[_R_T2 + 2])
    inv_k_n, inv_k_t1, inv_k_t2 = cs[_R_IKN], cs[_R_IKT1], cs[_R_IKT2]
    v_target, bias = cs[_R_VTGT], cs[_R_BIAS]
    friction, relax = cs[_R_FRIC], cs[_R_RELAX]
    inv_m_a, inv_m_b = cs[_R_IMA], cs[_R_IMB]
    iw_a = tuple(cs[_R_IWA + k] for k in range(9))
    iw_b = tuple(cs[_R_IWB + k] for k in range(9))

    def rel_vel(base):
        va = v3.add((ga[base], ga[base + 1], ga[base + 2]),
                    v3.cross((ga[base + 3], ga[base + 4], ga[base + 5]),
                             r_a))
        vb = v3.add((gb[base], gb[base + 1], gb[base + 2]),
                    v3.cross((gb[base + 3], gb[base + 4], gb[base + 5]),
                             r_b))
        return v3.sub(va, vb)

    # in-kernel Jacobi relaxation: deg rides z row 14
    relax = relax / jnp.maximum(jnp.maximum(ga[14], gb[14]), 1.0)

    lam_n, lam_t1, lam_t2, lam_b = lam4[0], lam4[1], lam4[2], lam4[3]

    v = rel_vel(0)
    v_n = v3.dot(nrm, v)
    d_lam = (v_target - v_n) * inv_k_n * relax * vel_on
    lam_n_new = jnp.maximum(lam_n + d_lam, 0.0)
    lim = friction * lam_n_new
    v_t1 = v3.dot(t1, v)
    lam_t1_new = jnp.clip(lam_t1 - v_t1 * inv_k_t1 * relax * vel_on,
                          -lim, lim)
    v_t2 = v3.dot(t2, v)
    lam_t2_new = jnp.clip(lam_t2 - v_t2 * inv_k_t2 * relax * vel_on,
                          -lim, lim)

    pv_n = v3.dot(nrm, rel_vel(8))
    d_lam_b = (bias - pv_n) * inv_k_n * relax * pos_on
    lam_b_new = jnp.maximum(lam_b + d_lam_b, 0.0)

    if is_warm_f is not None:
        # warm sweep applies the cached impulses: λ jumps 0 → λ₀
        wf = is_warm_f
        nf = 1.0 - wf
        lam_n_new = wf * cs[_R_LAM0] + nf * lam_n_new
        lam_t1_new = wf * cs[_R_LAM0 + 1] + nf * lam_t1_new
        lam_t2_new = wf * cs[_R_LAM0 + 2] + nf * lam_t2_new
        lam_b_new = nf * lam_b_new

    imp = v3.add(
        v3.add(v3.scale(nrm, lam_n_new - lam_n),
               v3.scale(t1, lam_t1_new - lam_t1)),
        v3.scale(t2, lam_t2_new - lam_t2))
    pimp = v3.scale(nrm, lam_b_new - lam_b)

    zero = jnp.zeros((tile,), jnp.float32)
    deg_row = degf * jnp.ones((tile,), jnp.float32)

    def contrib(im, pim, inv_m, iw, r, sign):
        dv = v3.scale(im, sign * inv_m)
        dw = v3.scale(v3.mat_vec(iw, v3.cross(r, im)), sign)
        pdv = v3.scale(pim, sign * inv_m)
        pdw = v3.scale(v3.mat_vec(iw, v3.cross(r, pim)), sign)
        return jnp.stack(
            [dv[0], dv[1], dv[2], dw[0], dw[1], dw[2], zero, zero,
             pdv[0], pdv[1], pdv[2], pdw[0], pdw[1], pdw[2], deg_row,
             zero])                                       # [16, TILE]

    ca = contrib(imp, pimp, inv_m_a, iw_a, r_a, 1.0)
    cb = contrib(imp, pimp, inv_m_b, iw_b, r_b, -1.0)
    cab = jnp.concatenate([ca, cb], axis=1)              # [16, 2T]
    lam_new = jnp.stack([lam_n_new, lam_t1_new, lam_t2_new, lam_b_new])
    return lam_new, cab, oh_ab


def _bscatter(cmat, oh, lowp=False):
    """Merged scatter: cmat [16, 2T] against the merged one-hot
    [WTOT, 2T] — both endpoints' deltas in ONE matmul. `oh` may also be
    the (oh_a, oh_b) pair from the no-scratch path (two matmuls)."""
    if isinstance(oh, tuple):
        t = cmat.shape[1] // 2
        return (_bscatter(cmat[:, :t], oh[0], lowp=lowp)
                + _bscatter(cmat[:, t:], oh[1], lowp=lowp))
    if lowp:
        return jax.lax.dot_general(
            cmat.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [16, WTOT]
    c_hi, c_lo = _split(cmat)
    d1 = jax.lax.dot_general(
        c_hi, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [16, WTOT]
    return d1 + jax.lax.dot_general(
        c_lo, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_kernel(tile, wtot, n_sweeps, vel_iters, pos_iters, warm_sweep,
                 persist_oh=False, integrate=None, prep=None,
                 lowp=False, nchunks=1, ntpc_static=None):
    """Kernel body closure over the static solve shape.

    Grid is (n_sweeps, ntiles), or (nchunks, n_sweeps, ntiles_per_chunk)
    when `nchunks > 1` — the STREAMING mode that breaks the
    everything-resident VMEM ceiling (~24k bodies, VERDICT round 4):
    bucket ranges run the full sweep schedule sequentially, so only one
    range's consts/one-hots/λ live in VMEM at a time while the z table
    (16·npad f32 — small even at 65k) stays resident across all chunks.
    Later chunks read earlier chunks' converged velocities (windows
    extend forward only), i.e. the schedule is block-Gauss-Seidel over
    chunks with pure Jacobi sweeps inside each chunk — at least as
    contractive as plain Jacobi, and sweep-for-sweep identical to it
    when nchunks == 1.

    Sweep s=0 is a combined pre-pass: it
    scatters each active contact's endpoint count into z-table row 14 (so
    the Jacobi relaxation 1/deg is computed in-kernel — the per-sweep
    endpoint gathers read the deg row for free, it rides the same matmul)
    and, when `warm_sweep`, applies the warm-start impulses (λ: 0 → λ₀) in
    the same scatter. Relaxation sweeps start at s=1 and never race the
    pre-pass: they read the per-sweep snapshot taken at tile 0.

    persist_oh: build each tile's endpoint one-hots ONCE (sweep 0) and
    keep them in bf16 VMEM scratch for the later sweeps — the per-sweep
    iota-compare rebuild was most of the kernel's VPU instruction count.
    Costs 2·wtot·cp bf16 bytes of scratch (lifted vmem limit at 4k).

    integrate=(dt, renorm): fused position-integration epilogue (table
    path only, where tile t's window base IS t·128 and windows extend
    forward only — so after tile t's final-sweep scatter, ranks
    [t·128, (t+1)·128) can receive no further deltas). Each final-sweep
    tile then integrates its own 128 ranks in-kernel: pos += (v+pv)·dt
    and q ← exp(ω·dt) ∘ normalize(exp(pω·dt) ∘ q), replacing BOTH the
    split-impulse XLA update and engine.integrate_positions. Inputs gain
    posq [8, NPAD] (pos xyz, quat wxyz); outputs gain the integrated
    [8, NPAD].

    prep=dict(baum_over_dt, slop, relaxation, use_split): the merged
    (cfg.fuse_prep) variant — inputs are the raw contact table
    [16, TILE], warm rows [8, TILE], and the unified geometry table
    [48, NPAD] instead of la/lb/consts/z0(/posq). Sweep 0 derives
    la/lb + one-hots from the table, gathers endpoint geometry, and
    builds the per-contact solve constants into VMEM scratch
    (_prep_consts_math); later sweeps read the scratch — consts/la/lb
    never stream from HBM again. Table path only (bases = t·128).
    Requires persist_oh.
    """
    stage_off = 1
    # chunked snapshot span: ntpc·128 ranks + the forward window. wtot
    # is a multiple of 128, so chunk_base + span ≤ npad exactly at the
    # last chunk (npad = round_up(n, 128) + wtot, ops/contact_table.
    # geom_pad)
    chunk_span = (ntpc_static * 128 + wtot) if ntpc_static else None

    def kernel(base_ref, *refs):
        if prep is not None:
            tab_in_ref, warm_ref, geom_ref, *refs = refs
            la_ref = lb_ref = consts_ref = z0_ref = posq_ref = None
            if integrate is not None:
                zout_ref, lam_ref, pq_ref, *scratch = refs
            else:
                zout_ref, lam_ref, *scratch = refs
                pq_ref = None
            if persist_oh:
                tab_read, tab_acc, lam_s, ohab_s, consts_s = scratch
            else:
                # big-cp mode: the [wtot, 2·cp] one-hot scratch would
                # blow VMEM — endpoints ride spare consts rows 46/47
                # and each sweep rebuilds its tile's one-hots
                # (iota-compare, the known ~60%-of-sweep VPU cost)
                tab_read, tab_acc, lam_s, consts_s = scratch
                ohab_s = None
        else:
            la_ref, lb_ref, consts_ref, z0_ref, *refs = refs
            tab_in_ref = warm_ref = geom_ref = consts_s = None
            if integrate is not None:
                posq_ref, zout_ref, lam_ref, pq_ref, *scratch = refs
            else:
                zout_ref, lam_ref, *scratch = refs
                posq_ref = pq_ref = None
            if persist_oh:
                tab_read, tab_acc, lam_s, ohab_s = scratch
            else:
                tab_read, tab_acc, lam_s = scratch
                ohab_s = None
        if nchunks > 1:
            c, s, t = (pl.program_id(0), pl.program_id(1),
                       pl.program_id(2))
            ntpc = pl.num_programs(2)
            gt = c * ntpc + t          # global tile id (bases, lam out)
            is_first = (c == 0) & (s == 0) & (t == 0)
            is_last = ((c == nchunks - 1) & (s == n_sweeps - 1)
                       & (t == ntpc - 1))
        else:
            s, t = pl.program_id(0), pl.program_id(1)
            gt = t
            is_first = (s == 0) & (t == 0)
            is_last = (s == n_sweeps - 1) & (t == pl.num_programs(1) - 1)

        @pl.when(is_first)
        def _():
            if prep is not None:
                # z0 built in-kernel: rows 0:6 = vel/omega straight off
                # the geometry table's solve block; rest zeros
                tab_acc[0:6, :] = geom_ref[13:19, :]
                tab_acc[6:Z_ROWS, :] = jnp.zeros(
                    (Z_ROWS - 6, tab_acc.shape[1]), jnp.float32)
            else:
                tab_acc[:] = z0_ref[:]

        @pl.when(t == 0)
        def _():
            if nchunks > 1:
                # per-sweep Jacobi snapshot, restricted to THIS chunk's
                # rank span (its tiles' windows never read outside
                # [chunk_base, chunk_base + ntpc·128 + wtot)) — the
                # full-npad copy made snapshot cost scale with
                # chunks × sweeps × npad (measured 9.06 vs 9.48M at 65k
                # for 16 vs 2 chunks before this restriction)
                cb = pl.multiple_of(c * (ntpc_static * 128), 128)
                tab_read[:, pl.ds(cb, chunk_span)] = (
                    tab_acc[:, pl.ds(cb, chunk_span)])
            else:
                tab_read[:] = tab_acc[:]

        coff = pl.multiple_of(t * tile, 128)

        @pl.when(s == 0)
        def _():
            lam_s[:, pl.ds(coff, tile)] = jnp.zeros((4, tile), jnp.float32)

        start = pl.multiple_of(base_ref[gt], 128)
        win = tab_read[:, pl.ds(start, wtot)]                # [16, WTOT]

        i = s - stage_off
        vel_on = jnp.where((i >= 0) & (i < vel_iters), 1.0, 0.0)
        pos_on = jnp.where((i >= 0) & (i < pos_iters), 1.0, 0.0)
        is_warm_f = (jnp.where(s == 0, 1.0, 0.0) if warm_sweep else None)
        degf = jnp.where(s == 0, 1.0, 0.0)

        coff2 = pl.multiple_of(t * 2 * tile, 128)
        coff2b = pl.multiple_of(t * 2 * tile + tile, 128)
        if prep is not None:
            # sweep 0: derive endpoints from the contact table, build the
            # merged one-hot AND the solve constants into scratch
            # (la/lb/consts never exist in HBM)
            @pl.when(s == 0)
            def _():
                # contact-table rows (ops/contact_table.py): pt 0:3,
                # n 3:6, d 6, mu 7, rest 8, act 9, ra 13, rb1 14
                # (+ anchors 16:25 when cfg.contact_rebuild > 1)
                tb = tab_in_ref[:]                       # [trows, TILE]
                actf = tb[9]
                act = actf > 0.0
                ra = tb[13].astype(jnp.int32)
                rb1 = tb[14].astype(jnp.int32)
                la_k = jnp.where(act, ra - start, -1)
                has_b = act & (rb1 > 0)
                lb_k = jnp.where(has_b, rb1 - 1 - start, -1)
                # two 128-aligned halves (a 1-D lane concatenate of
                # la/lb crashes Mosaic's layout assignment)
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (wtot, tile), 0)
                gwin = geom_ref[0:GEOM_ROWS, pl.ds(start, wtot)]
                g_hi, g_lo = _split(gwin)
                if persist_oh:
                    ohab_s[:, pl.ds(coff2, tile)] = (
                        row == la_k[None, :]).astype(jnp.bfloat16)
                    ohab_s[:, pl.ds(coff2b, tile)] = (
                        row == lb_k[None, :]).astype(jnp.bfloat16)
                    oh_ab0 = ohab_s[:, pl.ds(coff2, 2 * tile)]
                    gg = jax.lax.dot_general(
                        g_hi, oh_ab0, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gg = gg + jax.lax.dot_general(
                        g_lo, oh_ab0, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [24, 2T]
                    ga_p, gb_p = gg[:, :tile], gg[:, tile:]
                else:
                    oh_a0 = (row == la_k[None, :]).astype(jnp.bfloat16)
                    oh_b0 = (row == lb_k[None, :]).astype(jnp.bfloat16)

                    def ggather(oh1):
                        g1 = jax.lax.dot_general(
                            g_hi, oh1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        return g1 + jax.lax.dot_general(
                            g_lo, oh1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    ga_p, gb_p = ggather(oh_a0), ggather(oh_b0)

                if prep.get("anchored"):
                    # persistent anchored contacts: re-derive
                    # point/normal/depth from the body-frame anchors and
                    # CURRENT transforms (exact at the build step;
                    # between rebuilds this IS the narrow phase —
                    # depth(t) = d0 − n̂·(a_pt − b_pt), contacts
                    # deactivate the moment they separate)
                    def rot9(q):
                        w, x, y, z = q
                        return (1 - 2 * (y * y + z * z),
                                2 * (x * y - w * z), 2 * (x * z + w * y),
                                2 * (x * y + w * z),
                                1 - 2 * (x * x + z * z),
                                2 * (y * z - w * x),
                                2 * (x * z - w * y), 2 * (y * z + w * x),
                                1 - 2 * (x * x + y * y))

                    def apply(r, v):
                        return (r[0] * v[0] + r[1] * v[1] + r[2] * v[2],
                                r[3] * v[0] + r[4] * v[1] + r[5] * v[2],
                                r[6] * v[0] + r[7] * v[1] + r[8] * v[2])

                    r_a9 = rot9((ga_p[19], ga_p[20], ga_p[21], ga_p[22]))
                    r_b9 = rot9((gb_p[19], gb_p[20], gb_p[21], gb_p[22]))
                    aw = apply(r_a9, (tb[16], tb[17], tb[18]))
                    a_pt = (ga_p[0] + aw[0], ga_p[1] + aw[1],
                            ga_p[2] + aw[2])
                    bw = apply(r_b9, (tb[19], tb[20], tb[21]))
                    hbf = has_b.astype(jnp.float32)
                    b_pt = (hbf * (gb_p[0] + bw[0])
                            + (1.0 - hbf) * tb[19],
                            hbf * (gb_p[1] + bw[1])
                            + (1.0 - hbf) * tb[20],
                            hbf * (gb_p[2] + bw[2])
                            + (1.0 - hbf) * tb[21])
                    n_w = apply(r_a9, (tb[22], tb[23], tb[24]))
                    sep = (n_w[0] * (a_pt[0] - b_pt[0])
                           + n_w[1] * (a_pt[1] - b_pt[1])
                           + n_w[2] * (a_pt[2] - b_pt[2]))
                    d_t = tb[6] - sep
                    actf_t = actf * (d_t > 0.0).astype(jnp.float32)
                    p_t, n_t = a_pt, n_w
                else:
                    p_t = (tb[0], tb[1], tb[2])
                    n_t = (tb[3], tb[4], tb[5])
                    d_t = tb[6]
                    actf_t = actf

                wm = warm_ref[:]                         # [8, TILE]
                consts0 = _prep_consts_math(
                    ga_p, gb_p,
                    p_t, n_t, d_t, tb[7], tb[8], actf_t,
                    (wm[0], wm[1], wm[2]),
                    (has_b & (actf_t > 0.0)).astype(jnp.float32),
                    tile=tile, baum_over_dt=prep["baum_over_dt"],
                    slop=prep["slop"],
                    relaxation=prep["relaxation"],
                    use_split=prep["use_split"])
                ii = jax.lax.broadcasted_iota(
                    jnp.int32, (R_CONST, tile), 0)
                if prep.get("anchored"):
                    # refreshed depth·activity rides spare consts row 45
                    # → emitted as lam row 3 at the final sweep (the
                    # caller's penetration/count metrics stay FRESH
                    # between rebuilds; λ_b itself is never consumed)
                    consts0 = jnp.where(ii == 45, d_t * actf_t,
                                        consts0)
                if not persist_oh:
                    # endpoints persist in spare consts rows 46/47 —
                    # later sweeps rebuild their one-hots from these
                    consts0 = jnp.where(
                        ii == 46, la_k.astype(jnp.float32), consts0)
                    consts0 = jnp.where(
                        ii == 47, lb_k.astype(jnp.float32), consts0)
                consts_s[:, pl.ds(coff, tile)] = consts0

            cs = consts_s[:, pl.ds(coff, tile)]          # [R_CONST, TILE]
            if persist_oh:
                la = lb = None
                oh = ohab_s[:, pl.ds(coff2, 2 * tile)]
            else:
                la = cs[46].astype(jnp.int32)
                lb = cs[47].astype(jnp.int32)
                oh = None
        else:
            la = la_ref[0, 0, :]
            lb = lb_ref[0, 0, :]
            cs = consts_ref[:]                           # [R_CONST, TILE]

            oh = None
            if persist_oh:
                @pl.when(s == 0)
                def _():
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (wtot, tile), 0)
                    ohab_s[:, pl.ds(coff2, tile)] = (
                        row == la[None, :]).astype(jnp.bfloat16)
                    ohab_s[:, pl.ds(coff2b, tile)] = (
                        row == lb[None, :]).astype(jnp.bfloat16)

                oh = ohab_s[:, pl.ds(coff2, 2 * tile)]

        lam4 = lam_s[:, pl.ds(coff, tile)]                   # [4, TILE]
        lam_new, cab, oh_ab = _sweep_tile_math(
            win, la, lb, cs, lam4, tile=tile, wtot=wtot,
            vel_on=vel_on, pos_on=pos_on, is_warm_f=is_warm_f, degf=degf,
            oh=oh, lowp=lowp)

        lam_s[:, pl.ds(coff, tile)] = lam_new
        tab_acc[:, pl.ds(start, wtot)] += _bscatter(cab, oh_ab,
                                                    lowp=lowp)
        if prep is not None and prep.get("anchored"):
            # final-sweep output row 3 = refreshed depth·activity (λ_b
            # is internal-only); earlier sweeps' writes are overwritten
            lastf = (s == n_sweeps - 1).astype(jnp.float32)
            lam_ref[:] = jnp.concatenate([
                lam_new[0:3],
                (lastf * cs[45:46]
                 + (1.0 - lastf) * lam_new[3:4]),
            ])
        else:
            lam_ref[:] = lam_new

        if integrate is not None:
            dt_i, renorm = integrate

            @pl.when(s == n_sweeps - 1)
            def _():
                # this tile's own 128 ranks are final now (windows only
                # extend forward; later tiles start at (t+1)·128)
                own = tab_acc[:, pl.ds(start, 128)]        # [16, 128]
                if prep is not None:
                    # pos = geom rows 0:3, quat = rows 19:23 (the solve
                    # block of the unified table)
                    gq = geom_ref[:, pl.ds(start, 128)]    # [48, 128]
                    pq = jnp.concatenate(
                        [gq[0:3], gq[19:23], gq[23:24]])   # [8, 128]
                else:
                    pq = posq_ref[:, pl.ds(start, 128)]    # [8, 128]
                dt_f = jnp.float32(dt_i)

                def expq(vx, vy, vz):
                    # exp-map: identity at |v| = 0 falls out (sin(0)/1)
                    nn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
                    safe = jnp.where(nn > 0.0, nn, 1.0)
                    half = nn * 0.5
                    sfac = jnp.sin(half) / safe
                    return (jnp.cos(half), vx * sfac, vy * sfac,
                            vz * sfac)

                def qmul(a, b):
                    w1, x1, y1, z1 = a
                    w2, x2, y2, z2 = b
                    return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)

                def qnorm(a):
                    w, x, y, z = a
                    inv = 1.0 / jnp.maximum(
                        jnp.sqrt(w * w + x * x + y * y + z * z), 1e-12)
                    return (w * inv, x * inv, y * inv, z * inv)

                q0 = (pq[3], pq[4], pq[5], pq[6])
                # split-impulse pseudo-rotation first (normalized), then
                # the velocity rotation — exact XLA-path op order
                q1 = qnorm(qmul(
                    expq(own[11] * dt_f, own[12] * dt_f, own[13] * dt_f),
                    q0))
                q2 = qmul(
                    expq(own[3] * dt_f, own[4] * dt_f, own[5] * dt_f), q1)
                if renorm:
                    q2 = qnorm(q2)
                px = pq[0] + (own[0] + own[8]) * dt_f
                py = pq[1] + (own[1] + own[9]) * dt_f
                pz = pq[2] + (own[2] + own[10]) * dt_f
                pq_ref[:, pl.ds(start, 128)] = jnp.stack(
                    [px, py, pz, q2[0], q2[1], q2[2], q2[3],
                     jnp.zeros_like(px)])

        @pl.when(is_last)
        def _():
            zout_ref[:] = tab_acc[:]

    return kernel


def banded_sweeps(
    z0: Array,            # [16, NPAD] packed rank-space velocity table
    bases: Array,         # [ntiles] int32 window starts (multiples of 128)
    la: Array,            # [Cp] int32 local rank of endpoint a (-1 ⇒ off)
    lb: Array,            # [Cp] int32 local rank of endpoint b (-1 ⇒ off)
    consts: Array,        # [R_CONST, Cp] per-contact constants
    *,
    tile: int,
    wtot: int,
    vel_iters: int,
    pos_iters: int,
    warm_sweep: bool,
    interpret: bool | None = None,
    persist_oh: bool | None = None,
    posq: Array | None = None,
    integrate: Tuple[float, bool] | None = None,
    lowp: bool = False,
) -> Tuple[Array, Array, Array | None]:
    """Run the fused sweep loop; returns (z [16, NPAD], lam [4, Cp],
    integrated posq [8, NPAD] | None).

    posq + integrate=(dt, renormalize) engage the in-kernel position
    integration epilogue (see _make_kernel) — valid ONLY when bases are
    the static t·128 of the contact-table path."""
    cp = la.shape[0]
    ntiles = cp // tile
    npad = z0.shape[1]
    # +1: the combined degree/warm-start pre-pass (sweep 0)
    n_sweeps = max(vel_iters, pos_iters) + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if persist_oh is None:
        import os

        # persist unless the one-hot scratch would crowd VMEM (bf16
        # 2·wtot·cp bytes; ~25 MB at the 4k pile, fine — ~100 MB+ for
        # very large packed-env solves, where rebuild wins)
        persist_oh = (2 * wtot * cp * 2 <= 48 * 1024 * 1024
                      and os.environ.get("PHYSICS_TPU_PERSIST_OH", "1")
                      != "0")

    la3 = jnp.broadcast_to(la.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    lb3 = jnp.broadcast_to(lb.reshape(ntiles, 1, tile), (ntiles, 8, tile))

    assert (posq is None) == (integrate is None)
    kernel = _make_kernel(tile, wtot, n_sweeps, vel_iters, pos_iters,
                          warm_sweep, persist_oh=persist_oh,
                          integrate=integrate, lowp=lowp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sweeps, ntiles),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda s, t, b: (t, 0, 0)),
            pl.BlockSpec((1, 8, tile), lambda s, t, b: (t, 0, 0)),
            pl.BlockSpec((R_CONST, tile), lambda s, t, b: (0, t)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
             if integrate is not None else []),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda s, t, b: (0, t)),
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
             if integrate is not None else []),
        scratch_shapes=[
            pltpu.VMEM((Z_ROWS, npad), jnp.float32),
            pltpu.VMEM((Z_ROWS, npad), jnp.float32),
            pltpu.VMEM((4, cp), jnp.float32),
        ] + ([
            pltpu.VMEM((wtot, 2 * cp), jnp.bfloat16),
        ] if persist_oh else []),
    )
    # scratch demand: two z tables + the λ table + streamed blocks. The
    # default 16 MB scoped-vmem limit caps packed-env solves at ~4k envs;
    # v5e physically has more — lift the cap ONLY when the shapes need it
    # (a raised limit measurably degrades scheduling for solves that fit:
    # E=8192 packed runs, but at worse per-body throughput than E=4096).
    # 4 × [16, npad]: tab_read/tab_acc scratch + the z0 input + zout
    # output (both whole-VMEM residents)
    scratch_bytes = ((4 * Z_ROWS * npad + 4 * cp) * 4
                     + (2 * 8 * npad * 4 if integrate is not None else 0)
                     + (2 * wtot * cp * 2 if persist_oh else 0))
    block_bytes = (2 * 8 * tile + R_CONST * tile + 3 * wtot * tile) * 4 * 2
    needed = int((scratch_bytes + block_bytes) * 1.25)
    params = {}
    if needed > 16 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=needed)
    out_shape = [
        jax.ShapeDtypeStruct((Z_ROWS, npad), jnp.float32),
        jax.ShapeDtypeStruct((4, cp), jnp.float32),
    ]
    operands = [bases, la3, lb3, consts, z0]
    if integrate is not None:
        out_shape.append(jax.ShapeDtypeStruct((8, npad), jnp.float32))
        operands.append(posq)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(*operands)
    if integrate is not None:
        return res
    z, lam4 = res
    return z, lam4, None


def banded_sweeps_fused(
    table: Array,         # [16, Cp] contact table (ops/contact_table.py)
    warm8: Array,         # [8, Cp] warm rows (rows 0:3 = λ₀; zeros if cold)
    geom: Array,          # [48, NPAD] unified rank-space geometry table
    bases: Array,         # [ntiles] int32 static window starts (t·128)
    cfg: SimConfig,
    *,
    tile: int,
    wtot: int,
    vel_iters: int,
    pos_iters: int,
    use_split: bool,
    integrate: Tuple[float, bool] | None = None,
    interpret: bool | None = None,
    chunks: int = 1,
) -> Tuple[Array, Array, Array | None]:
    """cfg.fuse_prep solve: ONE kernel from contact table to solved
    (and optionally integrated) state. Sweep 0 builds endpoints/one-hots/
    solve constants in-kernel from the table + unified geometry — no
    la/lb/consts/z0/posq arrays exist in HBM, and nothing but the z
    output streams back per sweep. The table/warm blocks use collapsing
    index maps (block t at sweep 0, block 0 after) so they stream from
    HBM exactly once. Table path only (bases = t·128).

    `chunks > 1` engages the STREAMING grid (see _make_kernel): the
    tile range is split into `chunks` sequential bucket-range passes,
    each running the full sweep schedule with only ITS consts/one-hot/λ
    scratch resident — per-chunk VMEM is 1/chunks of the
    everything-resident footprint, which is what lets 65k-body scenes
    keep the fused prep (and with it the anchored rebuild)."""
    cp = table.shape[1]
    ntiles = cp // tile
    npad = geom.shape[1]
    n_sweeps = max(vel_iters, pos_iters) + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    trows = table.shape[0]
    assert ntiles % chunks == 0, (ntiles, chunks)
    ntpc = ntiles // chunks
    cpc = cp // chunks

    prep = dict(
        baum_over_dt=cfg.baumgarte / cfg.dt,
        slop=cfg.penetration_slop,
        relaxation=cfg.contact_relaxation,
        use_split=use_split,
        anchored=cfg.contact_rebuild > 1,
    )
    # persisted one-hots ([wtot, 2·cp/chunks] bf16 VMEM, rebuilt-once at
    # sweep 0) were a round-3 win but are now a measured LOSS: with the
    # bf16 z movement the per-sweep iota-compare rebuild no longer
    # dominates, and the scratch crowds VMEM — v5e round 5: 4k pile
    # 8.71M without vs 8.38M with; 16k 9.45M (c=1, no oh) vs 9.04M
    # (c=4, oh). Default budget 0 = always rebuild per sweep (endpoints
    # ride consts rows 46/47); PHYSICS_TPU_OH_BUDGET=<bytes> re-enables
    # persistence for shapes under the budget.
    import os as _os

    persist_oh = 2 * wtot * cpc * 2 <= int(
        _os.environ.get("PHYSICS_TPU_OH_BUDGET", 0))
    kernel = _make_kernel(tile, wtot, n_sweeps, vel_iters, pos_iters,
                          warm_sweep=use_split, persist_oh=persist_oh,
                          integrate=integrate, prep=prep,
                          lowp=cfg.z_bf16, nchunks=chunks,
                          ntpc_static=ntpc)

    if chunks > 1:
        def once(c, s, t, b):
            # stream each table/warm block exactly once (its chunk's
            # sweep 0); later sweeps revisit the chunk's first block,
            # which Mosaic's pipeline skips re-fetching
            return (0, jnp.where(s == 0, c * ntpc + t, c * ntpc))

        def lam_idx(c, s, t, b):
            return (0, c * ntpc + t)

        grid = (chunks, n_sweeps, ntpc)
    else:
        def once(s, t, b):
            # stream each table/warm block exactly once (sweep 0); later
            # sweeps revisit block 0, which Mosaic skips re-fetching
            return (0, jnp.where(s == 0, t, 0))

        def lam_idx(s, t, b):
            return (0, t)

        grid = (n_sweeps, ntiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((trows, tile), once),
            pl.BlockSpec((8, tile), once),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lam_idx),
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
             if integrate is not None else []),
        scratch_shapes=[
            pltpu.VMEM((Z_ROWS, npad), jnp.float32),
            pltpu.VMEM((Z_ROWS, npad), jnp.float32),
            pltpu.VMEM((4, cpc), jnp.float32),
        ] + ([pltpu.VMEM((wtot, 2 * cpc), jnp.bfloat16)]
             if persist_oh else []) + [
            pltpu.VMEM((R_CONST, cpc), jnp.float32),
        ],
    )
    scratch_bytes = ((2 * Z_ROWS * npad + 4 * cpc + R_CONST * cpc) * 4
                     + (2 * wtot * cpc * 2 if persist_oh else 0)
                     + (8 * npad * 4 if integrate is not None else 0))
    block_bytes = ((trows + 8 + 4) * tile) * 4 * 2
    needed = int((scratch_bytes + block_bytes + 48 * npad * 4) * 1.25)
    params = {}
    if needed > 16 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=needed)
    out_shape = [
        jax.ShapeDtypeStruct((Z_ROWS, npad), jnp.float32),
        jax.ShapeDtypeStruct((4, cp), jnp.float32),
    ]
    if integrate is not None:
        out_shape.append(jax.ShapeDtypeStruct((8, npad), jnp.float32))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(bases, table, warm8, geom)
    if integrate is not None:
        return res
    z, lam4 = res
    return z, lam4, None


def pick_solve_chunks(nb: int, cp: int, wtot: int, npad: int,
                      cfg: SimConfig) -> int:
    """Streaming-pass count for the fused solve (cfg.solve_chunks;
    0 = auto). Auto picks the smallest divisor of `nb` whose per-pass
    scratch (consts + λ + one-hots when they fit the persist budget)
    plus the fixed residents (z tables, geometry, posq) fits the VMEM
    budget, PREFERRING a pass count that lets the one-hots persist
    (the per-sweep iota-compare rebuild is ~60% of a sweep's VPU work).
    ≤ 24k-body scenes resolve to 1 — the everything-resident kernel,
    bit-identical to rounds ≤ 4."""
    import os as _os

    if cfg.solve_chunks > 0:
        c = min(cfg.solve_chunks, nb)
        while nb % c:
            c -= 1
        return c
    budget = int(_os.environ.get("PHYSICS_TPU_VMEM_BUDGET",
                                 88 * 1024 * 1024))
    oh_budget = int(_os.environ.get("PHYSICS_TPU_OH_BUDGET", 0))
    # fixed residents: tab_read + tab_acc + zout ([16, npad] f32 each),
    # geom [48, npad], posq out [8, npad] (+25% Mosaic slack, matching
    # banded_sweeps_fused's `needed`)
    fixed = (3 * Z_ROWS * npad + 48 * npad + 8 * npad) * 4

    def fits(c):
        cpc = cp // c
        oh = 2 * wtot * cpc * 2
        per = (R_CONST + 4) * cpc * 4 + (oh if oh <= oh_budget else 0)
        return (fixed + per) * 1.25 <= budget
    # FEWEST chunks wins (v5e-measured, round 5): 16k ran 9.45M at c=1
    # (per-sweep iota one-hot rebuild) vs 9.04M at c=4 (persisted
    # one-hots) — chunk-transition overhead outweighs the persisted
    # one-hots' VPU savings, so chunking is purely a fit-in-VMEM tool
    for c in (c for c in range(1, nb + 1) if nb % c == 0):
        if fits(c):
            return c
    return nb


def _make_sweep1_kernel(tile, wtot, vel_on, pos_on, warm, deg_pass):
    """Single-sweep kernel for the SHARDED banded solve: one Jacobi sweep
    over the local contact tiles, emitting the z-table DELTA (so the
    caller can psum it across shards) and the updated λ.

    vel_on/pos_on/warm/deg_pass are python statics — the sharded sweep
    loop compiles at most 4 variants (sweep-0 deg/warm pass, vel+pos,
    vel-only, pos-only)."""

    def kernel(base_ref, la_ref, lb_ref, consts_ref, z_ref, lam_in_ref,
               dz_ref, lam_out_ref, acc):
        t = pl.program_id(0)
        ntiles = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        start = pl.multiple_of(base_ref[t], 128)
        win = z_ref[:, pl.ds(start, wtot)]                # [16, WTOT]
        la = la_ref[0, 0, :]
        lb = lb_ref[0, 0, :]
        cs = consts_ref[:]
        lam4 = lam_in_ref[:]                              # [4, TILE]

        lam_new, cab, oh_ab = _sweep_tile_math(
            win, la, lb, cs, lam4, tile=tile, wtot=wtot,
            vel_on=jnp.float32(1.0 if vel_on else 0.0),
            pos_on=jnp.float32(1.0 if pos_on else 0.0),
            is_warm_f=(jnp.float32(1.0) if warm else None),
            degf=jnp.float32(1.0 if deg_pass else 0.0))

        lam_out_ref[:] = lam_new
        acc[:, pl.ds(start, wtot)] += _bscatter(cab, oh_ab)

        @pl.when(t == ntiles - 1)
        def _():
            dz_ref[:] = acc[:]

    return kernel


def banded_sweep_once(
    z: Array,             # [16, NPAD] snapshot (read-only)
    bases: Array,         # [ntiles_local]
    la: Array,            # [Cp_local]
    lb: Array,
    consts: Array,        # [R_CONST, Cp_local]
    lam: Array,           # [4, Cp_local]
    *,
    tile: int,
    wtot: int,
    vel_on: bool,
    pos_on: bool,
    warm: bool,
    deg_pass: bool,
    interpret: bool | None = None,
) -> Tuple[Array, Array]:
    """One Jacobi sweep over a LOCAL tile range; returns (dz [16, NPAD],
    lam_new [4, Cp_local]). dz is the pure delta — sum across shards and
    add to z to complete the sweep (snapshot semantics identical to the
    fused kernel's, up to f32 reduction order)."""
    cp = la.shape[0]
    ntiles = cp // tile
    npad = z.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    la3 = jnp.broadcast_to(la.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    lb3 = jnp.broadcast_to(lb.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    kernel = _make_sweep1_kernel(tile, wtot, vel_on, pos_on, warm,
                                 deg_pass)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec((R_CONST, tile), lambda t, b: (0, t)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda t, b: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda t, b: (0, t)),
        ],
        scratch_shapes=[pltpu.VMEM((Z_ROWS, npad), jnp.float32)],
    )
    dz, lam_new = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Z_ROWS, npad), jnp.float32),
            jax.ShapeDtypeStruct((4, cp), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases, la3, lb3, consts, z, lam)
    return dz, lam_new


def banded_sweeps_sharded(
    z0: Array,
    bases: Array,
    la: Array,
    lb: Array,
    consts: Array,
    *,
    tile: int,
    wtot: int,
    vel_iters: int,
    pos_iters: int,
    warm_sweep: bool,
    axis_name: str,
    n_shards: int,
) -> Tuple[Array, Array]:
    """Sharded version of `banded_sweeps`: contact tiles split across the
    mesh axis, body z table replicated, one psum of the z-delta per sweep
    (rides ICI). Same sweep schedule and math as the fused kernel —
    results match up to f32 reduction order.

    Must be called INSIDE shard_map with the full (replicated) solve
    inputs; requires ntiles % n_shards == 0 (pad `capacity` to
    tile · n_shards)."""
    cp = la.shape[0]
    ntiles = cp // tile
    assert ntiles % n_shards == 0, (
        f"sharded banded solve needs ntiles ({ntiles}) divisible by the "
        f"axis size ({n_shards}); round the contact capacity up to "
        f"tile*n_shards")
    t_loc = ntiles // n_shards
    cp_loc = t_loc * tile
    idx = jax.lax.axis_index(axis_name)

    bases_l = jax.lax.dynamic_slice(bases, (idx * t_loc,), (t_loc,))
    la_l = jax.lax.dynamic_slice(la, (idx * cp_loc,), (cp_loc,))
    lb_l = jax.lax.dynamic_slice(lb, (idx * cp_loc,), (cp_loc,))
    consts_l = jax.lax.dynamic_slice(
        consts, (0, idx * cp_loc), (consts.shape[0], cp_loc))

    lam = jnp.zeros((4, cp_loc), jnp.float32)
    z = z0

    # sweep 0: deg pre-pass (+ warm-start λ jump), exactly the fused
    # kernel's combined stage
    dz, lam = banded_sweep_once(
        z, bases_l, la_l, lb_l, consts_l, lam,
        tile=tile, wtot=wtot, vel_on=False, pos_on=False,
        warm=warm_sweep, deg_pass=True)
    z = z + jax.lax.psum(dz, axis_name)

    for i in range(max(vel_iters, pos_iters)):
        dz, lam = banded_sweep_once(
            z, bases_l, la_l, lb_l, consts_l, lam,
            tile=tile, wtot=wtot,
            vel_on=i < vel_iters, pos_on=i < pos_iters,
            warm=False, deg_pass=False)
        z = z + jax.lax.psum(dz, axis_name)

    lam4 = jax.lax.all_gather(lam, axis_name, axis=1, tiled=True)
    return z, lam4


# geometry body-table rows (prep kernel input):
# pos(0:3) | world inv-inertia row-major (3:12) | inv_mass(12) |
# vel(13:16) | omega(16:19) | pad(19:24)
GEOM_ROWS = 24

# per-contact narrow-phase input rows (prep kernel input):
# point(0:3) | normal(3:6) | depth(6) | friction(7) | restitution(8) |
# actf(9) | lam0 λn λt1 λt2 (10:13) | has_bf(13) | pad(14:16)
CIN_ROWS = 16


def _prep_consts_math(ga, gb, p, nrm, depth, fric, rest, actf, lam0,
                      has_bf, *, tile, baum_over_dt, slop, relaxation,
                      use_split):
    """Per-contact solve-constants math shared by the standalone prep
    kernel and the merged solve kernel's sweep-0 (cfg.fuse_prep).

    `ga`/`gb` are the [24, TILE] endpoint gathers from the rank-space
    geometry table (solve layout rows 0:24); the rest are [TILE] contact
    fields. Returns the [R_CONST, TILE] consts stack."""
    inv_m_a = ga[12] * actf
    inv_m_b = gb[12] * has_bf
    iw_a = tuple(ga[3 + k] * actf for k in range(9))
    iw_b = tuple(gb[3 + k] * has_bf for k in range(9))
    r_a = v3.sub(p, (ga[0], ga[1], ga[2]))
    r_b = v3.sub(p, (gb[0], gb[1], gb[2]))

    # branchless orthonormal tangent basis (solver/contacts.py
    # _tangent_basis, component form)
    ax, ay, az = jnp.abs(nrm[0]), jnp.abs(nrm[1]), jnp.abs(nrm[2])
    use_x = (ax <= ay) & (ax <= az)
    use_y = (~use_x) & (ay <= az)
    f = lambda m: m.astype(jnp.float32)
    e = (f(use_x), f(use_y), f(~(use_x | use_y)))
    t1 = v3.cross(nrm, e)
    t1 = v3.scale(t1, 1.0 / jnp.maximum(v3.norm(t1), 1e-9))
    t2 = v3.cross(nrm, t1)

    def eff_mass(d):
        term_a = v3.dot(
            d, v3.cross(v3.mat_vec(iw_a, v3.cross(r_a, d)), r_a))
        term_b = v3.dot(
            d, v3.cross(v3.mat_vec(iw_b, v3.cross(r_b, d)), r_b))
        return inv_m_a + inv_m_b + term_a + term_b

    inv_k_n = 1.0 / jnp.maximum(eff_mass(nrm), 1e-9)
    inv_k_t1 = 1.0 / jnp.maximum(eff_mass(t1), 1e-9)
    inv_k_t2 = 1.0 / jnp.maximum(eff_mass(t2), 1e-9)

    va0 = v3.add((ga[13], ga[14], ga[15]),
                 v3.cross((ga[16], ga[17], ga[18]), r_a))
    vb0 = v3.scale(
        v3.add((gb[13], gb[14], gb[15]),
               v3.cross((gb[16], gb[17], gb[18]), r_b)),
        has_bf)
    v_n0 = v3.dot(nrm, v3.sub(va0, vb0))
    bias = jnp.float32(baum_over_dt) * jnp.maximum(
        depth - jnp.float32(slop), 0.0)
    bounce = rest * jnp.maximum(-v_n0, 0.0)
    if use_split:
        v_target = bounce
    else:
        v_target = jnp.maximum(bias, bounce)
    relax = jnp.float32(relaxation) * actf

    zero = jnp.zeros((tile,), jnp.float32)
    # λ₀ masked by activity here (idempotent for the pre-masked callers;
    # load-bearing for anchored refresh, where a slot can deactivate
    # between rebuilds and must not re-apply its cached impulse)
    return jnp.stack(
        list(r_a) + list(r_b) + list(nrm) + list(t1) + list(t2)
        + [inv_k_n, inv_k_t1, inv_k_t2, v_target, bias, fric,
           relax, inv_m_a, inv_m_b]
        + list(iw_a) + list(iw_b)
        + [l * actf for l in lam0]
        + [zero] * (R_CONST - 45)
    )                                                    # [48, TILE]


def _make_prep_kernel(tile, wtot, baum_over_dt, slop, relaxation,
                      use_split):
    """Geometry → solve-constants kernel (one pass over contact tiles).

    Fuses what used to be ~0.7 ms of XLA per-contact work (endpoint body
    gathers, contact frames, effective masses, solve targets, the [45, C]
    consts stack) into banded one-hot MXU gathers from a VMEM-resident
    body table — the same machinery as the solve kernel's sweeps.
    """

    def kernel(base_ref, la_ref, lb_ref, cin_ref, geom_ref, consts_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(base_ref[t], 128)
        # rows 0:24 = the solve layout — the unified table
        # (ops/contact_table.unified_geom) appends the narrow-phase
        # block at 24:48, which this kernel never reads
        win = geom_ref[0:GEOM_ROWS, pl.ds(start, wtot)]  # [24, WTOT]
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
                preferred_element_type=jnp.float32)      # [24, TILE]

        ga = bgather(oh_a)
        gb = bgather(oh_b)          # ghost endpoints: all-zero columns

        ci = cin_ref[:]                                  # [16, TILE]
        consts_ref[:] = _prep_consts_math(
            ga, gb, (ci[0], ci[1], ci[2]), (ci[3], ci[4], ci[5]),
            ci[6], ci[7], ci[8], ci[9], (ci[10], ci[11], ci[12]),
            ci[13], tile=tile, baum_over_dt=baum_over_dt, slop=slop,
            relaxation=relaxation, use_split=use_split)

    return kernel


def prep_consts(
    geom: Array,          # [24, NPAD] rank-space body table
    bases: Array,
    la: Array,
    lb: Array,
    cin: Array,           # [16, Cp] narrow-phase rows
    cfg: SimConfig,
    *,
    tile: int,
    wtot: int,
    use_split: bool,
    interpret: bool | None = None,
) -> Array:
    """Run the geometry/constants kernel; returns consts [R_CONST, Cp]."""
    cp = la.shape[0]
    ntiles = cp // tile
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    la3 = jnp.broadcast_to(la.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    lb3 = jnp.broadcast_to(lb.reshape(ntiles, 1, tile), (ntiles, 8, tile))
    kernel = _make_prep_kernel(
        tile, wtot, cfg.baumgarte / cfg.dt, cfg.penetration_slop,
        cfg.contact_relaxation, use_split)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec((1, 8, tile), lambda t, b: (t, 0, 0)),
            pl.BlockSpec((CIN_ROWS, tile), lambda t, b: (0, t)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_CONST, tile), lambda t, b: (0, t)),
    )
    # whole-geometry VMEM residency needs the cap lifted at large N
    # (same policy as banded_sweeps)
    needed = int((geom.size * 4
                  + 2 * 4 * (2 * 8 + CIN_ROWS + R_CONST) * tile) * 1.25)
    params = {}
    if needed > 16 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=needed)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_CONST, cp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(bases, la3, lb3, cin, geom)


def solve_shape(n: int, c: int, cfg: SimConfig) -> Tuple[int, int, int]:
    """(tile, wtot, npad) for a solve of c contacts over n bodies."""
    cp128 = max(_round_up(c, 128), 128)
    tile = min(cfg.pallas_tile, cp128)
    wtot = cfg.pallas_window
    npad = _round_up(max(n + wtot, wtot), 128)
    return tile, wtot, npad


def padded_contact_count(n: int, c: int, cfg: SimConfig) -> int:
    tile, _, _ = solve_shape(n, c, cfg)
    return _round_up(max(c, 1), tile)


def _pad_contacts(contacts: Contacts, cp: int) -> Contacts:
    c = contacts.body_a.shape[0]
    if c == cp:
        return contacts
    pad = cp - c

    def pad_field(name):
        arr = getattr(contacts, name)
        if name in ("point", "normal"):
            return jnp.pad(arr, ((0, 0), (0, pad)))
        return jnp.pad(arr, ((0, pad),))

    return Contacts(*[pad_field(f) for f in Contacts._fields])


def solve_impulses_banded(
    state: SimState,
    contacts: Contacts,
    cfg: SimConfig,
    order: Array | None,
    warm: Tuple[Array, Array] | None = None,
    ranks: Tuple[Array, Array] | None = None,
    capacity: int | None = None,
    shard: Tuple[str, int] | None = None,
):
    """Drop-in replacement for `solve_impulses` using the fused kernel.

    `shard=(axis_name, n_shards)` (inside shard_map, full contact list +
    replicated body state) keeps the whole prologue replicated (rank sort,
    prep-consts kernel — deterministic, identical on every shard) and
    splits the SWEEP tiles across the axis via `banded_sweeps_sharded`
    (per-sweep z-delta psum over ICI).

    `order` is the broad-phase sweep's body sort order (original body id per
    rank); the solve runs in rank space so pair endpoints are within
    `sweep_window` of each other. `order=None` means the identity order
    (env_blocks packing / ground-only scenes — already banded), which skips
    the rank indirection entirely.

    `ranks=(lo, rank_b)` supplies the per-contact endpoint ranks carried
    from the broad phase (lo = rank of endpoint a, always the lower one;
    rank_b = -1 for ghost/world contacts), so the prologue needs NO rank
    lookups; with `capacity` it also folds contact compaction into the
    same sort: the `capacity` lowest-rank active contacts are kept (the
    rest are counted into `contact_overflow`) — the caller must NOT
    compact beforehand. Without `ranks` the ranks are derived here with
    per-contact gathers.

    Returns the same tuple as `solve_impulses` plus a reordered `contacts`
    (sorted by rank, padded to the kernel tile) whose slots align with the
    returned lam3 — the caller must use THAT struct for warm-start
    bookkeeping.
    """
    n = state.num_bodies
    c0 = contacts.body_a.shape[0]
    cap_overflow = jnp.int32(0)
    if ranks is not None:
        assert capacity is not None
        cp = capacity
        tile, wtot, npad = solve_shape(n, cp, cfg)
        lo_all, rb_all = ranks
        key = jnp.where(contacts.active, lo_all, npad - 1)
        sort_idx = jnp.argsort(key).astype(jnp.int32)
        if c0 > cp:
            cap_overflow = jnp.maximum(
                jnp.sum(contacts.active.astype(jnp.int32)) - cp, 0)
            sort_idx = sort_idx[:cp]
        extra = jnp.stack([key.astype(jnp.float32),
                           (rb_all + 1).astype(jnp.float32)])
        contacts, ex = _field_gather(contacts, sort_idx, extra=extra)
        if contacts.body_a.shape[0] < cp:
            pad = cp - contacts.body_a.shape[0]
            contacts = _pad_contacts(contacts, cp)
            ex = jnp.pad(ex, ((0, 0), (0, pad)),
                         constant_values=0.0).at[0, cp - pad:].set(
                             jnp.float32(npad - 1))
        lo_s = ex[0].astype(jnp.int32)
        ra = lo_s
        rb = ex[1].astype(jnp.int32) - 1
        has_b = contacts.body_b >= 0
    else:
        cp = padded_contact_count(n, c0, cfg)
        tile, wtot, npad = solve_shape(n, c0, cfg)

        has_b0 = contacts.body_b >= 0
        if order is None:
            ra0 = contacts.body_a
            rb0 = jnp.where(has_b0, contacts.body_b, ra0)
        else:
            # rank of each body in sweep order: rank[order[i]] = i
            rank_l = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            # two plain [C] rank lookups (a combined [2, C]-index gather
            # form measured 2× slower than two flat gathers here)
            ra0 = rank_l[contacts.body_a]
            rb0 = jnp.where(has_b0,
                            rank_l[jnp.clip(contacts.body_b, 0, n - 1)],
                            ra0)
        # sort contacts by their lowest endpoint rank, then pad to the tile
        lo = jnp.where(contacts.active, jnp.minimum(ra0, rb0), n + npad)
        sort_idx = jnp.argsort(lo).astype(jnp.int32)
        if order is None:
            rr = None    # identity order: ranks ARE the sorted body ids
        else:
            rr = jnp.stack(
                [ra0, jnp.where(has_b0, rb0, -1)])[:, sort_idx]
            rr = jnp.pad(rr, ((0, 0), (0, cp - rr.shape[1])),
                         constant_values=-1)
        contacts = _field_gather(contacts, sort_idx)
        contacts = _pad_contacts(contacts, cp)

        has_b = contacts.body_b >= 0
        if order is None:
            ra = contacts.body_a
            rb = jnp.where(has_b, contacts.body_b, -1)
        else:
            ra = rr[0]
            rb = rr[1]
        lo_s = jnp.where(contacts.active, jnp.minimum(ra, jnp.where(
            has_b, rb, ra)), npad - 1)

    ntiles = cp // tile
    tile_min = jnp.min(lo_s.reshape(ntiles, tile), axis=1)
    bases = jnp.clip((tile_min // 128) * 128, 0, npad - wtot).astype(
        jnp.int32)
    base_per = jnp.repeat(bases, tile)
    la = ra - base_per
    lb = jnp.where(has_b, rb - base_per, -1)

    in_band = (la >= 0) & (la < wtot) & (lb < wtot)
    overflow = jnp.sum(
        (contacts.active & ~in_band).astype(jnp.int32))
    actf = (contacts.active & in_band).astype(jnp.float32)
    la = jnp.where(in_band & contacts.active, la, -1)
    lb = jnp.where(in_band & contacts.active & has_b, lb, -1)

    # ---- rank-space body tables: one for the solve (z0: velocities),
    # one for the prep kernel (geometry + velocities) ----
    r9 = v3.quat_to_mat(state.quat)                       # 9 × [N]
    iw9 = v3.sandwich(r9, v3.mat_unpack(state.inv_inertia))
    zn = jnp.zeros((n,), jnp.float32)
    geom_rows = jnp.stack(
        [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
        + list(iw9)
        + [state.inv_mass,
           state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
           state.omega[:, 0], state.omega[:, 1], state.omega[:, 2]]
        + [zn] * (GEOM_ROWS - 19)
    )                                                     # [24, N]
    if order is not None:
        geom_rows = geom_rows[:, order]
    geom = jnp.zeros((GEOM_ROWS, npad), jnp.float32).at[:, :n].set(
        geom_rows)
    z0 = jnp.zeros((Z_ROWS, npad), jnp.float32)
    z0 = z0.at[0:6, :n].set(geom_rows[13:19])

    use_split = warm is not None
    n_pos_iters = cfg.position_iters if use_split else 0

    lam0_n = lam0_t1 = lam0_t2 = jnp.zeros((cp,), jnp.float32)
    if warm is not None:
        lam0_n, lam0_t1, lam0_t2 = warm_start_lambda(contacts, warm, cp)
        lam0_n, lam0_t1, lam0_t2 = (lam0_n * actf, lam0_t1 * actf,
                                    lam0_t2 * actf)

    has_bf = (has_b & contacts.active).astype(jnp.float32) * (
        lb >= 0).astype(jnp.float32)
    cin = jnp.stack([
        contacts.point[0], contacts.point[1], contacts.point[2],
        contacts.normal[0], contacts.normal[1], contacts.normal[2],
        contacts.depth, contacts.friction, contacts.restitution,
        actf, lam0_n, lam0_t1, lam0_t2, has_bf,
        jnp.zeros((cp,), jnp.float32), jnp.zeros((cp,), jnp.float32),
    ])                                                    # [16, Cp]

    consts = prep_consts(
        geom, bases, la, lb, cin, cfg,
        tile=tile, wtot=wtot, use_split=use_split,
    )                                                     # [R_CONST, Cp]

    if shard is not None:
        z, lam4 = banded_sweeps_sharded(
            z0, bases, la, lb, consts,
            tile=tile, wtot=wtot,
            vel_iters=cfg.contact_iters, pos_iters=n_pos_iters,
            warm_sweep=use_split,
            axis_name=shard[0], n_shards=shard[1],
        )
    else:
        z, lam4, _ = banded_sweeps(
            z0, bases, la, lb, consts,
            tile=tile, wtot=wtot,
            vel_iters=cfg.contact_iters, pos_iters=n_pos_iters,
            warm_sweep=use_split, lowp=cfg.z_bf16,
        )

    if order is None:
        zz = z[:, :n]                                         # [16, N]
    else:
        # un-permute: body b's solved rows live at column rank[b]
        rank_inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        zz = z[:, rank_inv]
    vel = zz[0:3].T
    omega = zz[3:6].T
    pvel = zz[8:11].T
    pomega = zz[11:14].T
    lam3 = lam4[:3]

    count = jnp.sum(contacts.active.astype(jnp.int32))
    max_pen = jnp.max(jnp.where(contacts.active, contacts.depth, 0.0),
                      initial=0.0)
    metrics = {
        "contact_count": count,
        "max_penetration": max_pen,
        "normal_impulse_sum": jnp.sum(lam3[0]),
        "band_overflow": overflow,
    }
    if ranks is not None:
        metrics["contact_overflow"] = cap_overflow
    return vel, omega, pvel, pomega, lam3, metrics, contacts


def solve_impulses_table(
    state: SimState,
    table: Array,          # [CT_ROWS, NB·ccap] from ops/contact_table.py
    cfg: SimConfig,
    order: Array | None,
    warm_rows: Array | None = None,
    geom: Array | None = None,
    fuse: bool = False,
    shard: Tuple[str, int] | None = None,
):
    """Banded solve over the bucket-aligned contact table.

    The table is rank-banded BY CONSTRUCTION (bucket b's contacts touch
    ranks [b·128, b·128 + 128 + sweep_window)), so — unlike
    `solve_impulses_banded` — there is NO contact sort, NO field gather,
    NO padding: solver tile = one bucket (ccap contacts), window bases are
    the static b·128, and `cin` stacks straight off the table rows.

    `warm_rows` [8, cp] is the contact-table kernel's in-kernel warm
    match output (rows 0:3 = λ₀ per fresh contact) — no XLA sort-merge
    remains between the narrow phase and the solve kernels.

    `geom` is the shared unified rank-space geometry table
    (ops/contact_table.unified_geom, [48, NPAD]: rows 0:24 = this
    solver's layout incl. quat at 19:23, rows 24:48 = the contact-table
    kernel's) — built once per step and shared with the narrow phase.
    None = build the solve block locally.

    `fuse` engages the solve kernel's in-kernel position-integration
    epilogue (cfg.fuse_integrate): the returned state update includes
    pos/quat and the caller must skip BOTH the split-impulse XLA update
    and engine.integrate_positions' pos/quat math.

    Returns (vel, omega, pvel, pomega, lam3, metrics, keys, posquat):
    `keys` are the per-slot int32 feature keys the caller stores
    (table-aligned, unsorted) for next step's in-kernel warm match;
    `posquat` is (pos [N,3], quat [N,4]) when fuse else None (and then
    pvel/pomega are None — they were consumed in-kernel).
    """
    import numpy as onp

    from physics_tpu.ops.contact_table import (
        BLOCK,
        CT_ACT,
        CT_D,
        CT_MU,
        CT_N,
        CT_PT,
        CT_RA,
        CT_RB1,
        CT_REST,
        geom_pad,
        table_keys,
        table_shape,
    )

    n = state.num_bodies
    nb, ccap, cp = table_shape(n, cfg)
    assert table.shape == (table.shape[0], cp), (table.shape, cp)
    tile = ccap
    # identical formulas to the contact-table kernel's — one unified
    # geometry table serves both (incl. env_blocks' K-1 band)
    wtot, npad = geom_pad(n, cfg)

    bases_np = onp.clip(onp.arange(nb) * BLOCK, 0, npad - wtot)
    bases = jnp.asarray(bases_np, jnp.int32)
    base_per = jnp.asarray(onp.repeat(bases_np, ccap), jnp.int32)

    act = table[CT_ACT] > 0.0
    actf = table[CT_ACT]
    ra = table[CT_RA].astype(jnp.int32)
    rb1 = table[CT_RB1].astype(jnp.int32)
    has_b = act & (rb1 > 0)
    has_bf = has_b.astype(jnp.float32)
    la = jnp.where(act, ra - base_per, -1)
    lb = jnp.where(has_b, rb1 - 1 - base_per, -1)

    keys = table_keys(table)
    use_split = warm_rows is not None
    n_pos_iters = cfg.position_iters if use_split else 0
    if fuse:
        integrate = (cfg.dt, cfg.renormalize_quat)
    else:
        integrate = None

    # merged-prep solve (cfg.fuse_prep): the solve kernel consumes the
    # table/warm/geometry directly — skip the XLA cin/la/lb/z0/posq
    # builds AND the standalone prep kernel entirely (single-device
    # only: the sharded sweep loop streams consts per sweep)
    if (cfg.fuse_prep and shard is None and geom is not None
            and geom.shape[0] == 48):
        assert geom.shape[1] == npad, (geom.shape, npad)
        warm8 = (warm_rows if warm_rows is not None
                 else jnp.zeros((8, cp), jnp.float32))
        z, lam4, pq = banded_sweeps_fused(
            table, warm8, geom, bases, cfg,
            tile=tile, wtot=wtot,
            vel_iters=cfg.contact_iters, pos_iters=n_pos_iters,
            use_split=use_split, integrate=integrate,
            chunks=pick_solve_chunks(nb, cp, wtot, npad, cfg),
        )
        if cfg.contact_rebuild > 1:
            # anchored refresh: depth/activity were re-derived in-kernel
            # and ride lam row 3 — the table's CT_D/CT_ACT are the
            # build-step values, stale between rebuilds
            depth_act = lam4[3]
            act_t = depth_act > 0.0
        else:
            depth_act = jnp.where(act, table[CT_D], 0.0)
            act_t = act
        return _table_solve_outputs(
            z, lam4, pq, depth_act, act_t, keys, order, n, fuse)

    if warm_rows is not None:
        lam0_n, lam0_t1, lam0_t2 = warm_rows[0], warm_rows[1], warm_rows[2]
    else:
        lam0_n = lam0_t1 = lam0_t2 = jnp.zeros((cp,), jnp.float32)

    cin = jnp.stack([
        table[CT_PT], table[CT_PT + 1], table[CT_PT + 2],
        table[CT_N], table[CT_N + 1], table[CT_N + 2],
        table[CT_D], table[CT_MU], table[CT_REST],
        actf, lam0_n, lam0_t1, lam0_t2, has_bf,
        jnp.zeros((cp,), jnp.float32), jnp.zeros((cp,), jnp.float32),
    ])                                                    # [16, Cp]

    if geom is None:
        # rank-space solve table (same construction as
        # solve_impulses_banded, + quat in the spare rows 19:23)
        r9 = v3.quat_to_mat(state.quat)
        iw9 = v3.sandwich(r9, v3.mat_unpack(state.inv_inertia))
        geom_rows = jnp.stack(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
            + list(iw9)
            + [state.inv_mass,
               state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
               state.omega[:, 0], state.omega[:, 1], state.omega[:, 2],
               state.quat[:, 0], state.quat[:, 1], state.quat[:, 2],
               state.quat[:, 3]]
            + [jnp.zeros((n,), jnp.float32)] * (GEOM_ROWS - 23)
        )                                                 # [24, N]
        if order is not None:
            geom_rows = geom_rows[:, order]
        geom = jnp.zeros((GEOM_ROWS, npad), jnp.float32).at[:, :n].set(
            geom_rows)
    else:
        assert geom.shape[1] == npad, (geom.shape, npad)
    z0 = jnp.zeros((Z_ROWS, npad), jnp.float32).at[0:6, :].set(
        geom[13:19])

    consts = prep_consts(
        geom, bases, la, lb, cin, cfg,
        tile=tile, wtot=wtot, use_split=use_split,
    )
    if shard is not None:
        # sharded sweeps: prologue above ran replicated (deterministic);
        # one bucket-tile range per shard, z-delta psum per sweep
        assert not fuse
        z, lam4 = banded_sweeps_sharded(
            z0, bases, la, lb, consts,
            tile=tile, wtot=wtot,
            vel_iters=cfg.contact_iters, pos_iters=n_pos_iters,
            warm_sweep=use_split,
            axis_name=shard[0], n_shards=shard[1],
        )
        return _table_solve_outputs(
            z, lam4, None, jnp.where(act, table[CT_D], 0.0), act, keys,
            order, n, False)
    if fuse:
        posq = jnp.concatenate(
            [geom[0:3], geom[19:23], jnp.zeros((1, npad), jnp.float32)])
    else:
        posq = None
    z, lam4, pq = banded_sweeps(
        z0, bases, la, lb, consts,
        tile=tile, wtot=wtot,
        vel_iters=cfg.contact_iters, pos_iters=n_pos_iters,
        warm_sweep=use_split, lowp=cfg.z_bf16,
        posq=posq, integrate=integrate,
    )

    return _table_solve_outputs(
        z, lam4, pq, jnp.where(act, table[CT_D], 0.0), act, keys,
        order, n, fuse)


def _table_solve_outputs(z, lam4, pq, depth_act, act, keys, order, n,
                         fuse):
    """Shared output packing of the table-path solves: one un-permute
    gather for everything the caller reads back, plus device metrics."""
    big = jnp.concatenate([z[0:6], pq[0:7]]) if fuse else z
    if order is None:
        zz = big[:, :n]
    else:
        rank_inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        zz = big[:, rank_inv]
    lam3 = lam4[:3]
    metrics = {
        "contact_count": jnp.sum(act.astype(jnp.int32)),
        "max_penetration": jnp.max(depth_act, initial=0.0),
        "normal_impulse_sum": jnp.sum(lam3[0]),
        "band_overflow": jnp.int32(0),   # structural: bases are static
    }
    if fuse:
        return (zz[0:3].T, zz[3:6].T, None, None, lam3, metrics, keys,
                (zz[6:9].T, zz[9:13].T))
    return (zz[0:3].T, zz[3:6].T, zz[8:11].T, zz[11:14].T, lam3,
            metrics, keys, None)
