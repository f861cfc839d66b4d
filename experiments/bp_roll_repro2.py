"""Stage-2 repro for the bp_inkernel compile crash: the real kernel's
phase 0 extracted verbatim, staged (RR_STAGE), with the real shapes
(grid over buckets, [24, NPAD] geometry in VMEM, dynamic window slice).

Stages:
  6 grid + window slice + one aroll
  7 aroll of ~23 fields + AABB keep mask
  8 + face-axis SAT
  9 + tiles128 + compact_pair_lanes (prefix + one-hot scatter)
 10 + onehots + bgather of survivors (full phase 0)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as onp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.ops.contact_table import (
    _exclusive_prefix,
    _round_up,
    _split,
)

BLOCK = 128
BP_K = int(os.environ.get("RR_K", "48"))
NB = int(os.environ.get("RR_NB", "4"))
CAP = int(os.environ.get("RR_CAP", "512"))
WTOT = _round_up(BLOCK + min(BP_K, BLOCK), 128)
NPAD = NB * BLOCK + WTOT
STAGE = int(os.environ.get("RR_STAGE", "10"))
chunk_rows = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def kernel(geom_ref, out_ref):
    wtot = WTOT
    bp_k = BP_K
    b = pl.program_id(0)
    start = pl.multiple_of(b * BLOCK, 128)
    win = geom_ref[0:24, pl.ds(start, wtot)]
    w_hi, w_lo = _split(win)

    def aroll(v):
        b2 = jnp.broadcast_to(v[None, :], (8, wtot))
        groups = [
            pltpu.roll(b2, 8 * g + 1, 1, stride=1, stride_axis=0)
            for g in range(-(-bp_k // 8))
        ]
        out = jnp.concatenate(groups, axis=0)
        return out if out.shape[0] == bp_k else out[:bp_k]

    def bcast(v):
        return jnp.broadcast_to(v[None, :], (bp_k, wtot))

    if STAGE == 6:
        out_ref[:] = jnp.sum(aroll(win[0]), axis=0,
                             keepdims=True) + jnp.zeros((8, wtot))
        return

    ii2 = jax.lax.broadcasted_iota(jnp.int32, (bp_k, wtot), 1)
    dd = jax.lax.broadcasted_iota(jnp.int32, (bp_k, wtot), 0) + 1
    valid = (ii2 >= dd) & (ii2 < dd + BLOCK)

    ext = []
    for c in range(3):
        ext.append(jnp.abs(win[3 + 3 * c]) * win[12]
                   + jnp.abs(win[4 + 3 * c]) * win[13]
                   + jnp.abs(win[5 + 3 * c]) * win[14])
    pos3 = (win[0], win[1], win[2])
    mins = tuple(pos3[c] - ext[c] for c in range(3))
    maxs = tuple(pos3[c] + ext[c] for c in range(3))

    x_ov = bcast(mins[0]) <= aroll(maxs[0])
    keep = valid & x_ov
    for c in range(3):
        keep = keep & (
            jnp.maximum(aroll(mins[c]), bcast(mins[c]))
            <= jnp.minimum(aroll(maxs[c]), bcast(maxs[c])))
    live = (aroll(win[19]) > 0.0) & (bcast(win[19]) > 0.0)
    keep = keep & live
    keep = keep & ((aroll(win[17]) > 0.0) | (bcast(win[17]) > 0.0))

    if STAGE == 7:
        out_ref[:] = jnp.sum(keep.astype(jnp.float32), axis=0,
                             keepdims=True) + jnp.zeros((8, wtot))
        return

    def face_sat_sep(t, ra, rb, ha, hb):
        cabs = [[jnp.abs(ra[i] * rb[j] + ra[3 + i] * rb[3 + j]
                         + ra[6 + i] * rb[6 + j]) for j in range(3)]
                for i in range(3)]
        sep_best = None
        for i in range(3):
            ut = ra[i] * t[0] + ra[3 + i] * t[1] + ra[6 + i] * t[2]
            rad = (ha[i] + hb[0] * cabs[i][0] + hb[1] * cabs[i][1]
                   + hb[2] * cabs[i][2])
            s = jnp.abs(ut) - rad
            sep_best = s if sep_best is None else jnp.maximum(sep_best, s)
        for j in range(3):
            wt = rb[j] * t[0] + rb[3 + j] * t[1] + rb[6 + j] * t[2]
            rad = (hb[j] + ha[0] * cabs[0][j] + ha[1] * cabs[1][j]
                   + ha[2] * cabs[2][j])
            sep_best = jnp.maximum(sep_best, jnp.abs(wt) - rad)
        return sep_best

    t2 = tuple(bcast(pos3[c]) - aroll(pos3[c]) for c in range(3))
    ra2 = tuple(aroll(win[3 + k2]) for k2 in range(9))
    rb2 = tuple(bcast(win[3 + k2]) for k2 in range(9))
    ha2 = tuple(aroll(win[12 + c]) for c in range(3))
    hb2 = tuple(bcast(win[12 + c]) for c in range(3))
    keep = keep & (face_sat_sep(t2, ra2, rb2, ha2, hb2) < 0.0)
    keepf = keep.astype(jnp.float32)

    if STAGE == 8:
        out_ref[:] = jnp.sum(keepf, axis=0,
                             keepdims=True) + jnp.zeros((8, wtot))
        return

    la2 = (ii2 - dd).astype(jnp.float32)
    lb2 = ii2.astype(jnp.float32)

    def tiles128(m):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(m, j * 128, (j + 1) * 128, axis=1)
             for j in range(wtot // 128)], axis=0)

    def compact_pair_lanes(keepf, la2, lb2, out_cap):
        nsub = keepf.shape[0]
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
            sl = slot1[r0:r0 + cr].reshape(1, cwr).astype(jnp.int32)
            oht = (ohr[:, :cwr] == sl).astype(jnp.bfloat16)
            pay = jnp.stack([pay_a[r0:r0 + cr].reshape(1, cwr)[0],
                             pay_b[r0:r0 + cr].reshape(1, cwr)[0]])
            p_hi, p_lo = _split(pay)
            acc2 += jax.lax.dot_general(
                p_hi, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc2 += jax.lax.dot_general(
                p_lo, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dropped = jnp.maximum(jnp.sum(keepf) - jnp.float32(out_cap), 0.0)
        return (acc2[0].astype(jnp.int32) - 1,
                acc2[1].astype(jnp.int32) - 1, dropped)

    la, lb, dropped2 = compact_pair_lanes(
        tiles128(keepf), tiles128(la2), tiles128(lb2), CAP)

    if STAGE == 9:
        out_ref[:] = (jnp.broadcast_to(
            la.astype(jnp.float32)[None, :wtot], (8, wtot))
            + dropped2)
        return

    row = jax.lax.broadcasted_iota(jnp.int32, (wtot, CAP), 0)
    oh_a = (row == la[None, :]).astype(jnp.bfloat16)
    oh_b = (row == lb[None, :]).astype(jnp.bfloat16)

    def bgather(oh):
        g1 = jax.lax.dot_general(
            w_hi, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return g1 + jax.lax.dot_general(
            w_lo, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    ga = bgather(oh_a)
    gb = bgather(oh_b)
    out_ref[:] = jnp.broadcast_to(
        (jnp.sum(ga, axis=0) + jnp.sum(gb, axis=0))[None, :wtot],
        (8, wtot))


def main():
    rng = onp.random.default_rng(0)
    geom = rng.uniform(-1, 1, (24, NPAD)).astype(onp.float32)
    geom[19] = 1.0
    geom[17] = 1.0
    try:
        r = pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, WTOT), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((8, NB * WTOT), jnp.float32),
        )(jnp.asarray(geom))
        r = jax.device_get(r)
        log(f"stage{STAGE}: OK sum={r.sum():.1f}")
    except Exception as e:
        log(f"stage{STAGE}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
