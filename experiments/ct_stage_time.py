"""Time the fused contact-table kernel's internal stages on the 4k pile.

The kernel's cost is shape-static (every candidate slot runs the SAT
regardless of the active mask), so a freshly built pile gives the same
timing as a settled one. Stages (cumulative, CT_STAGES env, default all):

  gather   one-hot geometry window gathers only
  sat      + box_box_manifold_batched
  emit     + kk argmax/select/emit passes (production 128-slice emit)
  ground   + ground-contact block
  compact  + prefix-sum + transposed one-hot scatter (full kernel)
  warm     + in-kernel warm-start key matching

Each stage compiles a 120-iteration scan over the kernel and reports the
device-trace ms/step of the pallas_call line. Run on the attached TPU:

    PYTHONPATH=. python experiments/ct_stage_time.py
"""

import os
import sys
import tempfile
from functools import partial

import numpy as onp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from physics_tpu.config import SimConfig
from physics_tpu.maths import vec3c as v3
from physics_tpu.ops.boxbox_batched import (
    _CAP, _argmax_unrolled, _select, box_box_manifold_batched,
)
from physics_tpu.ops.broadphase import (
    body_aabbs, bucket_shape, pair_candidates, sweep_order,
)
from physics_tpu.ops.contact_table import (
    BLOCK, CT_ROWS, GEOM_ROWS, _BOX_SIGNS, _exclusive_prefix, _round_up,
    _split,
)
from physics_tpu.ops.contact_table import table_shape
from physics_tpu.scenes import box_pile, pile_config
from physics_tpu.state import SHAPE_BOX
from physics_tpu.utils.profiling import fence, summarize_trace, trace

STAGES = os.environ.get(
    "CT_STAGES", "gather,sat,emit,ground,compact,warm").split(",")
N = int(os.environ.get("CT_N", "4096"))
ITERS = 120


def make_staged_kernel(stage, cap, wtot, kk, kg, ccap, n, gh):
    """Production kernel truncated after `stage` (same ops, same emit)."""
    sub_pair = kk * (cap // 128)
    sub = sub_pair + kg
    chunk_rows = 4
    warm = stage == "warm"

    def kernel(la_ref, lb_ref, geom_ref, *refs):
        if warm:
            prev_ref, out_ref, meta_ref, warm_ref = refs
        else:
            (out_ref, meta_ref), prev_ref, warm_ref = refs, None, None
        b = pl.program_id(0)
        start = pl.multiple_of(b * BLOCK, 128)
        win = geom_ref[:, pl.ds(start, wtot)]
        w_hi, w_lo = _split(win)
        la = la_ref[0, 0, :]
        lb = lb_ref[0, 0, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (wtot, cap), 0)
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

        def bail(vecs):
            out_ref[:] = jnp.zeros((CT_ROWS, ccap), jnp.float32)
            w = min(cap, ccap)
            for s, vv in enumerate(vecs[:CT_ROWS]):
                out_ref[s, 0:w] = vv[:w]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)

        if stage == "gather":
            bail([ga[i] for i in range(8)] + [gb[i] for i in range(8)])
            return

        man = box_box_manifold_batched(
            (ga[0], ga[1], ga[2]), tuple(ga[3 + k] for k in range(9)),
            (ga[12], ga[13], ga[14]),
            (gb[0], gb[1], gb[2]), tuple(gb[3 + k] for k in range(9)),
            (gb[12], gb[13], gb[14]),
            mosaic=True,
        )
        if stage == "sat":
            bail(list(man.depth[:8]))
            return

        movable = (ga[17] > 0.0) | (gb[17] > 0.0)
        mu_p = jnp.sqrt(ga[15] * gb[15])
        rest_p = jnp.maximum(ga[16], gb[16])
        ia = ga[18].astype(jnp.int32)
        ib = gb[18].astype(jnp.int32)
        mn = jnp.minimum(ia, ib)
        mx = jnp.maximum(ia, ib)
        pair_base = (mn * n + mx) * _CAP

        big_neg = jnp.float32(-1e30)
        score = [
            jnp.where(man.valid[s] & movable, man.depth[s], big_neg)
            for s in range(_CAP)
        ]
        ra_p = (start + la).astype(jnp.float32)
        rb1_p = (start + lb + 1).astype(jnp.float32)
        live = (la >= 0).astype(jnp.float32)
        ra_p = ra_p * live
        rb1_p = rb1_p * live

        rows = [[] for _ in range(CT_ROWS)]

        def emit(ptx, pty, ptz, nx, ny, nz, d, act, mu, rest,
                 kl, kh, ksgn, ra, rb1):
            af = act.astype(jnp.float32)
            for r, v in enumerate([
                ptx, pty, ptz, nx, ny, nz, d, mu, rest, af,
                kl * af, kh * af, ksgn * af, ra * af, rb1 * af,
                jnp.zeros_like(af),
            ]):
                for j in range(v.shape[0] // 128):
                    rows[r].append(
                        jax.lax.slice_in_dim(v, j * 128, (j + 1) * 128))

        for _ in range(kk):
            best, bidx = _argmax_unrolled(score)
            act = best > 0.0
            pt = _select(bidx, man.points)
            key = pair_base + bidx
            kl = (key & 0xFFFF).astype(jnp.float32)
            kh = ((key >> 16) & 0x7FFF).astype(jnp.float32)
            emit(pt[0], pt[1], pt[2],
                 man.normal[0], man.normal[1], man.normal[2],
                 jnp.where(act, best, 0.0), act, mu_p, rest_p,
                 kl, kh, jnp.zeros_like(kl), ra_p, rb1_p)
            score = [
                jnp.where((bidx == jnp.int32(s)), big_neg, score[s])
                for s in range(_CAP)
            ]

        def bail_slices(slices):
            # post-emit rows hold [128]-wide lane slices
            out_ref[:] = jnp.zeros((CT_ROWS, ccap), jnp.float32)
            for s, vv in enumerate(slices[:CT_ROWS]):
                out_ref[s, 0:128] = vv
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)

        if stage == "emit":
            bail_slices(rows[6])
            return

        if kg > 0:
            gl = win[:, 0:BLOCK]
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
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)[0]
            body_id = gl[18].astype(jnp.int32)
            ra_g = (start + lane).astype(jnp.float32)
            one_g = jnp.ones((BLOCK,), jnp.float32)
            for _ in range(kg):
                best, bidx = _argmax_unrolled(gsc)
                act = best > 0.0
                pt = _select(bidx, pts_g)
                mag = body_id * 8 + bidx + 1
                kl = (mag & 0xFFFF).astype(jnp.float32)
                kh = ((mag >> 16) & 0x7FFF).astype(jnp.float32)
                emit(pt[0], pt[1], pt[2],
                     jnp.zeros_like(one_g), one_g, jnp.zeros_like(one_g),
                     jnp.where(act, best, 0.0), act, gl[15], gl[16],
                     kl, kh, one_g, ra_g, jnp.zeros_like(one_g))
                gsc = [
                    jnp.where((bidx == jnp.int32(s)), big_neg, gsc[s])
                    for s in range(8)
                ]

        if stage == "ground":
            bail_slices(rows[6])
            return

        pay2 = [jnp.stack(r) for r in rows]

        mask = pay2[9]
        slot = _exclusive_prefix(mask)
        slot = slot * mask + (1.0 - mask) * jnp.float32(ccap)

        acc = jnp.zeros((CT_ROWS, ccap), jnp.float32)
        oh_row = jax.lax.broadcasted_iota(
            jnp.int32, (ccap, chunk_rows * 128), 0)
        for r0 in range(0, sub, chunk_rows):
            cr = min(chunk_rows, sub - r0)
            cwr = cr * 128
            sl = slot[r0:r0 + cr].reshape(1, cwr).astype(jnp.int32)
            oht = (oh_row[:, :cwr] == sl).astype(jnp.bfloat16)
            pay = jnp.stack(
                [pay2[r][r0:r0 + cr].reshape(1, cwr)[0]
                 for r in range(CT_ROWS)])
            p_hi, p_lo = _split(pay)
            acc += jax.lax.dot_general(
                p_hi, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                p_lo, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

        if warm:
            ck = acc[10].reshape(1, ccap)
            ch = acc[11].reshape(1, ccap)
            cs = acc[12].reshape(1, ccap)
            ca = acc[9].reshape(1, ccap)
            lam0 = jnp.zeros((3, ccap), jnp.float32)
            for r0 in range(0, ccap, 128):
                pk = prev_ref[r0:r0 + 128, 0:1]
                ph = prev_ref[r0:r0 + 128, 1:2]
                ps = prev_ref[r0:r0 + 128, 2:3]
                pa = prev_ref[r0:r0 + 128, 3:4]
                eq = ((jnp.abs(pk - ck) < 0.5)
                      & (jnp.abs(ph - ch) < 0.5)
                      & (jnp.abs(ps - cs) < 0.5)
                      & (pa > 0.5) & (ca > 0.5))
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
        dropped = jnp.maximum(n_act - jnp.float32(ccap), 0.0)
        meta_ref[:] = at00 * dropped + at01 * n_act

    return kernel


def main():
    state = box_pile(N)
    cfg = pile_config(N)
    n = state.num_bodies
    block, cap, nb = bucket_shape(n, cfg)
    nbt, ccap, cp = table_shape(n, cfg)
    kk = min(cfg.max_contacts_per_pair, _CAP)
    kg = min(cfg.max_contacts_per_pair, 8) if cfg.ground_plane else 0
    wtot = _round_up(BLOCK + min(cfg.sweep_window, BLOCK), 128)
    npad = max(_round_up(n + wtot, 128), nbt * BLOCK + wtot)
    print(f"n={n} nb={nb} cap={cap} kk={kk} kg={kg} "
          f"sub={kk * (cap // 128) + kg} ccap={ccap} wtot={wtot}",
          flush=True)

    order = sweep_order(state, body_aabbs(state))
    cand = pair_candidates(state, cfg)
    movable = (state.inv_mass > 0.0).astype(jnp.float32)
    is_box = (state.shapes.stype == SHAPE_BOX).astype(jnp.float32)
    r9 = v3.quat_to_mat(state.quat)
    rows = jnp.stack(
        [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]]
        + list(r9)
        + [state.shapes.params[:, 0], state.shapes.params[:, 1],
           state.shapes.params[:, 2], state.shapes.friction,
           state.shapes.restitution, movable * is_box,
           jnp.arange(n, dtype=jnp.float32)]
        + [jnp.zeros((n,), jnp.float32)] * (GEOM_ROWS - 19)
    )[:, order]
    geom = jnp.zeros((GEOM_ROWS, npad), jnp.float32).at[:, :n].set(rows)

    p = cand.rank_a.shape[0]
    bucket_of = jnp.arange(p, dtype=jnp.int32) // cap
    base_per = bucket_of * BLOCK
    la = jnp.where(cand.mask, cand.rank_a - base_per, -1)
    lb = jnp.where(cand.mask, cand.rank_b - base_per, -1)
    la3 = jnp.broadcast_to(la.reshape(nb, 1, cap), (nb, 8, cap))
    lb3 = jnp.broadcast_to(lb.reshape(nb, 1, cap), (nb, 8, cap))
    pcols = jnp.zeros((cp, 8), jnp.float32)

    for stage in STAGES:
        warm = stage == "warm"
        kern = make_staged_kernel(stage, cap, wtot, kk, kg, ccap, n,
                                  cfg.ground_height)
        in_specs = [
            pl.BlockSpec((1, 8, cap), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 8, cap), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((CT_ROWS, ccap), lambda b: (0, b)),
            pl.BlockSpec((8, 128), lambda b: (0, b)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((CT_ROWS, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, nb * 128), jnp.float32),
        ]
        if warm:
            in_specs.append(pl.BlockSpec((ccap, 8), lambda b: (b, 0)))
            out_specs.append(pl.BlockSpec((8, ccap), lambda b: (0, b)))
            out_shape.append(jax.ShapeDtypeStruct((8, cp), jnp.float32))

        def one(g):
            ops = [la3, lb3, g] + ([pcols] if warm else [])
            res = pl.pallas_call(
                kern, grid=(nb,), in_specs=in_specs,
                out_specs=out_specs, out_shape=out_shape,
            )(*ops)
            return res[0]

        @jax.jit
        def run(g):
            def body(carry, _):
                out = one(g + carry * 1e-30)
                return jnp.sum(out[6]), None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return r

        fence(run(geom))
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                fence(run(geom))
            summ = summarize_trace(td, top=6)
        ms = 0.0
        for src, (t, cnt) in summ.items():
            if "pallas" in src or "ct_stage_time" in src:
                ms += t
        print(f"{stage:8s} {ms / ITERS:.4f} ms/step", flush=True)
        for src, (t, cnt) in list(summ.items())[:3]:
            print(f"    {t / ITERS:8.4f} x{cnt:<6} {src}", flush=True)


if __name__ == "__main__":
    main()
