"""Bisect the Mosaic crash in ops/contact_table._make_ct_kernel on TPU.

Stages (CT_STAGE env):
  1 gather-only: one-hot gathers of the geometry window, write raw rows
  2 + SAT manifold + emit of pair rows
  3 + ground-contact block
  4 + compaction (prefix + transposed one-hot scatter)
  5 full kernel (meta too) == bucket_contact_table
"""

import os
import sys

import numpy as onp
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physics_tpu.config import SimConfig
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder
from physics_tpu.ops.boxbox_batched import (
    _CAP, _argmax_unrolled, _select, box_box_manifold_batched,
)
from physics_tpu.ops.contact_table import (
    BLOCK, CT_ROWS, GEOM_ROWS, _exclusive_prefix, _round_up, _split,
    _BOX_SIGNS,
)

STAGE = int(os.environ.get("CT_STAGE", "5"))


def make_kernel(cap, wtot, kk, kg, ccap, n, gh):
    sub_pair = kk * (cap // 128)
    sub = sub_pair + kg
    chunk_rows = 4

    def kernel(la_ref, lb_ref, geom_ref, out_ref, meta_ref):
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

        if STAGE == 1:
            w = min(cap, ccap)
            out_ref[:] = jnp.zeros((CT_ROWS, ccap), jnp.float32)
            out_ref[:8, 0:w] = ga[:8, :w]
            out_ref[8:16, 0:w] = gb[:8, :w]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        man = box_box_manifold_batched(
            (ga[0], ga[1], ga[2]), tuple(ga[3 + k] for k in range(9)),
            (ga[12], ga[13], ga[14]),
            (gb[0], gb[1], gb[2]), tuple(gb[3 + k] for k in range(9)),
            (gb[12], gb[13], gb[14]),
            mosaic=True,
        )
        if STAGE == 15:
            # SAT only: write depth rows via static ref slices
            out_ref[:] = jnp.zeros((CT_ROWS, ccap), jnp.float32)
            w = min(cap, ccap)
            for s in range(min(_CAP, CT_ROWS)):
                out_ref[s, 0:w] = man.depth[s][:w]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
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
                rows[r].append(v)

        for _ in range(kk):
            best, bidx = _argmax_unrolled(score)
            act = best > 0.0
            pt = _select(bidx, man.points)
            if STAGE == 16:
                kl = jnp.zeros_like(best)
                kh = kl
            else:
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
        if STAGE in (16, 17):
            # pair emit only; write each group's depth row via ref slices
            # (rows[6] holds the kk depth vectors) — NO concat
            out_ref[:] = jnp.zeros((CT_ROWS, ccap), jnp.float32)
            w = min(cap, ccap)
            for g in range(min(kk, CT_ROWS)):
                out_ref[g, 0:w] = rows[6][g][:w]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return
        if STAGE == 18:
            # pair rows only + the 1-D lane concat (suspected crasher)
            payload = jnp.stack([jnp.concatenate(r) for r in rows])
            out_ref[:] = payload[:, :ccap]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        if STAGE >= 3 and kg > 0:
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
        else:
            # pad to full sub with zeros so shapes stay constant
            for _ in range(kg):
                z = jnp.zeros((BLOCK,), jnp.float32)
                emit(z, z, z, z, z, z, z, z > 1.0, z, z, z, z, z, z, z)

        payload = jnp.stack([jnp.concatenate(r) for r in rows])

        if STAGE < 4:
            out_ref[:] = payload[:, :ccap]
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        mask = payload[9].reshape(sub, 128)
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
            pay = payload[:, r0 * 128:r0 * 128 + cwr]
            p_hi, p_lo = _split(pay)
            acc += jax.lax.dot_general(
                p_hi, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                p_lo, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

        if STAGE < 5:
            meta_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        n_act = jnp.sum(mask)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        at00 = ((r_i == 0) & (c_i == 0)).astype(jnp.float32)
        at01 = ((r_i == 0) & (c_i == 1)).astype(jnp.float32)
        dropped = jnp.maximum(n_act - jnp.float32(ccap), 0.0)
        meta_ref[:] = at00 * dropped + at01 * n_act

    return kernel


def main():
    from physics_tpu.ops.broadphase import (
        body_aabbs, bucket_shape, pair_candidates, sweep_order,
    )
    from physics_tpu.maths import vec3c as v3
    from physics_tpu.state import SHAPE_BOX
    from physics_tpu.ops.contact_table import table_shape

    rng = onp.random.default_rng(3)
    b = SceneBuilder()
    for k in range(24):
        base = onp.array([(k % 4) * 8.0, 0.5, 0.0])
        i = b.add_body(pos=base + rng.uniform(-0.6, 0.6, 3),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
    state = b.build()
    cfg = SimConfig(
        ground_plane=True, pair_collisions=True, boxes_only=True,
        broadphase="sweep", sweep_window=12, pair_buckets=True,
        bucket_block=128, contact_solver="pallas_banded",
        contact_table=True, contact_iters=8, max_contacts=512,
    )

    n = state.num_bodies
    block, cap, nb = bucket_shape(n, cfg)
    nbt, ccap, cp = table_shape(n, cfg)
    kk = min(cfg.max_contacts_per_pair, _CAP)
    kg = min(cfg.max_contacts_per_pair, 8) if cfg.ground_plane else 0
    wtot = _round_up(BLOCK + min(cfg.sweep_window, BLOCK), 128)
    npad = max(_round_up(n + wtot, 128), nbt * BLOCK + wtot)
    print(f"stage={STAGE} cap={cap} kk={kk} kg={kg} sub={kk*(cap//128)+kg} "
          f"ccap={ccap} wtot={wtot} npad={npad}")

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
    )
    rows = rows[:, order]
    geom = jnp.zeros((GEOM_ROWS, npad), jnp.float32).at[:, :n].set(rows)

    p = cand.rank_a.shape[0]
    bucket_of = jnp.arange(p, dtype=jnp.int32) // cap
    base_per = bucket_of * BLOCK
    la = jnp.where(cand.mask, cand.rank_a - base_per, -1)
    lb = jnp.where(cand.mask, cand.rank_b - base_per, -1)
    la3 = jnp.broadcast_to(la.reshape(nbt, 1, cap), (nbt, 8, cap))
    lb3 = jnp.broadcast_to(lb.reshape(nbt, 1, cap), (nbt, 8, cap))

    kernel = make_kernel(cap, wtot, kk, kg, ccap, n, cfg.ground_height)
    out, meta = pl.pallas_call(
        kernel,
        grid=(nbt,),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, 8, cap), lambda bb: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT_ROWS, ccap), lambda bb: (0, bb)),
            pl.BlockSpec((8, 128), lambda bb: (0, bb)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((CT_ROWS, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, nbt * 128), jnp.float32),
        ],
    )(la3, lb3, geom)
    out.block_until_ready()
    print("OK stage", STAGE, "active:",
          float(jnp.sum((out[9] > 0).astype(jnp.float32))))


if __name__ == "__main__":
    main()
