"""Prototype: in-kernel per-bucket contact compaction (Mosaic primitives).

Goal (docs/ROADMAP.md round-2 item 1): inside one Pallas grid step, given
an activity mask over m potential contacts (laid out [SUB, 128]) and
payload rows [R, SUB, 128], write the active contacts' payloads compacted
to the first slots of a [R, ccap] output, preserving order — without
cumsum (unsupported), bool where (crashes), or gather/scatter primitives.

Building blocks validated here:
  1. exclusive prefix-sum of the mask via two triangular matmuls
     (within-row over lanes, then row-offset over sublane totals),
     precision=HIGHEST so counts are exact in f32;
  2. [SUB, 128] -> [1, SUB*128] flatten (sublanes into lanes);
  3. chunked one-hot scatter: oh[j, slot_j] contracted against the
     payload with hi/lo bf16 splits (exact to ~2^-19 relative; integer
     rows < 2^16 exact).

Run CPU (interpret): python experiments/compact_proto.py
Run TPU (mosaic):    PROTO_TPU=1 python experiments/compact_proto.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PROTO_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def exclusive_prefix(mask):
    """mask [SUB, 128] f32 0/1 -> exclusive prefix counts [SUB, 128],
    row-major order (j = r*128 + c), via triangular matmuls."""
    sub = mask.shape[0]
    # strict lower-tri over lanes: T[c', c] = 1 if c' < c
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    t_l = (ci < cj).astype(jnp.float32)
    within = jax.lax.dot_general(
        mask, t_l, (((1,), (0,)), ((), ())), precision=HIGHEST)  # [SUB,128]
    totals = jnp.sum(mask, axis=1, keepdims=True)                # [SUB,1]
    # row offsets: strict lower-tri over sublanes, via [1,SUB]@[SUB,SUB]
    ri = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    t_r = (ri < rj).astype(jnp.float32)
    offs = jax.lax.dot_general(
        totals.reshape(1, sub), t_r, (((1,), (0,)), ((), ())),
        precision=HIGHEST)                                       # [1, SUB]
    return within + offs.reshape(sub, 1)


def make_kernel(rp, sub, ccap, chunk_rows):
    """Compaction kernel: (mask [SUB,128], payload [RP, SUB*128]) ->
    (out [RP, ccap], meta [8, 128] with meta[0,0]=n_active)."""

    def kernel(mask_ref, pay_ref, out_ref, meta_ref):
        mask = mask_ref[:]                                # [SUB, 128]
        slot = exclusive_prefix(mask)                     # [SUB, 128]
        # inactive -> slot ccap (out of range of every one-hot column)
        slot = slot * mask + (1.0 - mask) * jnp.float32(ccap)

        acc = jnp.zeros((rp, ccap), jnp.float32)
        cw = chunk_rows * 128
        # transposed one-hot: Mosaic accepts the sublanes->lanes flatten
        # [CR,128]->[1,CW] but not a lane-vector -> column reshape
        oh_row = jax.lax.broadcasted_iota(jnp.int32, (ccap, cw), 0)
        for r0 in range(0, sub, chunk_rows):
            sl = slot[r0:r0 + chunk_rows]                 # [CR, 128]
            sl_i = sl.reshape(1, cw).astype(jnp.int32)    # sublanes->lanes
            oht = (oh_row == sl_i).astype(jnp.bfloat16)   # [ccap, CW]
            pay = pay_ref[:, r0 * 128:(r0 + chunk_rows) * 128]  # [RP, CW]
            p_hi, p_lo = _split(pay)
            acc += jax.lax.dot_general(
                p_hi, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                p_lo, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc
        meta = jnp.zeros((8, 128), jnp.float32)
        n_act = jnp.sum(mask)
        meta_ref[:] = meta + n_act * (
            (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        ).astype(jnp.float32)

    return kernel


def run(sub=20, rp=16, ccap=768, chunk_rows=4, seed=0, density=0.3,
        interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = sub * 128
    rng = np.random.default_rng(seed)
    mask = (rng.uniform(size=(sub, 128)) < density).astype(np.float32)
    pay = rng.uniform(-2, 2, (rp, m)).astype(np.float32) * 100
    # integer rows to check exactness through the hi/lo split
    pay[0] = rng.integers(0, 1 << 16, m).astype(np.float32)
    pay[1] = rng.integers(0, 256, m).astype(np.float32)

    fn = pl.pallas_call(
        make_kernel(rp, sub, ccap, chunk_rows),
        out_shape=[
            jax.ShapeDtypeStruct((rp, ccap), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )
    out, meta = jax.jit(fn)(jnp.asarray(mask), jnp.asarray(pay))
    out = np.asarray(out)
    n_act = int(np.asarray(meta)[0, 0])

    # numpy oracle
    flat_mask = mask.reshape(-1).astype(bool)
    exp = np.zeros((rp, ccap), np.float32)
    js = np.nonzero(flat_mask)[0]
    for slot_i, j in enumerate(js[:ccap]):
        exp[:, slot_i] = pay[:, j]
    assert n_act == flat_mask.sum(), (n_act, flat_mask.sum())
    n_keep = min(len(js), ccap)
    err_int = np.abs(out[:2, :n_keep] - exp[:2, :n_keep]).max() if n_keep else 0
    err_f = np.abs(out[2:, :n_keep] - exp[2:, :n_keep]).max() if n_keep else 0
    rel = err_f / (np.abs(exp[2:, :n_keep]).max() + 1e-9)
    tail = np.abs(out[:, n_keep:]).max() if n_keep < ccap else 0.0
    print(f"sub={sub} density={density}: kept {n_keep}/{flat_mask.sum()} "
          f"int_err={err_int} f32_rel={rel:.2e} tail={tail}")
    assert err_int == 0.0
    assert rel < 1e-5
    assert tail == 0.0
    return True


if __name__ == "__main__":
    import time

    for dens in (0.1, 0.3, 0.9):
        run(density=dens)
    # overflow case: more actives than ccap
    run(ccap=256, density=0.9)
    if os.environ.get("PROTO_TPU") == "1":
        # timing: realistic shape (cap 512*4 + ground 512 = 20 sublanes)
        f = None
        x = (jnp.asarray(np.random.uniform(size=(20, 128)) < 0.3,
                         ).astype(jnp.float32),
             jnp.asarray(np.random.uniform(-2, 2, (16, 2560))
                         .astype(np.float32)))
        fn = pl.pallas_call(
            make_kernel(16, 20, 768, 4),
            out_shape=[jax.ShapeDtypeStruct((16, 768), jnp.float32),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            interpret=False,
        )
        jf = jax.jit(fn)
        out = jf(*x)
        float(jax.device_get(jnp.sum(out[0])))
        t0 = time.perf_counter()
        for _ in range(50):
            out = jf(*x)
        float(jax.device_get(jnp.sum(out[0])))
        print(f"TPU wall per call (incl dispatch): "
              f"{(time.perf_counter() - t0) / 50 * 1e6:.0f} us")
    print("COMPACT PROTO OK")
