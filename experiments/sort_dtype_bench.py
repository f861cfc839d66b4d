#!/usr/bin/env python
"""A/B the bucketed candidate compaction sort dtype on TPU.

MEASURED (v5e, 2026-08-20): uint32 265.6 us/sort vs uint16 262.2 us/sort
at [32, 6144] -- a ~1% non-win. The TPU sort is not bandwidth-bound at
this shape, so the uint16 key packing was NOT adopted in broadphase.py.

The broad phase's per-bucket compaction is ONE segmented single-operand
sort over [n_blocks, block*k] (uint32: mask in bit 31, slot index low
bits). At pile shapes that is [32, 6144] — 0.138 ms/step of the 0.885 ms
4k-pile step. block*k = 6144 fits in 13 bits, so the same key packs into
uint16 (mask in bit 15) at half the bytes. This measures whether the TPU
sort actually gets faster.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def fence(a):
    return float(jax.device_get(jnp.sum(a.astype(jnp.float32))))


def bench(dtype, nb=32, width=6144, iters=200):
    rng = np.random.default_rng(0)
    mask = rng.random((nb, width)) < 0.15
    slot = np.broadcast_to(np.arange(width, dtype=np.uint32), (nb, width))
    hi_bit = {jnp.uint32: np.uint32(1 << 31),
              jnp.uint16: np.uint16(1 << 15)}[dtype]
    key = np.where(mask, slot, slot | np.uint32(hi_bit)).astype(
        {jnp.uint32: np.uint32, jnp.uint16: np.uint16}[dtype])
    x = jnp.asarray(key)

    @partial(jax.jit, donate_argnums=0)
    def run(k):
        def body(k2, _):
            s = jax.lax.sort(k2, dimension=1)
            # feed back a lane-rolled xor of the output so each iteration
            # sorts genuinely unsorted data (sorting already-sorted keys
            # would understate cost if the TPU sort were data-dependent)
            return jnp.roll(s ^ jnp.asarray(0x55, s.dtype), width // 3,
                            axis=1), None
        out, _ = jax.lax.scan(body, k, None, length=iters)
        return out

    out = run(x)
    fence(out)
    t0 = time.perf_counter()
    out = run(out)
    fence(out)
    dt = time.perf_counter() - t0
    print(f"{np.dtype(out.dtype).name}: {dt / iters * 1e6:.1f} us/sort "
          f"([{nb}, {width}])", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    bench(jnp.uint32)
    bench(jnp.uint16)
