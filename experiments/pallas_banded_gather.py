"""Prototype: banded one-hot gather from a VMEM-resident table in Pallas."""
import os, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C = 4096, 24576
TILE = 128          # contacts per grid step
W = 512             # band half-width
WTOT = 2 * W + TILE + 128  # window per tile (128-aligned slack)

rng = np.random.default_rng(0)
# banded indices: idx[i] within +/-W of (i / C * N)
base = (np.arange(C) * N // C)
idx_np = np.clip(base + rng.integers(-W, W, C), 0, N - 1).astype(np.int32)
# sorted by construction (roughly); table [16, N]
table_np = rng.standard_normal((16, N)).astype(np.float32)

NPAD = N + 2 * WTOT  # generous pad so window slices never clip


def kernel(base_ref, idx_ref, table_ref, out_ref):
    # base_ref: SMEM scalar prefetch [ntiles] window starts
    t = pl.program_id(0)
    start = pl.multiple_of(base_ref[t], 128)
    win = table_ref[:, pl.ds(start, WTOT)]          # [16, WTOT] from VMEM
    ii = idx_ref[0, 0, :]                            # [TILE] global indices
    local = ii - start                               # in [0, WTOT)
    # one-hot [TILE, WTOT] via iota compare, then MXU matmul
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, WTOT), 1)
    oh = (col == local[:, None]).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        win, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [16, TILE]


@jax.jit
def banded_gather(table, idx, bases):
    ntiles = C // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, TILE), lambda t, b: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full table
        ],
        out_specs=pl.BlockSpec((16, TILE), lambda t, b: (0, t)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
        grid_spec=grid_spec,
    )(bases, jnp.broadcast_to(idx.reshape(-1, 1, TILE), (C // TILE, 8, TILE)), table)


table = jnp.asarray(np.pad(table_np, ((0, 0), (0, NPAD - N))))
idx = jnp.asarray(idx_np)
ntiles = C // TILE
bases_np = np.clip(((idx_np.reshape(ntiles, TILE).min(axis=1) - W) // 128) * 128, 0, NPAD - WTOT)
bases = jnp.asarray(bases_np.astype(np.int32))

out = banded_gather(table, idx, bases)
ref = table_np[:, idx_np]
ok = np.allclose(np.asarray(out), ref)
print("banded pallas gather correct:", ok, flush=True)

# timing inside a scan (fresh dependence each iter via table+carry)
import time
def prog(tb, ii, bb):
    def body(carry, _):
        g = banded_gather(tb + carry, ii, bb)
        return carry + g[0, 0] * 1e-9, None
    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=50)
    return out
f = jax.jit(prog)
o = f(table, idx, bases); _ = float(o)
import time
t0 = time.perf_counter()
o = f(table + 1.0, idx, bases); _ = float(o)
print(f"banded gather: {(time.perf_counter()-t0)/50*1e6:.1f} us/call", flush=True)
