"""Diagnose banded-gather slowness: is it per-tile table staging?

Grid over (sweeps, tiles) with the table as a kernel *input* vs table
copied once into VMEM *scratch* on the first grid step. Also: precision
fix via HIGHEST, and larger TILE.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

N, C = 4096, 24576
rng = np.random.default_rng(0)
table_np = rng.standard_normal((16, N)).astype(np.float32)


def build(TILE, W, precision, ohdtype, use_scratch):
    WTOT = 2 * W + TILE + 128
    NPAD = N + 2 * WTOT
    ntiles = C // TILE
    base = (np.arange(C) * N // C)
    idx_np = np.clip(base + rng.integers(-W, W, C), 0, N - 1).astype(np.int32)
    bases_np = np.clip(
        ((idx_np.reshape(ntiles, TILE).min(axis=1) - W) // 128) * 128,
        0, NPAD - WTOT).astype(np.int32)
    ref = table_np[:, idx_np]
    table = jnp.asarray(np.pad(table_np, ((0, 0), (0, NPAD - N))))
    idx3 = jnp.broadcast_to(
        jnp.asarray(idx_np).reshape(ntiles, 1, TILE), (ntiles, 8, TILE))
    bases = jnp.asarray(bases_np)

    def kern_scratch(base_ref, idx_ref, table_ref, out_ref, tab):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            tab[:] = table_ref[:]

        start = pl.multiple_of(base_ref[t], 128)
        win = tab[:, pl.ds(start, WTOT)]
        ii = idx_ref[0, 0, :]
        local = ii - start
        row = jax.lax.broadcasted_iota(jnp.int32, (WTOT, TILE), 0)
        oh = (row == local[None, :]).astype(ohdtype)
        out_ref[:] = jax.lax.dot_general(
            win, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def kern_plain(base_ref, idx_ref, table_ref, out_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(base_ref[t], 128)
        win = table_ref[:, pl.ds(start, WTOT)]
        ii = idx_ref[0, 0, :]
        local = ii - start
        row = jax.lax.broadcasted_iota(jnp.int32, (WTOT, TILE), 0)
        oh = (row == local[None, :]).astype(ohdtype)
        out_ref[:] = jax.lax.dot_general(
            win, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    kernel = kern_scratch if use_scratch else kern_plain
    scratch = [pltpu.VMEM((16, NPAD), jnp.float32)] if use_scratch else []

    @jax.jit
    def f(table, idx3, bases):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, 8, TILE), lambda t, b: (t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, TILE), lambda t, b: (0, t)),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
            grid_spec=grid_spec,
        )(bases, idx3, table)

    return f, (table, idx3, bases), ref


def bench(f, args, iters=50):
    def prog(tb, ii, bb):
        def body(carry, _):
            g = f(tb + carry, ii, bb)
            return carry + g[0, 0] * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out
    pf = jax.jit(prog)
    _ = float(pf(*args))
    t0 = time.perf_counter()
    _ = float(pf(args[0] + 1.0, *args[1:]))
    return (time.perf_counter() - t0) / iters * 1e6


P = jax.lax.Precision
for name, (TILE, W, prec, ohd, scr) in {
    "plain T128 bf16oh": (128, 512, P.DEFAULT, jnp.bfloat16, False),
    "plain T128 highest": (128, 512, P.HIGHEST, jnp.float32, False),
    "scratch T128 highest": (128, 512, P.HIGHEST, jnp.float32, True),
    "scratch T512 highest": (512, 512, P.HIGHEST, jnp.float32, True),
    "scratch T1024 highest": (1024, 512, P.HIGHEST, jnp.float32, True),
    "scratch T1024 bf16oh": (1024, 512, P.DEFAULT, jnp.bfloat16, True),
}.items():
    try:
        f, args, ref = build(TILE, W, prec, ohd, scr)
        out = np.asarray(f(*args))
        ok = np.array_equal(out, ref)
        close = np.allclose(out, ref, atol=1e-2)
        us = bench(f, args)
        print(f"{name}: exact={ok} close={close} {us:.1f} us", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
