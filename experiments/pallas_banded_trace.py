"""Device-trace the banded Pallas gather variants: where does time go?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from physics_tpu.utils.profiling import trace, summarize_trace, fence

print("backend:", jax.default_backend(), flush=True)

N, C = 4096, 24576
rng = np.random.default_rng(0)
table_np = rng.standard_normal((16, N)).astype(np.float32)
P = jax.lax.Precision


def build(TILE, W, precision, ohdtype):
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

    def kernel(base_ref, idx_ref, table_ref, out_ref, tab):
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
            scratch_shapes=[pltpu.VMEM((16, NPAD), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
            grid_spec=grid_spec,
        )(bases, idx3, table)

    return f, (table, idx3, bases), ref


def scan50(f, args):
    @jax.jit
    def prog(tb, ii, bb):
        def body(carry, _):
            g = f(tb + carry, ii, bb)
            return carry + g[0, 0] * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=50)
        return out
    return prog


variants = {
    "T128_HI": (128, 512, P.HIGHEST, jnp.float32),
    "T1024_HI": (1024, 512, P.HIGHEST, jnp.float32),
    "T1024_BF": (1024, 512, P.DEFAULT, jnp.bfloat16),
}
for name, cfgv in variants.items():
    f, args, ref = build(*cfgv)
    out = np.asarray(f(*args))
    err = np.abs(out - ref).max()
    prog = scan50(f, args)
    _ = fence(prog(*args))
    tdir = f"/tmp/trace_{name}"
    with trace(tdir):
        _ = fence(prog(args[0] + 1.0, *args[1:]))
    summ = summarize_trace(tdir, top=8)
    tot = sum(ms for ms, _ in summ.values())
    print(f"--- {name}: max_err={err:.2e} device_total={tot:.2f} ms over 50 iters"
          f" -> {tot/50*1000:.1f} us/call", flush=True)
    for src, (ms, cnt) in summ.items():
        print(f"    {ms:8.3f} ms  x{cnt:4d}  {src[:90]}")
