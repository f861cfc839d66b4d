"""Fused multi-sweep banded Jacobi prototype.

Validates the structure of the planned contact-solve kernel:
  grid (sweeps, tiles); z table in VMEM scratch; per-sweep snapshot
  (tab_read <- tab_acc at t==0) for pure-Jacobi semantics; banded one-hot
  gathers/scatters via hi/lo-split bf16 MXU matmuls; lam state in scratch.
Simplified normal-only physics; correctness vs a pure-XLA replica.
"""
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
TILE = 1024
WTOT = 512
SWEEPS = 8
ntiles = C // TILE
NPAD = ((N + WTOT + 127) // 128) * 128

rng = np.random.default_rng(0)
# banded contacts: sorted by lo rank; rank-diff <= 44 (measured pile stats)
lo_r = np.sort(rng.integers(0, N - 45, C)).astype(np.int32)
d_r = rng.integers(1, 45, C).astype(np.int32)
a_np = lo_r
b_np = lo_r + d_r
ghost = rng.random(C) < 0.2          # ground-style contacts: no b endpoint
act_np = (rng.random(C) < 0.85).astype(np.float32)

bases_np = np.zeros(ntiles, np.int32)
for t in range(ntiles):
    mn = a_np[t*TILE:(t+1)*TILE].min()
    bases_np[t] = min(max((mn // 128) * 128, 0), NPAD - WTOT)
la_np = (a_np - bases_np.repeat(TILE)).astype(np.int32)
lb_np = np.where(ghost, -1, b_np - bases_np.repeat(TILE)).astype(np.int32)
assert la_np.max() < WTOT and lb_np.max() < WTOT

z0_np = np.zeros((16, NPAD), np.float32)
z0_np[:6, :N] = rng.standard_normal((6, N)).astype(np.float32)
# per-contact constants: nrm (3 rows), inv_k, target, relax*act
nrm_np = rng.standard_normal((3, C)).astype(np.float32)
nrm_np /= np.linalg.norm(nrm_np, axis=0, keepdims=True)
consts_np = np.concatenate([
    nrm_np,
    (1.0 / rng.uniform(1.0, 3.0, C)).astype(np.float32)[None],
    rng.uniform(-0.1, 0.1, C).astype(np.float32)[None],
    (0.25 * act_np)[None],
], 0)                                                   # [6, C]


def split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def kernel(base_ref, la_ref, lb_ref, consts_ref, z0_ref, zout_ref, lam_ref,
           tab_read, tab_acc, lam_s):
    s, t = pl.program_id(0), pl.program_id(1)

    @pl.when((s == 0) & (t == 0))
    def _():
        tab_acc[:] = z0_ref[:]

    @pl.when(t == 0)
    def _():
        tab_read[:] = tab_acc[:]

    @pl.when(s == 0)
    def _():
        lam_s[:, pl.ds(t * TILE, TILE)] = jnp.zeros((1, TILE), jnp.float32)

    start = pl.multiple_of(base_ref[t], 128)
    win = tab_read[:, pl.ds(start, WTOT)]                 # [16, WTOT]
    la = la_ref[0, 0, :]
    lb = lb_ref[0, 0, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (WTOT, TILE), 0)
    oh_a = (row == la[None, :]).astype(jnp.bfloat16)      # [WTOT, TILE]
    oh_b = (row == lb[None, :]).astype(jnp.bfloat16)
    w_hi, w_lo = split(win)

    def bgather(oh):
        g = jax.lax.dot_general(
            w_hi, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g += jax.lax.dot_general(
            w_lo, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return g                                           # [16, TILE]

    ga = bgather(oh_a)
    gb = bgather(oh_b)                                     # ghost: all-zero col

    cs = consts_ref[:]                                     # [6, TILE]
    nx, ny, nz_ = cs[0], cs[1], cs[2]
    inv_k, target, relax = cs[3], cs[4], cs[5]

    # v_n = n . (va - vb) using rows 0:3 (vel); omega rows ignored (toy)
    vx = ga[0] - gb[0]
    vy = ga[1] - gb[1]
    vz = ga[2] - gb[2]
    v_n = nx * vx + ny * vy + nz_ * vz
    lam = lam_s[0, pl.ds(t * TILE, TILE)]
    d = (target - v_n) * inv_k * relax
    lam_new = jnp.maximum(lam + d, 0.0)
    dl = lam_new - lam
    lam_s[0, pl.ds(t * TILE, TILE)] = lam_new
    lam_ref[0, :] = lam_new

    # contrib rows: +n*dl at a (rows 0:3), -n*dl at b
    zero = jnp.zeros((TILE,), jnp.float32)
    ca = jnp.stack([nx * dl, ny * dl, nz_ * dl] + [zero] * 13)   # [16, TILE]
    cb = jnp.stack([-nx * dl, -ny * dl, -nz_ * dl] + [zero] * 13)

    def bscatter(contrib, oh):
        c_hi, c_lo = split(contrib)
        d1 = jax.lax.dot_general(
            c_hi, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [16, WTOT]
        d1 += jax.lax.dot_general(
            c_lo, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return d1

    delta = bscatter(ca, oh_a) + bscatter(cb, oh_b)
    tab_acc[:, pl.ds(start, WTOT)] += delta

    @pl.when((s == SWEEPS - 1) & (t == ntiles - 1))
    def _():
        zout_ref[:] = tab_acc[:]


@jax.jit
def fused(bases, la3, lb3, consts, z0):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(SWEEPS, ntiles),
        in_specs=[
            pl.BlockSpec((1, 8, TILE), lambda s, t, b: (t, 0, 0)),
            pl.BlockSpec((1, 8, TILE), lambda s, t, b: (t, 0, 0)),
            pl.BlockSpec((6, TILE), lambda s, t, b: (0, t)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda s, t, b: (0, t)),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, NPAD), jnp.float32),
            pltpu.VMEM((16, NPAD), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((16, NPAD), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(bases, la3, lb3, consts, z0)


def xla_replica(z0, a, b, ghost, consts):
    nx, ny, nz_, inv_k, target, relax = consts
    hasb = (~ghost).astype(np.float32)
    z = jnp.asarray(z0[:6, :N])
    lam = jnp.zeros((C,), jnp.float32)
    aj = jnp.asarray(a)
    bj = jnp.asarray(np.where(ghost, 0, b))
    for s in range(SWEEPS):
        ga = z[:, aj]
        gb = z[:, bj] * hasb[None]
        v_n = (nx * (ga[0] - gb[0]) + ny * (ga[1] - gb[1])
               + nz_ * (ga[2] - gb[2]))
        lam_new = jnp.maximum(lam + (target - v_n) * inv_k * relax, 0.0)
        dl = lam_new - lam
        lam = lam_new
        contrib_a = jnp.stack([nx * dl, ny * dl, nz_ * dl])
        seg_b = jnp.asarray(np.where(ghost, N, b))
        z = z.at[:, aj].add(contrib_a).at[:3 if False else slice(None), :]\
            if False else z
        znew = jnp.zeros((6, N + 1), jnp.float32)
        znew = znew.at[:3, aj].add(contrib_a)
        znew = znew.at[:3, seg_b].add(-contrib_a)
        z = z + znew[:, :N]
    return z, lam


bases = jnp.asarray(bases_np)
la3 = jnp.broadcast_to(jnp.asarray(la_np).reshape(ntiles, 1, TILE),
                       (ntiles, 8, TILE))
lb3 = jnp.broadcast_to(jnp.asarray(lb_np).reshape(ntiles, 1, TILE),
                       (ntiles, 8, TILE))
consts = jnp.asarray(consts_np)
z0 = jnp.asarray(z0_np)

zout, lam_out = fused(bases, la3, lb3, consts, z0)
zref, lamref = xla_replica(z0_np, a_np, b_np, ghost, consts_np)
zo = np.asarray(zout)[:6, :N]
zr = np.asarray(zref)
lerr = np.abs(np.asarray(lam_out)[0] - np.asarray(lamref)).max()
zerr = np.abs(zo - zr).max()
rel = zerr / max(np.abs(zr).max(), 1e-9)
print(f"z err {zerr:.3e} (rel {rel:.2e}), lam err {lerr:.3e}", flush=True)

# perf: scan of 30 solves
@jax.jit
def prog(z0, bases, la3, lb3, consts):
    def body(carry, _):
        zo, lo = fused(bases, la3, lb3, consts, z0 + carry)
        return carry + zo[0, 0] * 1e-9 + lo[0, 0] * 1e-9, None
    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=30)
    return out

_ = fence(prog(z0, bases, la3, lb3, consts))
tdir = "/tmp/trace_fused"
with trace(tdir):
    _ = fence(prog(z0 + 1.0, bases, la3, lb3, consts))
summ = summarize_trace(tdir, top=6)
tot = sum(ms for ms, _ in summ.values())
print(f"device {tot/30*1000:.1f} us per 8-sweep solve", flush=True)
for src, (ms, cnt) in summ.items():
    print(f"  {ms:8.3f} ms x{cnt:4d} {src[:80]}")
