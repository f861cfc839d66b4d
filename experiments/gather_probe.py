"""Probe: does this jaxlib's Mosaic lower a dynamic lane gather inside a
TPU Pallas kernel?

docs/PERFORMANCE.md (round 2) recorded that wide `take`/`take_along_axis`
in-kernel crashed the remote compile helper, which forced the one-hot-
matmul movement engine in the banded solve. The one-hot's [wtot, tile]
area is the solve kernel's dominant per-sweep cost term, so a working
native gather would change the solver's cost model entirely — re-probe
on every jaxlib upgrade.

Run on the TPU: python experiments/gather_probe.py
Prints one line per variant: OK <checksum> or the exception class.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WTOT, TILE, ROWS = 256, 768, 16


def _run(name, kernel):
    win = jnp.asarray(
        np.random.default_rng(0).standard_normal((ROWS, WTOT)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, WTOT, (8, TILE)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, TILE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(win, idx)
        out.block_until_ready()
        ref = np.asarray(win)[:, np.asarray(idx)[0]]
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: OK match={ok} sum={float(jnp.sum(out)):.3f}",
              flush=True)
    except Exception as e:  # noqa: BLE001 — probe reports and continues
        print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def k_take(win_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(win_ref[:], idx_ref[0, :], axis=1)


def k_fancy(win_ref, idx_ref, out_ref):
    out_ref[:] = win_ref[:][:, idx_ref[0, :]]


def k_take_along(win_ref, idx_ref, out_ref):
    idx = jnp.broadcast_to(idx_ref[0, :][None, :], (ROWS, TILE))
    out_ref[:] = jnp.take_along_axis(win_ref[:], idx, axis=1)


def k_dyn_gather(win_ref, idx_ref, out_ref):
    # pltpu dynamic-gather primitive, if present in this jaxlib
    out_ref[:] = pltpu.dynamic_gather(  # type: ignore[attr-defined]
        win_ref[:], idx_ref[0, :], axis=1)


def main():
    print("jax", jax.__version__, "backend", jax.default_backend(),
          flush=True)
    _run("take", k_take)
    _run("fancy-index", k_fancy)
    _run("take_along_axis", k_take_along)
    if hasattr(pltpu, "dynamic_gather"):
        _run("pltpu.dynamic_gather", k_dyn_gather)
    else:
        print("pltpu.dynamic_gather: not in this jaxlib", flush=True)


if __name__ == "__main__":
    main()
