"""Standalone run of the REAL bucket_contact_table with bp_inkernel on
the attached TPU — isolates the compile crash from the full engine step.

Env: BR_N (bodies, default 1024), BR_STAGE (passed through to
ops/contact_table's CT_BP_DEBUG_STAGE early-exit gate, default off).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as onp

import jax
import jax.numpy as jnp

from physics_tpu.engine import prepare_contacts
from physics_tpu.ops.broadphase import body_aabbs, sweep_order
from physics_tpu.ops.contact_table import bucket_contact_table, unified_geom
from physics_tpu.scenes import box_pile, pile_config


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BR_N", "1024"))
    cfg = pile_config(n).replace(
        contact_iters=8, contact_solver="pallas_banded",
        bp_inkernel=True)
    state = prepare_contacts(box_pile(n), cfg)

    def f(state):
        order = sweep_order(state, body_aabbs(state))
        geom = unified_geom(state, cfg, order)
        table, meta, _ = bucket_contact_table(
            state, None, cfg, order, prev=None, geom=geom)
        return table, meta

    try:
        table, meta = jax.jit(f)(state)
        table = jax.device_get(table)
        meta = jax.device_get(meta)
        log(f"OK: active={table[9].sum():.0f} "
            f"dropped={meta[0].reshape(-1, 128)[:, 0].sum():.0f} "
            f"cap-drops={meta[0].reshape(-1, 128)[:, 2].sum():.0f} "
            f"win-ovf={meta[0].reshape(-1, 128)[:, 3].sum():.0f}")
    except Exception as e:
        log(f"FAIL {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
