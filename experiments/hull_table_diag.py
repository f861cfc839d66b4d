#!/usr/bin/env python
"""Decode hull_table parity mismatches to body RANKS (multi-bucket hunt).

Runs the same A/B as hull_table_parity.py at N bodies, then decodes every
mismatched / high-error key to (body_a, body_b, slot) or (body, vertex)
and prints the bodies' sweep ranks — if mismatches cluster at rank >= 128
or at window boundaries, the kernel's bucket-local window gather is the
bug. Usage: N=160 STEPS=3 python experiments/hull_table_diag.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n = int(os.environ.get("N", "160"))
    steps = int(os.environ.get("STEPS", "3"))
    from physics_tpu.engine import prepare_contacts, step
    from physics_tpu.ops.broadphase import body_aabbs, pair_candidates, sweep_order
    from physics_tpu.ops.contact_table import CT_D, table_keys_scalar, unified_geom
    from physics_tpu.ops.hull_table import bucket_hull_contact_table, hull_dims
    from physics_tpu.ops.narrowphase import (
        _ground_contacts_hulls_fast,
        _pair_contacts_hulls_fast,
        hull_obb_prefilter,
    )
    from physics_tpu.scenes import mesh_rain, rain_xla_config
    from physics_tpu.solver.contacts import concat_contacts

    state = mesh_rain(n)
    cfg_x = rain_xla_config(n)
    cfg_t = cfg_x.replace(pair_buckets=True, bucket_block=128,
                          contact_table=True, hull_table=True,
                          bucket_cap2=512)

    state = prepare_contacts(state, cfg_x)
    stepj = jax.jit(step, static_argnums=1)
    for _ in range(steps):
        state = stepj(state, cfg_x)

    dm = hull_dims(state.hulls)
    S = 2 * dm.e + 1
    vcap = dm.vcap

    def decode(k):
        if k < 0:
            q = -k - 1
            return ("G", q // vcap, q % vcap)          # body, vertex
        slot = k % S
        q = k // S
        return ("P", q // n, q % n, slot)              # min body, max body

    # path A
    cand = pair_candidates(state, cfg_x)
    cand, _ = hull_obb_prefilter(state, cand, cfg_x.hull_prefilter_cap)
    pc = _pair_contacts_hulls_fast(state, cand, cfg_x)
    gc = _ground_contacts_hulls_fast(state, cfg_x)
    ca = concat_contacts(gc, pc)
    act_a = np.asarray(ca.active) & (np.asarray(ca.key) != 0)
    ka = np.asarray(ca.key)[act_a]
    da = np.asarray(ca.depth)[act_a]

    # path B
    order = sweep_order(state, body_aabbs(state))
    geom = unified_geom(state, cfg_t, order, hulls=True)
    cand_b = pair_candidates(state, cfg_t)
    table, meta, _ = bucket_hull_contact_table(
        state, cand_b, cfg_t, order, prev=None, geom=geom)
    from physics_tpu.ops.hull_table import hull_slots
    keys_b = np.asarray(table_keys_scalar(
        table, n, hull_slots(state.hulls), state.hulls.verts.shape[1]))
    act_b = keys_b != 0
    kb = keys_b[act_b]
    db = np.asarray(table)[CT_D][act_b]

    rank_of = np.empty(n, np.int32)
    rank_of[np.asarray(order)] = np.arange(n, dtype=np.int32)

    sa, sb = set(ka.tolist()), set(kb.tolist())
    # duplicate feature keys would silently collapse in the dicts below
    # (last index wins) and misattribute |Δdepth| — exactly the class of
    # defect this diagnostic hunts; fail loudly like hull_table_parity.py
    assert len(ka) == len(sa), f"path A has {len(ka) - len(sa)} dup keys"
    assert len(kb) == len(sb), f"path B has {len(kb) - len(sb)} dup keys"
    ia = {k: i for i, k in enumerate(ka.tolist())}
    ib = {k: i for i, k in enumerate(kb.tolist())}

    def show(tag, keys):
        for k in keys:
            d = decode(k)
            if d[0] == "G":
                print(f"  {tag} G body={d[1]} rank={rank_of[d[1]]} "
                      f"v={d[2]}")
            else:
                ra, rbk = rank_of[d[1]], rank_of[d[2]]
                print(f"  {tag} P bodies=({d[1]},{d[2]}) "
                      f"ranks=({ra},{rbk}) span={abs(int(ra)-int(rbk))} "
                      f"slot={d[3]}")

    print(f"N={n} nb={-(-n // 128)}  A={ka.size} B={kb.size}")
    show("only-A", sorted(sa - sb)[:20])
    show("only-B", sorted(sb - sa)[:20])
    bad = [(abs(da[ia[k]] - db[ib[k]]), k) for k in (sa & sb)]
    bad.sort(reverse=True)
    print("worst common |Δdepth|:")
    for e, k in bad[:15]:
        print(f"  dd={e:.3e}", end="")
        show("", [k])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
