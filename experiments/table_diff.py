"""Differential debug: fused contact table vs the established narrow-phase
path on the same state. Matches contacts by feature key and compares
point/normal/depth/friction fields, then compares solve outputs."""

import os

import numpy as np
import jax

if os.environ.get("TABLE_DIFF_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder


def cluster_state(n=24, seed=3, spacing=8.0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for k in range(n):
        cluster = k % 4
        base = np.array([cluster * spacing, 0.5, 0.0])
        i = b.add_body(pos=base + rng.uniform(-0.6, 0.6, 3),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
    return b.build()


CFG_TABLE = SimConfig(
    ground_plane=True, pair_collisions=True, boxes_only=True,
    broadphase="sweep", sweep_window=12, pair_buckets=True,
    bucket_block=128, contact_solver="pallas_banded", contact_table=True,
    contact_iters=8, max_contacts=512,
)


def main():
    from physics_tpu.ops.broadphase import body_aabbs, sweep_order
    from physics_tpu.ops.broadphase import pair_candidates
    from physics_tpu.ops.narrowphase import (
        concat_contacts, convex_data, ground_contacts, pair_contacts,
    )
    from physics_tpu.ops.contact_table import (
        CT_ACT, CT_D, CT_MU, CT_N, CT_PT, CT_RA, CT_RB1, CT_REST,
        bucket_contact_table, table_keys_scalar, table_shape,
    )

    state = cluster_state(24)
    cfg_t = CFG_TABLE
    cfg_np = cfg_t.replace(contact_table=False, bucket_block=8,
                           bucket_cap=128, pallas_tile=128,
                           pallas_window=128)

    # --- table path geometry ---
    order = sweep_order(state, body_aabbs(state))
    cand = pair_candidates(state, cfg_t)
    table, meta, _ = bucket_contact_table(state, cand, cfg_t, order)
    keys_t = np.asarray(table_keys_scalar(table, state.num_bodies, 8, 8))
    act_t = np.asarray(table[CT_ACT]) > 0
    print("table: active", act_t.sum(), "dropped", float(meta[0, 0]))

    # --- established path geometry (XLA narrow phase on CPU) ---
    cvx = convex_data(state)
    gc = ground_contacts(state, cvx, cfg_np)
    cand2 = pair_candidates(state, cfg_np)
    pc = pair_contacts(state, cvx, cand2, cfg_np)
    con = concat_contacts(gc, pc)
    keys_n = np.asarray(con.key)
    act_n = np.asarray(con.active)
    print("xla:   active", act_n.sum())

    tmap = {}
    for i in np.nonzero(act_t)[0]:
        tmap[int(keys_t[i])] = i
    nmap = {}
    for i in np.nonzero(act_n)[0]:
        nmap[int(keys_n[i])] = i
    only_t = set(tmap) - set(nmap)
    only_n = set(nmap) - set(tmap)
    print("keys only in table:", sorted(only_t)[:10], len(only_t))
    print("keys only in xla:  ", sorted(only_n)[:10], len(only_n))

    pt_t = np.asarray(table[CT_PT:CT_PT + 3])
    n_t = np.asarray(table[CT_N:CT_N + 3])
    d_t = np.asarray(table[CT_D])
    mu_t = np.asarray(table[CT_MU])
    re_t = np.asarray(table[CT_REST])
    pt_n = np.asarray(con.point)
    nn_n = np.asarray(con.normal)
    d_n = np.asarray(con.depth)
    mu_n = np.asarray(con.friction)
    re_n = np.asarray(con.restitution)

    worst = {"pt": 0.0, "n": 0.0, "d": 0.0, "mu": 0.0, "re": 0.0}
    worst_key = {}
    for k in set(tmap) & set(nmap):
        it, i_n = tmap[k], nmap[k]
        diffs = {
            "pt": float(np.max(np.abs(pt_t[:, it] - pt_n[:, i_n]))),
            "n": float(np.max(np.abs(n_t[:, it] - nn_n[:, i_n]))),
            "d": abs(float(d_t[it] - d_n[i_n])),
            "mu": abs(float(mu_t[it] - mu_n[i_n])),
            "re": abs(float(re_t[it] - re_n[i_n])),
        }
        for f, v in diffs.items():
            if v > worst[f]:
                worst[f] = v
                worst_key[f] = k
    print("worst field diffs over matched keys:", worst)
    print("worst keys:", worst_key)

    # rank consistency: ra/rb1 vs sweep ranks
    rank_arr = np.zeros(state.num_bodies, np.int32)
    rank_arr[np.asarray(order)] = np.arange(state.num_bodies)
    ra_t = np.asarray(table[CT_RA]).astype(int)
    rb1_t = np.asarray(table[CT_RB1]).astype(int)
    bad = 0
    for k, it in tmap.items():
        i_n = nmap.get(k)
        if i_n is None:
            continue
        ba = int(np.asarray(con.body_a)[i_n])
        bb = int(np.asarray(con.body_b)[i_n])
        ra_expect = rank_arr[ba]
        rb_expect = rank_arr[bb] if bb >= 0 else -1
        got_a, got_b = ra_t[it], rb1_t[it] - 1
        if {got_a, got_b} != {ra_expect, rb_expect}:
            bad += 1
            if bad < 5:
                print("rank mismatch key", k, "table", (got_a, got_b),
                      "expect", (ra_expect, rb_expect))
    print("rank mismatches:", bad)

    # --- solve triangulation: table vs banded vs plain XLA jacobi ---
    from physics_tpu.engine import step_with_metrics

    cfg_j = cfg_np.replace(contact_solver="jacobi")
    out_t, m_t = jax.jit(step_with_metrics, static_argnums=1)(state, cfg_t)
    out_b, m_b = jax.jit(step_with_metrics, static_argnums=1)(state, cfg_np)
    out_j, m_j = jax.jit(step_with_metrics, static_argnums=1)(state, cfg_j)
    for name, a, b in [("table-vs-banded", out_t, out_b),
                       ("jacobi-vs-banded", out_j, out_b),
                       ("table-vs-jacobi", out_t, out_j)]:
        dv = float(np.max(np.abs(np.asarray(a.vel) - np.asarray(b.vel))))
        dw = float(np.max(np.abs(np.asarray(a.omega) - np.asarray(b.omega))))
        dp = float(np.max(np.abs(np.asarray(a.pos) - np.asarray(b.pos))))
        print(f"{name}: dvel {dv:.3e} domega {dw:.3e} dpos {dp:.3e}")
    print("counts:", int(m_t["contact_count"]), int(m_b["contact_count"]),
          int(m_j["contact_count"]))
    for nm, m in [("table", m_t), ("banded", m_b), ("jacobi", m_j)]:
        print(nm, {k: float(v) for k, v in sorted(m.items())})


if __name__ == "__main__":
    main()
