"""Fused bucket-aligned HULL contact table (ops/hull_table.py,
cfg.hull_table) — the hulls_only analogue of the box contact table.

Interpret-mode on CPU exercises the identical kernel code path as TPU.
Small N: the hull kernel's clip/SAT phases are heavy in interpret mode.
"""

import numpy as np
import pytest

import jax

from physics_tpu.engine import prepare_contacts, rollout, step_with_metrics
from physics_tpu.scenes import mesh_rain, rain_config, rain_xla_config


def _cfgs(n):
    cfg_x = rain_xla_config(n)
    # table config WITHOUT the anchored rebuild (K=1): these tests pin
    # per-step table parity; the anchored pipeline has its own tests
    cfg_t = rain_config(n).replace(
        bucket_cap2=256, contact_rebuild=1, contact_refresh_iters=0,
        fuse_prep=False, fuse_integrate=False,
    )
    return cfg_x, cfg_t


def test_hull_table_path_engages():
    from physics_tpu.solver.contacts import hull_table_path

    state = mesh_rain(32)
    cfg_x, cfg_t = _cfgs(32)
    assert not hull_table_path(state, cfg_x)
    assert hull_table_path(state, cfg_t)


def test_hull_table_contact_set_matches_fast_paths():
    """The fused kernel must produce the SAME contact set (by feature
    key, with matching depth/point/normal payloads) as the XLA shared-
    hull fast paths (_pair_contacts_hulls_fast +
    _ground_contacts_hulls_fast) on a settled rain scene."""
    from physics_tpu.ops.broadphase import (
        body_aabbs, pair_candidates, sweep_order,
    )
    from physics_tpu.ops.contact_table import (
        table_keys_scalar, unified_geom,
    )
    from physics_tpu.ops.hull_table import (
        bucket_hull_contact_table, hull_slots,
    )
    from physics_tpu.ops.narrowphase import (
        _ground_contacts_hulls_fast,
        _pair_contacts_hulls_fast,
        hull_obb_prefilter,
    )
    from physics_tpu.solver.contacts import concat_contacts

    n = 32
    state = mesh_rain(n)
    cfg_x, cfg_t = _cfgs(n)
    state = prepare_contacts(state, cfg_x)
    stepj = jax.jit(lambda s: step_with_metrics(s, cfg_x)[0])
    for _ in range(2):
        state = stepj(state)

    cand = pair_candidates(state, cfg_x)
    cand, _ = hull_obb_prefilter(state, cand, cfg_x.hull_prefilter_cap)
    pc = _pair_contacts_hulls_fast(state, cand, cfg_x)
    gc = _ground_contacts_hulls_fast(state, cfg_x)
    ca = concat_contacts(gc, pc)
    act_a = np.asarray(ca.active) & (np.asarray(ca.key) != 0)
    ka = np.asarray(ca.key)[act_a]
    da = np.asarray(ca.depth)[act_a]

    order = sweep_order(state, body_aabbs(state))
    geom = unified_geom(state, cfg_t, order, hulls=True)
    cand_b = pair_candidates(state, cfg_t)
    table, meta, _ = bucket_hull_contact_table(
        state, cand_b, cfg_t, order, prev=None, geom=geom)
    keys_b = np.asarray(table_keys_scalar(
        table, n, hull_slots(state.hulls), state.hulls.verts.shape[1]))
    act_b = keys_b != 0
    kb = keys_b[act_b]
    db = np.asarray(table)[6][act_b]

    assert set(ka.tolist()) == set(kb.tolist())
    assert len(ka) == len(set(ka.tolist()))
    assert np.asarray(meta)[0, 0::128].sum() == 0    # dropped
    ib = {k: i for i, k in enumerate(kb.tolist())}
    for i, k in enumerate(ka.tolist()):
        assert abs(da[i] - db[ib[k]]) < 1e-4


def test_hull_table_step_matches_xla_path():
    """A full warm-started engine step through cfg.hull_table matches the
    XLA fast-path step (same contact count, near-identical state — the
    paths differ only in contact order; Jacobi is order-independent up
    to f32 summation)."""
    n = 32
    state = mesh_rain(n)
    cfg_x, cfg_t = _cfgs(n)
    sx = prepare_contacts(state, cfg_x)
    st = prepare_contacts(state, cfg_t)
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    for _ in range(2):
        sx, _ = stepj(sx, cfg_x)
        st, _ = stepj(st, cfg_t)
    ox, mx = stepj(sx, cfg_x)
    ot, mt = stepj(st, cfg_t)
    assert int(mt["contact_count"]) == int(mx["contact_count"])
    assert int(mt["contact_overflow"]) == 0
    assert int(mt["band_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(ot.pos), np.asarray(ox.pos), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ot.vel), np.asarray(ox.vel), atol=1e-3)


@pytest.mark.slow
def test_hull_table_fused_prep_integrate():
    """fuse_prep + fuse_integrate compose with the hull table: the step
    matches the unfused table step tightly (same kernels' math, only
    where constants live / where integration runs differs)."""
    n = 32
    state = mesh_rain(n)
    _, cfg_t = _cfgs(n)
    cfg_f = cfg_t.replace(fuse_prep=True, fuse_integrate=True)
    st = prepare_contacts(state, cfg_t)
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    for _ in range(2):
        st, _ = stepj(st, cfg_t)
    ot, mt = stepj(st, cfg_t)
    of, mf = stepj(st, cfg_f)
    assert int(mf["contact_count"]) == int(mt["contact_count"])
    np.testing.assert_allclose(
        np.asarray(of.pos), np.asarray(ot.pos), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(of.quat), np.asarray(ot.quat), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(of.vel), np.asarray(ot.vel), atol=1e-5)


@pytest.mark.slow
def test_hull_table_rollout_stable():
    """Warm-started rain rollout through the hull table stays finite and
    settles (exercises warm keys across steps + ground contacts)."""
    n = 32
    state = mesh_rain(n)
    _, cfg_t = _cfgs(n)
    st = prepare_contacts(state, cfg_t)
    final, _ = rollout(st, cfg_t, num_steps=240)
    pos = np.asarray(final.pos)
    assert np.all(np.isfinite(pos))
    # nothing tunnels through the ground (hull inradius ~0.45; the drop
    # is still settling at 240 steps — transient penetration of a few
    # tenths matches the XLA path's behavior on the same scene)
    assert float(pos[:, 1].min()) > 0.05


def test_hull_table_anchored_rebuild_tracks_k1():
    """Round 5: the hull table kernel emits body-frame anchor rows
    (CT2_ROWS, same layout as the box kernel) and the production
    rain_config rides contact_rebuild=4 — between rebuilds the fused
    solve re-derives each hull contact's point/normal/depth from the
    anchors. K=4 must track K=1 through a short drop (discovery delay
    <= 3 steps is the only divergence) and keep the buffers finite."""
    from physics_tpu.solver.contacts import anchored_path

    n = 32
    cfg_k1 = rain_config(n).replace(
        bucket_cap2=256, contact_rebuild=1, contact_refresh_iters=0)
    cfg_k4 = rain_config(n).replace(
        bucket_cap2=256, contact_rebuild=4, contact_refresh_iters=4,
        contact_rebuild_vel_factor=0.0)
    state = mesh_rain(n)
    assert anchored_path(state, cfg_k4)
    s1 = prepare_contacts(state, cfg_k1)
    s4 = prepare_contacts(state, cfg_k4)
    assert s4.contact_table.shape[0] == 32        # CT2_ROWS anchors
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    for _ in range(10):
        s1, m1 = stepj(s1, cfg_k1)
        s4, m4 = stepj(s4, cfg_k4)
    p1, p4 = np.asarray(s1.pos), np.asarray(s4.pos)
    assert np.all(np.isfinite(p4))
    assert int(m4["contact_overflow"]) == 0
    # falling-phase discovery delay bounds the divergence (measured
    # 0.025 at step 10; the 360-step envelope parity is pinned on TPU,
    # scenes.rain_config comment)
    assert float(np.abs(p1 - p4).max()) < 0.1


def test_row_sharded_hull_table_matches_single_device():
    """Round 5: the hull table kernel gained the box kernel's
    bucket-range contract (buckets=(bucket0, nb_l), scalar-prefetched
    window bases) — the row-sharded step builds each shard's buckets
    locally, all-gathers the tables, and splits the banded sweeps with
    per-sweep z-delta psums. 2-device mesh over a 256-hull rain (2 rank
    buckets) must match the single-device path."""
    from physics_tpu.parallel.sharding import make_mesh, row_sharded_step
    from physics_tpu.engine import step
    from physics_tpu.solver.contacts import hull_table_path

    n = 256
    cfg = rain_config(n).replace(
        bucket_cap2=256, contact_rebuild=1, contact_refresh_iters=0,
        fuse_prep=False, fuse_integrate=False,
    )
    state = mesh_rain(n)
    assert hull_table_path(state, cfg)
    state = prepare_contacts(state, cfg)
    mesh = make_mesh([2], ["row"])
    rstep = row_sharded_step(cfg, mesh, "row")
    sstep = jax.jit(step, static_argnums=1)

    s_ref, s_sh = state, state
    for _ in range(3):
        s_ref = sstep(s_ref, cfg)
        s_sh = rstep(s_sh)
    err_p = float(np.max(np.abs(np.asarray(s_ref.pos)
                                - np.asarray(s_sh.pos))))
    err_v = float(np.max(np.abs(np.asarray(s_ref.vel)
                                - np.asarray(s_sh.vel))))
    assert np.all(np.isfinite(np.asarray(s_sh.pos)))
    assert float(np.sum(np.abs(np.asarray(s_sh.contact_lam)))) != 0.0
    assert err_p < 1e-3, (err_p, err_v)
    assert err_v < 5e-3, (err_p, err_v)


@pytest.mark.slow
@pytest.mark.parametrize(
    "n_types",
    [2,
     # H = 3 runs 9 interpret-mode SAT passes — a multi-minute XLA:CPU
     # compile, so the 3-type parity pin rides the full (nightly) suite
     pytest.param(3, marks=pytest.mark.slow)])
def test_hull_table_multitype_contact_set_matches_fast_path(n_types):
    """Round 5: the fused hull kernel runs one SAT pass per ORDERED hull
    type pair with SIDED coefficient tables (reference/incident face,
    edge, and ground-vertex data selected from the hull that owns it),
    lane-masked by each candidate's (type_a, type_b). On the mixed rain
    (2 types: cube + octahedron; 3 types adds the wedge prism — H² = 9
    masked passes) it must emit the SAME contact set (keys + depths) as
    the type-pair-segmented XLA fast path."""
    from physics_tpu.ops.broadphase import (
        body_aabbs, pair_candidates, sweep_order,
    )
    from physics_tpu.ops.contact_table import (
        table_keys_scalar, unified_geom,
    )
    from physics_tpu.ops.hull_table import (
        bucket_hull_contact_table, hull_slots,
    )
    from physics_tpu.ops.narrowphase import (
        _ground_contacts_hulls_fast,
        _pair_contacts_hulls_fast,
        hull_obb_prefilter,
    )
    from physics_tpu.scenes import mesh_rain_mixed
    from physics_tpu.solver.contacts import concat_contacts, hull_table_path

    n = 32
    cfg_x = rain_xla_config(n)
    cfg_t = rain_config(n).replace(
        bucket_cap2=256, contact_rebuild=1, contact_refresh_iters=0,
        fuse_prep=False, fuse_integrate=False)
    state = mesh_rain_mixed(n, n_types=n_types)
    assert state.hulls.verts.shape[0] == n_types
    assert hull_table_path(state, cfg_t)
    state = prepare_contacts(state, cfg_x)
    stepj = jax.jit(lambda s: step_with_metrics(s, cfg_x)[0])
    for _ in range(2):
        state = stepj(state)

    cand = pair_candidates(state, cfg_x)
    cand2, _ = hull_obb_prefilter(state, cand, cfg_x.hull_prefilter_cap)
    pc = _pair_contacts_hulls_fast(state, cand2, cfg_x)
    gc = _ground_contacts_hulls_fast(state, cfg_x)
    ca = concat_contacts(gc, pc)
    act_a = np.asarray(ca.active) & (np.asarray(ca.key) != 0)
    sa = dict(zip(np.asarray(ca.key)[act_a].tolist(),
                  np.asarray(ca.depth)[act_a].tolist()))

    order = sweep_order(state, body_aabbs(state))
    geom = unified_geom(state, cfg_t, order, hulls=True)
    cand_b = pair_candidates(state, cfg_t)
    table, _, _ = bucket_hull_contact_table(
        state, cand_b, cfg_t, order, prev=None, geom=geom)
    keys_b = np.asarray(table_keys_scalar(
        table, n, hull_slots(state.hulls), state.hulls.verts.shape[1]))
    act_b = keys_b != 0
    sb = dict(zip(keys_b[act_b].tolist(),
                  np.asarray(table[6])[act_b].tolist()))

    assert set(sa) == set(sb), (
        sorted(set(sa) - set(sb))[:8], sorted(set(sb) - set(sa))[:8])
    for k in sa:
        assert abs(sa[k] - sb[k]) < 1e-4, (k, sa[k], sb[k])


@pytest.mark.slow
@pytest.mark.parametrize("n_types", [2, 3])
def test_hull_table_multitype_anchored_rollout(n_types):
    """The production rain_config (hull table + fuse + anchored K=4) now
    engages on multi-type scenes (H ≤ MAX_TABLE_HULL_TYPES); a short
    mixed drop must stay finite with the CT2 anchor buffers persisted."""
    from physics_tpu.scenes import mesh_rain_mixed
    from physics_tpu.solver.contacts import anchored_path

    n = 32
    cfg = rain_config(n).replace(bucket_cap2=256)
    state = mesh_rain_mixed(n, n_types=n_types)
    assert anchored_path(state, cfg)
    s = prepare_contacts(state, cfg)
    assert s.contact_table.shape[0] == 32
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    for _ in range(8):
        s, m = stepj(s, cfg)
    assert np.all(np.isfinite(np.asarray(s.pos)))
    assert int(m["contact_overflow"]) == 0
