"""Fused bucket-aligned contact table (ops/contact_table.py +
solver/contacts_pallas.solve_impulses_table, cfg.contact_table).

Interpret-mode on CPU exercises the identical kernel code path as TPU.
Kept small-N: every distinct SimConfig is a new XLA program on one CPU
core."""

import pytest
import numpy as np
import jax

from physics_tpu.config import SimConfig
from physics_tpu.engine import prepare_contacts, rollout, step_with_metrics
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder


def _cluster_state(n=24, seed=3, spacing=8.0):
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
    contact_iters=8,
    # the 24-body cluster state makes ~280 contacts; the default budget
    # (6 per body) would overflow the single bucket
    max_contacts=512,
)


def test_table_step_matches_np_pallas_path():
    """One step through the fused table must match the two-kernel path
    (bucketed Pallas narrow phase + sorted banded solve): same contact
    count, same resulting state to split-error tolerance — both paths run
    the SAME batched SAT, only the table's compaction/ordering differs
    (Jacobi is order-independent up to f32 summation order)."""
    state = _cluster_state(24)
    cfg_t = CFG_TABLE
    cfg_np = cfg_t.replace(contact_table=False, bucket_block=8,
                           bucket_cap=128, pallas_tile=128,
                           pallas_window=128)
    out_t, m_t = jax.jit(step_with_metrics, static_argnums=1)(state, cfg_t)
    out_n, m_n = jax.jit(step_with_metrics, static_argnums=1)(state, cfg_np)
    assert int(m_t["band_overflow"]) == 0
    assert int(m_t["contact_overflow"]) == 0
    assert int(m_t["contact_count"]) == int(m_n["contact_count"]), (
        int(m_t["contact_count"]), int(m_n["contact_count"]))
    np.testing.assert_allclose(
        np.asarray(out_t.pos), np.asarray(out_n.pos), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_t.vel), np.asarray(out_n.vel), atol=5e-3)


@pytest.mark.slow
def test_table_stack_rolls_out_stable():
    """Warm-started rollout through the table path: a 3-box stack settles
    (exercises the in-kernel feature keys through the sort-merge warm
    matching across steps)."""
    b = SceneBuilder()
    for k in range(3):
        i = b.add_body(pos=(0.0, 0.5 + 1.002 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.6)
    cfg = CFG_TABLE.replace(sweep_window=4, contact_iters=16,
                            dt=1.0 / 120.0)
    state = prepare_contacts(b.build(), cfg)
    final, _ = rollout(state, cfg, num_steps=240)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert abs(y[0] - 0.5) < 0.03, y
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.02


def test_table_overflow_counted():
    """Per-bucket contact capacity overflow is counted, never silent."""
    state = _cluster_state(24)
    cfg = CFG_TABLE.replace(bucket_ccap=128)
    _, m = jax.jit(step_with_metrics, static_argnums=1)(state, cfg)
    # the 24-body cluster state makes > 128 contacts (ground + deep pairs)
    assert int(m["contact_overflow"]) > 0
    assert int(m["contact_count"]) <= 128


@pytest.mark.slow
def test_table_two_phase_prefilter_identical():
    """bucket_cap2 (face-axis SAT prefilter + survivor compaction inside
    the kernel) must be a pure optimization: the emitted table is
    BITWISE identical — the prefilter only drops face-separated pairs
    (which produce no contacts) and compaction is order-preserving. The
    warm-started rollout must also stay stable through it."""
    from physics_tpu.ops.broadphase import (
        body_aabbs, pair_candidates, sweep_order,
    )
    from physics_tpu.ops.contact_table import bucket_contact_table

    state = _cluster_state(24)
    cfg = CFG_TABLE
    cfg2 = cfg.replace(bucket_cap2=128)
    order = sweep_order(state, body_aabbs(state))
    cand = pair_candidates(state, cfg)
    t0, m0, _ = bucket_contact_table(state, cand, cfg, order)
    t1, m1, _ = bucket_contact_table(state, cand, cfg2, order)
    assert np.asarray(t0[9]).sum() > 20          # contact-rich
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert float(np.asarray(m1)[0].reshape(-1, 128)[:, 2].sum()) == 0.0

    b = SceneBuilder()
    for k in range(3):
        i = b.add_body(pos=(0.0, 0.5 + 1.002 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.6)
    cfgr = CFG_TABLE.replace(sweep_window=4, contact_iters=16,
                             dt=1.0 / 120.0, bucket_cap2=128)
    st = prepare_contacts(b.build(), cfgr)
    final, _ = rollout(st, cfgr, num_steps=240)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert abs(y[0] - 0.5) < 0.03, y
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y


@pytest.mark.slow
def test_table_inkernel_broadphase_same_contacts():
    """bp_inkernel (the ENTIRE broad phase folded into the kernel: shifted
    static window slices → AABB + face-SAT filter → in-kernel candidate
    compaction) must produce the SAME contact set as the XLA candidate
    pipeline. Emission order within a bucket differs by design (d-major
    raw-candidate order vs rank-major sweep order), so compare by feature
    key with exact per-key payloads."""
    from physics_tpu.ops.broadphase import (
        body_aabbs, pair_candidates, sweep_order,
    )
    from physics_tpu.ops.contact_table import (
        CT_ACT, bucket_contact_table, table_keys_scalar,
    )

    state = _cluster_state(24)
    cfg = CFG_TABLE
    order = sweep_order(state, body_aabbs(state))
    cand = pair_candidates(state, cfg)
    t0, _, _ = bucket_contact_table(state, cand, cfg, order)
    t1, m1, _ = bucket_contact_table(state, None, cfg, order)
    a0 = np.asarray(t0[CT_ACT]) > 0
    a1 = np.asarray(t1[CT_ACT]) > 0
    assert a0.sum() > 20 and a0.sum() == a1.sum()
    k0 = np.asarray(table_keys_scalar(t0, 24, 8, 8))
    k1 = np.asarray(table_keys_scalar(t1, 24, 8, 8))
    assert set(k0[a0].tolist()) == set(k1[a1].tolist())
    i0 = {int(k): i for i, k in enumerate(k0) if a0[i]}
    T0, T1 = np.asarray(t0), np.asarray(t1)
    for i, k in enumerate(k1):
        if a1[i]:
            np.testing.assert_array_equal(T1[:9, i], T0[:9, i0[int(k)]])
    meta = np.asarray(m1)[0].reshape(-1, 128)
    assert meta[:, 2].sum() == 0 and meta[:, 3].sum() == 0


@pytest.mark.slow
def test_table_fused_integration_matches_xla():
    """cfg.fuse_integrate (position integration inside the solve kernel's
    final sweep) must reproduce the XLA epilogue: same math, same op
    order (split-impulse pseudo-rotation, normalize, velocity rotation,
    normalize), evaluated in-kernel per owned 128-rank block."""
    state = _cluster_state(24)
    cfg_f = CFG_TABLE.replace(fuse_integrate=True)
    out_x, m_x = jax.jit(step_with_metrics, static_argnums=1)(
        state, CFG_TABLE)
    out_f, m_f = jax.jit(step_with_metrics, static_argnums=1)(
        state, cfg_f)
    assert int(m_f["contact_count"]) == int(m_x["contact_count"])
    np.testing.assert_allclose(
        np.asarray(out_f.pos), np.asarray(out_x.pos), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_f.quat), np.asarray(out_x.quat), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_f.vel), np.asarray(out_x.vel), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_f.omega), np.asarray(out_x.omega), atol=1e-6)
    assert int(out_f.step_count) == int(out_x.step_count)
    assert float(np.abs(np.asarray(out_f.force)).max()) == 0.0

    # warm-started stack rollout through the fused epilogue stays stable
    b = SceneBuilder()
    for k in range(3):
        i = b.add_body(pos=(0.0, 0.5 + 1.002 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.6)
    cfgr = CFG_TABLE.replace(sweep_window=4, contact_iters=16,
                             dt=1.0 / 120.0, fuse_integrate=True,
                             bp_inkernel=True)
    st = prepare_contacts(b.build(), cfgr)
    final, _ = rollout(st, cfgr, num_steps=240)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert abs(y[0] - 0.5) < 0.03, y
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.02


@pytest.mark.slow
def test_table_fused_prep_matches_separate_kernels():
    """cfg.fuse_prep (solve constants built inside the solve kernel's
    sweep 0 from the raw contact table) must reproduce the separate
    prep-kernel path exactly: same gathers, same math, same precision —
    only where the constants live differs."""
    state = _cluster_state(24)
    cfg_p = CFG_TABLE.replace(fuse_prep=True)
    out_x, m_x = jax.jit(step_with_metrics, static_argnums=1)(
        state, CFG_TABLE)
    out_p, m_p = jax.jit(step_with_metrics, static_argnums=1)(
        state, cfg_p)
    assert int(m_p["contact_count"]) == int(m_x["contact_count"])
    for f in ("pos", "quat", "vel", "omega"):
        # 1e-6: with the round-5 default (one-hots rebuilt per sweep,
        # endpoints via consts rows 46/47) the fused path's sweep-0
        # geometry gather groups its matmuls differently from the
        # separate prep kernel — last-ulp MXU accumulation differences
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, f)), np.asarray(getattr(out_x, f)),
            atol=1e-6, err_msg=f)

    # warm-started stack rollout with the whole fused stack on
    # (bp_inkernel + fuse_prep + fuse_integrate): settles like the
    # reference configuration
    b = SceneBuilder()
    for k in range(3):
        i = b.add_body(pos=(0.0, 0.5 + 1.002 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.6)
    cfgr = CFG_TABLE.replace(sweep_window=4, contact_iters=16,
                             dt=1.0 / 120.0, bp_inkernel=True,
                             fuse_prep=True, fuse_integrate=True)
    st = prepare_contacts(b.build(), cfgr)
    final, _ = rollout(st, cfgr, num_steps=240)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert abs(y[0] - 0.5) < 0.03, y
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.02


@pytest.mark.slow
def test_table_inkernel_broadphase_step_and_rollout():
    """Full step through cfg.bp_inkernel matches the candidate-pipeline
    table step, and a warm-started stack rollout stays stable (exercises
    window-edge overflow accounting + warm keys across steps)."""
    state = _cluster_state(24)
    cfg_bp = CFG_TABLE.replace(bp_inkernel=True)
    out_t, m_t = jax.jit(step_with_metrics, static_argnums=1)(
        state, CFG_TABLE)
    out_b, m_b = jax.jit(step_with_metrics, static_argnums=1)(
        state, cfg_bp)
    assert int(m_b["pair_overflow"]) == 0
    assert int(m_b["contact_overflow"]) == 0
    assert int(m_b["contact_count"]) == int(m_t["contact_count"])
    np.testing.assert_allclose(
        np.asarray(out_b.pos), np.asarray(out_t.pos), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_b.vel), np.asarray(out_t.vel), atol=1e-4)

    b = SceneBuilder()
    for k in range(3):
        i = b.add_body(pos=(0.0, 0.5 + 1.002 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.6)
    cfgr = CFG_TABLE.replace(sweep_window=4, contact_iters=16,
                             dt=1.0 / 120.0, bp_inkernel=True)
    st = prepare_contacts(b.build(), cfgr)
    final, _ = rollout(st, cfgr, num_steps=240)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert abs(y[0] - 0.5) < 0.03, y
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.02
