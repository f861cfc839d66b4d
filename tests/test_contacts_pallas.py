"""Parity + safety tests for the fused banded Pallas contact solver.

On CPU the kernel runs in Pallas interpreter mode (same math, no Mosaic),
so these tests validate semantics everywhere; the TPU bench exercises the
compiled path. Tolerances reflect the solver's hi/lo bf16 MXU split
(~2e-6 relative per gather, amplified by projection boundaries across
sweeps — see solver/contacts_pallas.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_tpu.config import SimConfig
from physics_tpu.engine import prepare_contacts, step
from physics_tpu.scenes import box_stack
from physics_tpu.solver.contacts_pallas import solve_impulses_banded


def _cfg(**kw):
    base = dict(
        ground_plane=True, pair_collisions=True, broadphase="sweep",
        sweep_window=8, contact_iters=8, position_iters=8, boxes_only=True,
        max_contacts=128, pallas_tile=256, pallas_window=128,
    )
    base.update(kw)
    return SimConfig(**base)


def _settled(cfg, n_steps=3):
    s = box_stack(6)
    for _ in range(n_steps):
        s = step(s, cfg)
    return s


def test_cold_parity():
    cfgj = _cfg()
    cfgp = cfgj.replace(contact_solver="pallas_banded")
    s = _settled(cfgj)  # in-contact state
    sj = step(s, cfgj)
    sp = step(s, cfgp)
    np.testing.assert_allclose(sj.vel, sp.vel, atol=5e-4)
    np.testing.assert_allclose(sj.omega, sp.omega, atol=5e-4)
    np.testing.assert_allclose(sj.pos, sp.pos, atol=5e-5)
    np.testing.assert_allclose(sj.quat, sp.quat, atol=5e-5)


@pytest.mark.slow
def test_warm_parity_and_capacity():
    cfgj = _cfg()
    cfgp = cfgj.replace(contact_solver="pallas_banded")
    sj = prepare_contacts(box_stack(6), cfgj)
    sp = prepare_contacts(box_stack(6), cfgp)
    # capacity is tile-padded for the pallas solver
    assert sp.contact_key.shape[0] % 128 == 0
    for _ in range(4):
        sj = step(sj, cfgj)
        sp = step(sp, cfgp)
    np.testing.assert_allclose(sj.pos, sp.pos, atol=2e-4)
    np.testing.assert_allclose(sj.vel, sp.vel, atol=2e-3)
    # warm-start buffers carry matched impulses on both paths
    assert float(jnp.sum(sp.contact_lam[0])) > 0.0


@pytest.mark.slow
def test_stack_stays_up():
    cfgp = _cfg(contact_iters=16).replace(contact_solver="pallas_banded")
    s = prepare_contacts(box_stack(5), cfgp)
    for _ in range(40):
        s = step(s, cfgp)
    pos = np.asarray(s.pos)
    assert np.all(np.isfinite(pos))
    # boxes remain stacked in order, none fell through the ground
    assert np.all(np.diff(pos[:, 1]) > 0.5)
    assert pos[0, 1] > 0.4


def test_band_overflow_counted_not_silent():
    """A pair contact whose rank distance exceeds the window is deactivated
    and counted, never silently mis-solved."""
    from physics_tpu.ops.narrowphase import Contacts
    from physics_tpu.scene import SceneBuilder
    from physics_tpu.io.meshes import box_inertia

    b = SceneBuilder()
    n = 300
    for i in range(n):
        j = b.add_body(pos=(float(i), 0.5, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(j, (0.5,) * 3)
    state = b.build()
    cfg = _cfg(max_contacts=0).replace(contact_solver="pallas_banded")

    def mk(body_b):
        c = 128
        z3 = jnp.zeros((3, c), jnp.float32)
        nrm = z3.at[1, :].set(1.0)
        return Contacts(
            body_a=jnp.zeros((c,), jnp.int32),
            body_b=jnp.full((c,), -1, jnp.int32).at[0].set(body_b),
            point=z3, normal=nrm,
            depth=jnp.zeros((c,), jnp.float32).at[0].set(0.01),
            active=jnp.zeros((c,), bool).at[0].set(True),
            friction=jnp.zeros((c,), jnp.float32),
            restitution=jnp.zeros((c,), jnp.float32),
            key=jnp.zeros((c,), jnp.int32).at[0].set(7),
        )

    order = jnp.arange(n, dtype=jnp.int32)  # x-sorted already
    # in-band partner: rank distance 5 << window 128
    out = solve_impulses_banded(state, mk(5), cfg, order)
    assert int(out[5]["band_overflow"]) == 0
    # out-of-band partner: rank distance 250 > window 128
    out = solve_impulses_banded(state, mk(250), cfg, order)
    assert int(out[5]["band_overflow"]) == 1
    # its impulse is dropped (velocities untouched)
    np.testing.assert_allclose(out[0], state.vel, atol=1e-7)


def test_requires_sweep_broadphase():
    cfg = _cfg(broadphase="allpairs").replace(
        contact_solver="pallas_banded")
    with pytest.raises(ValueError, match="sweep"):
        step(box_stack(3), cfg)


@pytest.mark.slow
def test_z_bf16_movement_close_to_exact():
    """cfg.z_bf16 (single-pass bf16 z movement, docs/PERFORMANCE.md
    lever 4) must track the exact hi/lo-split solve closely on a settled
    stack: per-movement rounding is ~2⁻⁸ relative and the f32 z
    accumulator keeps resting velocities near-exact in absolute terms."""
    from physics_tpu.engine import prepare_contacts
    from physics_tpu.scenes import box_stack

    cfg = _cfg(contact_iters=8).replace(contact_solver="pallas_banded")
    cfgl = cfg.replace(z_bf16=True)
    s = prepare_contacts(box_stack(5), cfg)
    sl = prepare_contacts(box_stack(5), cfgl)
    for _ in range(5):
        s = step(s, cfg)
        sl = step(sl, cfgl)
    pos, posl = np.asarray(s.pos), np.asarray(sl.pos)
    assert np.all(np.isfinite(posl))
    np.testing.assert_allclose(posl, pos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(sl.vel), np.asarray(s.vel),
                               atol=5e-2)


def test_z_bf16_restitution_guard():
    """cfg.z_bf16 is documented unsafe for restitution-heavy scenes
    (config.py, docs/PERFORMANCE.md lever 4): prepare_contacts must
    REFUSE a bouncy scene outright, WARN (never silent) on mild
    restitution, and stay quiet at restitution 0."""
    from physics_tpu.io.meshes import box_inertia
    from physics_tpu.scene import SceneBuilder

    def scene(rest):
        b = SceneBuilder()
        i = b.add_body(pos=(0.0, 0.5, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, restitution=rest)
        return b.build()

    cfg = _cfg().replace(contact_solver="pallas_banded", z_bf16=True)

    # restitution-heavy: refused
    with pytest.raises(ValueError, match="z_bf16"):
        prepare_contacts(scene(0.8), cfg)
    # config-level restitution counts too
    with pytest.raises(ValueError, match="z_bf16"):
        prepare_contacts(scene(0.0), cfg.replace(restitution=0.5))

    # mild restitution: runs, but loudly
    with pytest.warns(UserWarning, match="z_bf16"):
        prepare_contacts(scene(0.05), cfg)

    # restitution 0: silent
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        prepare_contacts(scene(0.0), cfg)


def test_fused_prep_no_persist_oh_parity(monkeypatch):
    """fuse_prep with the one-hot scratch DISABLED (big-cp VMEM
    fallback: endpoints stashed in consts rows 46/47, per-sweep
    iota-compare rebuild) must match the persisted-scratch kernel
    bitwise — same math, different op placement is not allowed here
    because both read the same f32 windows."""
    import subprocess
    import sys

    code = r"""
import os, sys
import numpy as np
import jax
sys.path.insert(0, "/root/repo")
from physics_tpu.engine import prepare_contacts, rollout
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder
from tests.test_contact_table import CFG_TABLE

cfg = CFG_TABLE.replace(fuse_prep=True, fuse_integrate=True,
                        contact_iters=6, dt=1.0 / 120.0)
b = SceneBuilder()
rng = np.random.default_rng(3)
for k in range(12):
    pos = (np.array([(k % 4) * 1.2, 0.55 + (k // 4) * 1.1, 0.0])
           + rng.uniform(-0.05, 0.05, 3))
    i = b.add_body(pos=pos, inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_box(i, (0.5,) * 3, friction=0.5)
state = prepare_contacts(b.build(), cfg)
final, _ = rollout(state, cfg, num_steps=30)
np.save(os.environ["OUT"], np.asarray(final.pos))
"""
    outs = {}
    for name, budget in (("persist", None), ("fallback", "0")):
        env = dict(__import__("os").environ)
        env["OUT"] = f"/tmp/ohp_{name}.npy"
        env["JAX_PLATFORMS"] = "cpu"
        if budget is not None:
            env["PHYSICS_TPU_OH_BUDGET"] = budget
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
        outs[name] = np.load(f"/tmp/ohp_{name}.npy")
    assert np.all(np.isfinite(outs["fallback"]))
    np.testing.assert_allclose(outs["persist"], outs["fallback"],
                               atol=1e-6)


def test_streaming_chunked_solve_matches_single_pass():
    """cfg.solve_chunks > 1 (the round-5 streaming fused grid that breaks
    the ~24k-body everything-resident VMEM ceiling) runs the same sweep
    schedule as block-Gauss-Seidel over sequential bucket-range passes.
    On a multi-bucket pile one cold step must agree with the single-pass
    kernel to coupling tolerance (chunks only interact through the
    forward window overlap), the contact table itself must be identical
    (chunking never touches the table kernel), and a short chunked
    rollout must stay finite."""
    import numpy as np

    from physics_tpu.engine import prepare_contacts, step_with_metrics
    from physics_tpu.scenes import box_pile, pile_config

    n = 384                      # 3 buckets -> 3 single-bucket chunks
    state = box_pile(n, x_aspect=16.0)
    base = pile_config(n).replace(contact_iters=8, contact_rebuild=1,
                                  contact_refresh_iters=0)
    c1 = base.replace(solve_chunks=1)
    c3 = base.replace(solve_chunks=3)
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    o1, m1 = stepj(prepare_contacts(state, c1), c1)
    o3, m3 = stepj(prepare_contacts(state, c3), c3)
    assert int(m1["contact_count"]) == int(m3["contact_count"])
    assert int(m3["contact_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(o1.pos), np.asarray(o3.pos),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(o1.vel), np.asarray(o3.vel),
                               atol=1e-2)
    s = o3
    for _ in range(5):
        s, _ = stepj(s, c3)
    assert np.all(np.isfinite(np.asarray(s.pos)))
    assert np.all(np.isfinite(np.asarray(s.vel)))
