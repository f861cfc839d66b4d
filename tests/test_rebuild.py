"""Persistent anchored contacts (cfg.contact_rebuild > 1).

Between rebuilds the solve kernel re-derives every contact's
point/normal/depth exactly from body-frame anchors and current
transforms (ops/contact_table.py CT_AAX.. rows); only DISCOVERY of new
contacts waits for the next rebuild, and the motion guard
(contact_rebuild_vel_factor) forces a rebuild whenever bodies move fast
enough to tunnel past the slop — so drops run full physics and only
quasi-settled scenes ride the cheap refresh path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from physics_tpu.engine import prepare_contacts, rollout, step_with_metrics
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder
from tests.test_contact_table import CFG_TABLE

CFG_K1 = CFG_TABLE.replace(fuse_prep=True, dt=1.0 / 120.0,
                           contact_iters=8)
# production shape: shorter refresh schedule (second solve kernel in
# the cond's refresh branch — scenes.pile_config ships this)
CFG_K4 = CFG_K1.replace(contact_rebuild=4, contact_refresh_iters=4)


def _drop_stack(n=24, seed=5):
    b = SceneBuilder()
    rng = np.random.default_rng(seed)
    for k in range(n):
        x, z, layer = k % 4, (k // 4) % 3, k // 12
        pos = (np.array([x * 1.25, 0.55 + 1.15 * layer, z * 1.25])
               + rng.uniform(-0.03, 0.03, 3))
        i = b.add_body(pos=pos, inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
    return b.build()


def test_rebuild_requires_prepared_buffers():
    state = _drop_stack(8)
    with pytest.raises(ValueError):
        jax.jit(step_with_metrics, static_argnums=1)(state, CFG_K4)


@pytest.mark.slow
def test_rebuild_k4_tracks_k1_through_drop_and_settle():
    """With the round-5 displacement gate (vel_factor > 0, box table
    path), K=4 must track K=1 through a full drop+settle: falling
    buckets accumulate > vf·slop of motion every step, so their
    contacts recompute per step. The gated recompute derives candidates
    with the in-kernel broad phase over the FROZEN rank order (fresh
    sort only every K-th step), so trajectories track within centimetre
    tolerance rather than the old global-guard's bit-level identity
    (which rebuilt + re-sorted every step while ANYTHING moved — and
    therefore never amortized; see scenes.pile_config and
    test_gated_refresh_mixed_scene for the gate's discovery bound)."""
    state = _drop_stack()
    s1 = prepare_contacts(state, CFG_K1)
    s4 = prepare_contacts(state, CFG_K4)
    assert s4.contact_table.shape[0] == 32
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    for _ in range(30):
        s1, m1 = stepj(s1, CFG_K1)
        s4, m4 = stepj(s4, CFG_K4)
    assert int(m4["contact_count"]) == int(m1["contact_count"])
    err_p = float(np.max(np.abs(np.asarray(s1.pos) - np.asarray(s4.pos))))
    assert np.all(np.isfinite(np.asarray(s4.pos)))
    assert err_p < 5e-2, err_p
    # overflow counters carry the LAST REBUILD's values — still surfaced
    assert int(m4["pair_overflow"]) == 0
    assert int(m4["contact_overflow"]) == 0


@pytest.mark.slow
def test_rebuild_refresh_path_solves_settled_contacts():
    """Force the refresh path (vel guard off, K large) on a SETTLED
    stack: the anchored re-derivation must keep the stack resting —
    depths refresh, impulses keep balancing gravity, nothing sinks —
    and a body pushed while on the refresh path still deactivates its
    separated contacts (count drops, no phantom impulses)."""
    # settle with per-step rebuilds first (contacts must EXIST before a
    # long refresh window makes sense), then switch to pure refresh
    settled, _ = rollout(prepare_contacts(_drop_stack(), CFG_K1),
                         CFG_K1, num_steps=60)
    cfg = CFG_K1.replace(contact_rebuild=64,
                         contact_rebuild_vel_factor=0.0)
    state = prepare_contacts(
        settled.replace(step_count=jnp.zeros((), jnp.int32)), cfg)
    # rebuild at step 0, then 63 pure refresh steps
    final, _ = rollout(state, cfg, num_steps=64)
    y0 = np.sort(np.asarray(final.pos[:, 1]))
    stepj = jax.jit(step_with_metrics, static_argnums=1)
    _, m = stepj(final, cfg)
    assert int(m["contact_count"]) > 24
    assert float(m["max_penetration"]) < 0.05
    # nothing sank through the ground while refreshing
    assert y0[0] > 0.4, y0[:4]

    # yank the top body upward mid-refresh: its anchored contacts must
    # separate (depth ≤ 0 → inactive) instead of pulling it back
    top = int(np.argmax(np.asarray(final.pos[:, 1])))
    vel = final.vel.at[top, 1].set(3.0)
    kicked = final.replace(vel=vel)
    k1, mk = stepj(kicked, cfg)
    assert int(mk["contact_count"]) <= int(m["contact_count"])
    assert float(k1.pos[top, 1]) > float(final.pos[top, 1])


def test_gated_refresh_mixed_scene():
    """Round 5 per-bucket DISPLACEMENT gate (contact_rebuild_vel_factor
    > 0 on a box table path): on a mixed scene — a resting grid plus one
    ballistic box incoming at 8 m/s — the gated refresh recomputes the
    mover's bucket every step (its accumulated displacement crosses
    vf·slop immediately), discovering the impact within one step, while
    the ungated K-schedule waits up to K-1 steps and embeds the
    intruder correspondingly deeper. The resting bulk passes through
    untouched either way."""
    import jax.numpy as jnp

    def scene():
        b = SceneBuilder()
        for k in range(48):
            x, z = k % 8, k // 8
            i = b.add_body(pos=(x * 1.25, 0.5, z * 1.25),
                           inertia=box_inertia((0.5,) * 3, 1.0))
            b.set_box(i, (0.5,) * 3, friction=0.5)
        # ballistic intruder above the far corner, 8 m/s downward
        i = b.add_body(pos=(4.0, 3.0, 2.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
        s = b.build()
        return s.replace(vel=s.vel.at[48, 1].set(-8.0))

    k8 = CFG_K1.replace(contact_rebuild=8, contact_refresh_iters=4,
                        contact_rebuild_vel_factor=0.0)
    gated = k8.replace(contact_rebuild_vel_factor=2.0)
    stepj = jax.jit(step_with_metrics, static_argnums=1)

    def run(cfg):
        s = prepare_contacts(scene(), cfg)
        # one step to put the schedule mid-cycle (step 0 always
        # rebuilds), then let the intruder cross the gap and impact
        mx = 0.0
        for _ in range(9):
            s, m = stepj(s, cfg)
            mx = max(mx, float(m["max_penetration"]))
        return s, mx

    s_g, pen_g = run(gated)
    s_u, pen_u = run(k8)
    assert np.all(np.isfinite(np.asarray(s_g.pos)))
    # ungated: the impact lands between scheduled rebuilds -> deep
    # transient; gated: discovered within a step of crossing the slop
    assert pen_g < pen_u, (pen_g, pen_u)
    assert pen_g < 0.35, pen_g
