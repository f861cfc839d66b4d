"""Experimental banded Pallas narrow phase (cfg.narrowphase_pallas).

Gated OFF by default (its rank-window assumption only holds for dense
active-pair distributions — see docs/ROADMAP.md); these tests pin the
kernel's manifold math on a dense case and that the default path is
unaffected by the flag's existence."""

import pytest
import jax.numpy as jnp
import numpy as np

from physics_tpu.config import SimConfig
from physics_tpu.engine import step
from physics_tpu.io.meshes import box_inertia
from physics_tpu.ops.broadphase import pair_candidates
from physics_tpu.ops.narrowphase import _pair_contacts_boxes_pallas
from physics_tpu.scene import SceneBuilder


def _stack_state(n=4):
    b = SceneBuilder()
    for k in range(n):
        i = b.add_body(pos=(0.0, 0.5 + 0.98 * k, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
    return b.build()


CFG = SimConfig(
    ground_plane=True, pair_collisions=True, boxes_only=True,
    broadphase="sweep", sweep_window=4, narrowphase_pallas=True,
    pallas_tile=128, pallas_window=128,
)


@pytest.mark.slow
def test_dense_stack_manifolds():
    state = _stack_state(4)
    cand = pair_candidates(state, CFG)
    cts = _pair_contacts_boxes_pallas(state, cand, CFG)
    act = np.asarray(cts.active)
    depth = np.asarray(cts.depth)
    nrm = np.asarray(cts.normal)
    # three stacked interfaces, 4 corner contacts each
    assert act.sum() == 12, act.sum()
    np.testing.assert_allclose(depth[act], 0.02, atol=1e-4)
    # all normals vertical (B->A for a-above-b ordering is +-y)
    assert np.all(np.abs(nrm[1][act]) > 0.999)
    assert np.all(np.isfinite(depth))
    # keys are stable feature ids (unique among actives)
    keys = np.asarray(cts.key)[act]
    assert len(np.unique(keys)) == len(keys)


def test_kernel_gated_on_pair_buckets():
    # narrowphase_pallas defaults ON but engages only with the bucketed
    # sweep (whose layout makes the kernel's fixed window safe); a plain
    # sweep keeps the XLA fast path and still steps fine
    cfg = SimConfig(ground_plane=True, pair_collisions=True,
                    boxes_only=True, broadphase="sweep", sweep_window=4)
    assert cfg.narrowphase_pallas and not cfg.pair_buckets
    s = _stack_state(3)
    out = step(s, cfg)
    assert np.all(np.isfinite(np.asarray(out.pos)))
