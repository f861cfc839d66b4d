"""Mixed box+hull scenes: build-time conversion to a uniform convex
narrow phase (SceneBuilder.build mixed_as_hulls) and a mixed-stack
stability rollout.

The reference has no collision at all (SURVEY.md §0); this pins the new
capability's behavior at the weakest previous spot — box↔hull pairs used
to fall back to the vertex-face-only generic path (no edge-edge), with no
warning. Now a mixed scene is converted so every pair rides the complete
hull-hull SAT (ops/hullhull.py: face axes + precomputed edge-dir axes).
"""

import numpy as np
import jax
import pytest

from physics_tpu.config import SimConfig
from physics_tpu.engine import prepare_contacts, rollout
from physics_tpu.io.meshes import box_inertia
from physics_tpu.io.primitives import beveled_cube_mesh
from physics_tpu.scene import SceneBuilder
from physics_tpu.state import SHAPE_BOX, SHAPE_HULL


def _mixed_builder():
    b = SceneBuilder()
    verts, _ = beveled_cube_mesh(size=0.5, bevel=0.1)
    hull = b.add_hull(verts)
    i = b.add_body(pos=(0.0, 0.5, 0.0), inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_hull(i, hull, friction=0.6)
    j = b.add_body(pos=(0.02, 1.52, 0.01),
                   inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_box(j, (0.5, 0.5, 0.5), friction=0.6)
    return b


def test_mixed_scene_builds_as_hulls():
    state = _mixed_builder().build()
    st = np.asarray(state.shapes.stype)
    assert (st == SHAPE_HULL).all(), st
    # the converted box keeps its friction and gains an 8-vertex hull
    assert state.hulls.verts.shape[0] == 2
    hi = int(np.asarray(state.shapes.hull_index)[1])
    vc = int(np.asarray(state.hulls.vert_count)[hi])
    assert vc == 8
    assert np.asarray(state.shapes.friction)[1] == pytest.approx(0.6)


def test_mixed_opt_out_keeps_boxes():
    state = _mixed_builder().build(mixed_as_hulls=False)
    st = np.asarray(state.shapes.stype)
    assert st[0] == SHAPE_HULL and st[1] == SHAPE_BOX


def test_pure_box_scene_unconverted():
    b = SceneBuilder()
    i = b.add_body(pos=(0, 0.5, 0), inertia=box_inertia((0.5,) * 3, 1.0))
    b.set_box(i, (0.5,) * 3)
    state = b.build()
    assert int(np.asarray(state.shapes.stype)[0]) == SHAPE_BOX


def test_mixed_stack_stable():
    """Box stacked on a beveled hull on the ground: no silent fallback —
    the converted scene must rest without sinking or toppling."""
    cfg = SimConfig(
        compat=False, ground_plane=True, pair_collisions=True,
        contact_iters=16, dt=1.0 / 60.0,
    )
    state = prepare_contacts(_mixed_builder().build(), cfg)
    final, _ = rollout(state, cfg, num_steps=180)
    pos = np.asarray(jax.device_get(final.pos))
    vel = np.asarray(jax.device_get(final.vel))
    assert np.isfinite(pos).all()
    # bottom hull rests near y=0.5, box rests near y=1.5 (slop-scale sag)
    assert 0.40 < pos[0, 1] < 0.60, pos
    assert 1.35 < pos[1, 1] < 1.65, pos
    # no lateral escape, settled velocities
    assert np.all(np.abs(pos[:, [0, 2]]) < 0.5), pos
    assert np.max(np.abs(vel)) < 0.05, vel


def test_multi_hull_type_fallback_is_loud():
    """A hulls_only scene with TWO distinct hull shapes loses the
    shared-hull fast path (ops/hullhull_batched.py engages only for
    exactly one registered hull); prepare_contacts must warn about the
    ~10x-slower generic fallback — never silently degrade."""
    import pytest

    from physics_tpu.io.primitives import beveled_cube_mesh

    b = SceneBuilder()
    v1, _ = beveled_cube_mesh(size=0.5, bevel=0.1)
    v2, _ = beveled_cube_mesh(size=0.4, bevel=0.05)
    h1, h2 = b.add_hull(v1), b.add_hull(v2)
    for k, h in enumerate((h1, h2)):
        i = b.add_body(pos=(1.2 * k, 2.0, 0.0),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_hull(i, h)
    state = b.build()
    cfg = SimConfig(
        compat=False, ground_plane=True, pair_collisions=True,
        hulls_only=True, contact_iters=8, dt=1.0 / 60.0,
    )
    with pytest.warns(UserWarning, match="distinct hull"):
        prepare_contacts(state, cfg)
