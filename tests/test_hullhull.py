"""Hull-hull narrow phase (face-SAT + clipping) and GJK distance tests."""

import numpy as np
import jax.numpy as jnp

from physics_tpu import SceneBuilder, SimConfig
from physics_tpu.engine import rollout
from physics_tpu.io.meshes import convex_hull_face_polygons, mesh_inertia
from physics_tpu.io.primitives import beveled_cube_mesh, box_mesh
from physics_tpu.ops.hullhull import HullData, gjk_distance, hull_hull_manifold


def make_hull_data(verts):
    verts = np.asarray(verts, np.float32)
    normals, offsets, polys = convex_hull_face_polygons(verts)
    f = len(normals)
    e = max(len(p) for p in polys)
    fverts = np.zeros((f, e), np.int32)
    fcnt = np.zeros(f, np.int32)
    for i, p in enumerate(polys):
        fverts[i, : len(p)] = p
        fverts[i, len(p):] = p[0]
        fcnt[i] = len(p)
    dirs = []
    for p in polys:
        for a, b in zip(p, list(p[1:]) + [p[0]]):
            d = verts[b] - verts[a]
            d = d / max(np.linalg.norm(d), 1e-9)
            if not any(abs(float(d @ e)) > 1 - 1e-5 for e in dirs):
                dirs.append(d)
    dirs = np.asarray(dirs, np.float32)
    return HullData(
        verts=jnp.asarray(verts),
        vert_mask=jnp.ones(len(verts), jnp.float32),
        face_n=jnp.asarray(normals),
        face_off=jnp.asarray(offsets),
        face_mask=jnp.ones(f, jnp.float32),
        face_verts=jnp.asarray(fverts),
        face_vert_count=jnp.asarray(fcnt),
        edge_dirs=jnp.asarray(dirs),
        edge_dir_mask=jnp.ones(len(dirs), jnp.float32),
    )


I3 = jnp.eye(3)


def test_cube_hulls_stacked_manifold():
    h = make_hull_data(box_mesh((0.5, 0.5, 0.5))[0])
    pts, n, d, v = hull_hull_manifold(
        jnp.array([0.0, 0.98, 0.0]), I3, h, jnp.array([0.0, 0.0, 0.0]), I3, h
    )
    v = np.asarray(v)
    assert v.sum() == 4
    np.testing.assert_allclose(np.asarray(d)[v], 0.02, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n)[v], [[0, 1, 0]] * 4, atol=1e-5)
    xs = sorted(p[0] for p in np.asarray(pts)[v])
    np.testing.assert_allclose(xs, [-0.5, -0.5, 0.5, 0.5], atol=1e-4)


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return jnp.asarray(
        np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32))


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return jnp.asarray(
        np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32))


def test_edge_edge_crossed_cubes():
    """A rotated 45° about x over B rotated 45° about z: the true contact
    normal (+y) is the cross of the two supporting edge directions and is
    NOT any face normal of either cube — requires the edge-edge SAT."""
    h = make_hull_data(box_mesh((0.5, 0.5, 0.5))[0])
    r = 0.5 * np.sqrt(2.0)
    depth_want = 0.05
    pos_a = jnp.array([0.0, 2 * r - depth_want, 0.0])
    pts, n, d, v = hull_hull_manifold(
        pos_a, _rot_x(np.pi / 4), h, jnp.zeros(3), _rot_z(np.pi / 4), h
    )
    v = np.asarray(v)
    assert v.sum() == 1, v.sum()
    k = int(np.argmax(v))
    np.testing.assert_allclose(np.asarray(d)[k], depth_want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n)[k], [0, 1, 0], atol=1e-5)
    p = np.asarray(pts)[k]
    np.testing.assert_allclose(p[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(p[2], 0.0, atol=1e-5)
    np.testing.assert_allclose(p[1], r - 0.5 * depth_want, atol=1e-3)


def test_face_case_unchanged_by_edge_axes():
    """Resting face contact still returns the 4-point clipped manifold."""
    h = make_hull_data(box_mesh((0.5, 0.5, 0.5))[0])
    pts, n, d, v = hull_hull_manifold(
        jnp.array([0.0, 0.98, 0.0]), I3, h, jnp.zeros(3), I3, h
    )
    assert np.asarray(v).sum() == 4


def test_separated_hulls_no_manifold():
    h = make_hull_data(beveled_cube_mesh(0.5, 0.08)[0])
    _, _, _, v = hull_hull_manifold(
        jnp.array([0.0, 3.0, 0.0]), I3, h, jnp.zeros(3), I3, h
    )
    assert not np.any(np.asarray(v))


def test_gjk_distance_exact_for_cubes():
    v, _ = box_mesh((0.5, 0.5, 0.5))
    va = jnp.asarray(v)
    mask = jnp.ones(len(v))
    d, direction, sep = gjk_distance(va + jnp.array([2.0, 0, 0]), mask, va, mask)
    assert bool(sep)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(direction), [1, 0, 0], atol=1e-5)


def test_gjk_detects_overlap():
    v, _ = box_mesh((0.5, 0.5, 0.5))
    va = jnp.asarray(v)
    mask = jnp.ones(len(v))
    d, _, sep = gjk_distance(va + jnp.array([0.3, 0.2, 0.0]), mask, va, mask)
    assert not bool(sep)
    assert float(d) == 0.0


def test_gjk_diagonal_direction():
    v, _ = box_mesh((0.5, 0.5, 0.5))
    va = jnp.asarray(v)
    mask = jnp.ones(len(v))
    d, direction, sep = gjk_distance(
        va + jnp.array([2.0, 2.0, 0.0]), mask, va, mask
    )
    assert bool(sep)
    np.testing.assert_allclose(float(d), np.sqrt(2.0), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(direction), [np.sqrt(0.5), np.sqrt(0.5), 0], atol=1e-4
    )


def test_beveled_hull_stack_stable():
    """Flat-face hull stacking — the degenerate case vertex-face can't do."""
    hv, ht = beveled_cube_mesh(0.5, 0.08)
    m, _, inertia = mesh_inertia(hv, ht)
    b = SceneBuilder()
    h = b.add_hull(hv)
    for k in range(3):
        i = b.add_body(pos=(0, 0.5 + 1.0 * k + 0.002 * k, 0),
                       mass=float(m), inertia=inertia)
        b.set_hull(i, h, friction=0.6)
    cfg = SimConfig(compat=False, ground_plane=True, pair_collisions=True,
                    contact_iters=32, dt=1.0 / 120.0)
    final, _ = rollout(b.build(), cfg, num_steps=480)
    y = np.sort(np.asarray(final.pos[:, 1]))
    gaps = np.diff(y)
    assert np.all(gaps > 0.9) and np.all(gaps < 1.1), y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.01


def test_cube_drop_rests_on_ground():
    """BASELINE config 1: single cube.obj hull dropped onto the ground
    (scenes.cube_drop — real res/cube.obj hull when mounted, procedural
    bevel cube otherwise). It must come to rest with its lowest face on
    the plane: resting height ≈ size (bevel shaves a few mm) and
    negligible residual velocity."""
    from physics_tpu.engine import rollout
    from physics_tpu.scenes import cube_drop, drop_config

    final, _ = rollout(cube_drop(height=1.5, size=0.5), drop_config(),
                       num_steps=480)
    y = float(final.pos[0, 1])
    assert 0.40 < y < 0.55, y
    assert float(np.max(np.abs(np.asarray(final.vel)))) < 0.02
    assert np.all(np.isfinite(np.asarray(final.quat)))
