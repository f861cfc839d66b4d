"""Unit tests for the SAT + clipping box-box manifold."""

import numpy as np
import jax.numpy as jnp

from physics_tpu.ops.boxbox import box_box_manifold, _clip_polygon

I3 = jnp.eye(3)
H = jnp.array([0.5, 0.5, 0.5])


def manifold(pa, ra, pb, rb, ha=H, hb=H):
    pts, n, d, v = box_box_manifold(
        jnp.asarray(pa, jnp.float32), ra, ha,
        jnp.asarray(pb, jnp.float32), rb, hb)
    v = np.asarray(v)
    return np.asarray(pts)[v], np.asarray(n)[v], np.asarray(d)[v]


def test_stacked_boxes_full_face_manifold():
    pts, n, d = manifold([0, 0.98, 0], I3, [0, 0, 0], I3)
    assert len(d) == 4
    np.testing.assert_allclose(d, 0.02, atol=1e-6)
    np.testing.assert_allclose(n, [[0, 1, 0]] * 4, atol=1e-6)
    # contact points at the overlap corners
    xs = sorted(p[0] for p in pts)
    np.testing.assert_allclose(xs, [-0.5, -0.5, 0.5, 0.5], atol=1e-5)


def test_separated_boxes_no_contacts():
    pts, _, _ = manifold([0, 3.0, 0], I3, [0, 0, 0], I3)
    assert len(pts) == 0
    pts, _, _ = manifold([2.0, 0.2, 0.1], I3, [0, 0, 0], I3)
    assert len(pts) == 0


def test_offset_overlap_clipped_region():
    pts, n, d = manifold([0.5, 0.95, 0], I3, [0, 0, 0], I3)
    assert len(d) == 4
    np.testing.assert_allclose(n[0], [0, 1, 0], atol=1e-6)
    xs = np.array(sorted(p[0] for p in pts))
    # clipped overlap strip spans x ∈ [0, 0.5]
    np.testing.assert_allclose(xs, [0.0, 0.0, 0.5, 0.5], atol=1e-5)


def test_rotated_box_edge_on_face():
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rz = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    # rotated box resting its bottom edge on the flat box's top face
    pts, n, d = manifold([0, 1.18, 0], rz, [0, 0, 0], I3)
    assert len(d) == 2  # a line contact clips to 2 points
    np.testing.assert_allclose(n[0], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(pts[:, 0], 0.0, atol=1e-5)  # edge at x=0


def test_edge_edge_cross_contact():
    # two boxes crossed at 90°, touching edge-to-edge diagonally
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rz = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    rx = jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)
    pts, n, d = manifold([0.0, 1.37, 0.0], rz, [0, 0, 0], rx)
    assert len(d) >= 1
    assert np.all(d > 0)


def test_deep_identical_overlap_still_reports():
    """Fully coincident boxes (the vertex-face degenerate case) must still
    produce a manifold with positive depth."""
    pts, n, d = manifold([0, 0.2, 0], I3, [0, 0, 0], I3)
    assert len(d) == 4
    np.testing.assert_allclose(d, 0.8, atol=1e-5)


def test_clip_square_identity():
    poly = jnp.zeros((8, 3), jnp.float32).at[:4].set(
        jnp.array([[0.5, 0.5, -0.1], [0.5, -0.5, -0.1],
                   [-0.5, -0.5, -0.1], [-0.5, 0.5, -0.1]], jnp.float32))
    m = jnp.int32(4)
    for cu, cv, dd in [(1, 0, 0.5), (-1, 0, 0.5), (0, 1, 0.5), (0, -1, 0.5)]:
        poly, m = _clip_polygon(poly, m, jnp.array([cu, cv, dd], jnp.float32))
    assert int(m) == 4
    np.testing.assert_allclose(np.asarray(poly[:4, 2]), -0.1, atol=1e-6)


def test_clip_halved_square():
    poly = jnp.zeros((8, 3), jnp.float32).at[:4].set(
        jnp.array([[1.0, 1.0, 0.0], [1.0, -1.0, 0.0],
                   [-1.0, -1.0, 0.0], [-1.0, 1.0, 0.0]], jnp.float32))
    m = jnp.int32(4)
    poly, m = _clip_polygon(poly, m, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    assert int(m) == 4
    assert float(jnp.max(poly[:4, 0])) <= 1e-6  # clipped at u ≤ 0
