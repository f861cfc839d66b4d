"""Host-side mesh geometry: convex hulls and inertia tensors.

The reference loads cube.obj only for rendering and hard-codes identity
inertia (reference: src/physics/rigid_body.rs:71, src/resources.rs:32-120).
Here meshes feed the physics: convex hulls for the GJK narrow phase and
exact polyhedron inertia tensors (Mirtich's divergence-theorem integrals).
All of this runs once at scene-build time on host (NumPy) — never in the
jitted step.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _face_normal(verts: np.ndarray, tri) -> np.ndarray:
    a, b, c = verts[tri[0]], verts[tri[1]], verts[tri[2]]
    n = np.cross(b - a, c - a)
    norm = np.linalg.norm(n)
    return n / norm if norm > 0 else n


def convex_hull(points: np.ndarray, tol: float = 1e-7):
    """Incremental 3-D convex hull. Returns (vertex_indices, faces [F,3]).

    Faces are index triples into `points` with outward orientation. O(n·F)
    incremental construction — fine for scene-build-time hull extraction of
    meshes up to a few thousand vertices.
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 4:
        raise ValueError("need at least 4 points for a 3D hull")

    # initial simplex: extreme points
    i0 = int(np.argmin(pts[:, 0]))
    i1 = int(np.argmax(np.linalg.norm(pts - pts[i0], axis=1)))
    d01 = pts[i1] - pts[i0]
    cr = np.cross(d01, pts - pts[i0])
    i2 = int(np.argmax(np.linalg.norm(cr, axis=1)))
    nrm = np.cross(d01, pts[i2] - pts[i0])
    i3 = int(np.argmax(np.abs(np.dot(pts - pts[i0], nrm))))
    if abs(np.dot(pts[i3] - pts[i0], nrm)) < tol:
        raise ValueError("degenerate (coplanar) point set")

    faces = [(i0, i1, i2), (i0, i2, i3), (i0, i3, i1), (i1, i3, i2)]
    centroid = pts[[i0, i1, i2, i3]].mean(axis=0)

    def orient(tri):
        nn = _face_normal(pts, tri)
        if np.dot(nn, pts[tri[0]] - centroid) < 0:
            return (tri[0], tri[2], tri[1])
        return tri

    faces = [orient(f) for f in faces]

    for p in range(n):
        if p in (i0, i1, i2, i3):
            continue
        visible = []
        for fi, f in enumerate(faces):
            nn = _face_normal(pts, f)
            if np.dot(nn, pts[p] - pts[f[0]]) > tol:
                visible.append(fi)
        if not visible:
            continue
        # horizon = edges of visible faces shared with exactly one visible face
        edge_count = {}
        for fi in visible:
            a, b, c = faces[fi]
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count.setdefault(key, []).append(e)
        horizon = [es[0] for es in edge_count.values() if len(es) == 1]
        faces = [f for fi, f in enumerate(faces) if fi not in set(visible)]
        for (a, b) in horizon:
            faces.append((a, b, p))

    used = sorted({i for f in faces for i in f})
    return np.asarray(used, np.int64), np.asarray(faces, np.int64)


def convex_hull_faces(points: np.ndarray, merge_tol: float = 1e-5
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Unique outward face planes (normals [F,3], offsets [F]) of the hull of
    `points`, with coplanar triangles merged. Inside test: n·x ≤ offset."""
    pts = np.asarray(points, np.float64)
    _, faces = convex_hull(pts)
    planes = []
    for f in faces:
        nn = _face_normal(pts, f)
        off = float(np.dot(nn, pts[f[0]]))
        dup = any(
            np.linalg.norm(nn - p[0]) < merge_tol and abs(off - p[1]) < merge_tol
            for p in planes
        )
        if not dup:
            planes.append((nn, off))
    normals = np.asarray([p[0] for p in planes], np.float32)
    offsets = np.asarray([p[1] for p in planes], np.float32)
    return normals, offsets


def convex_hull_face_polygons(points: np.ndarray, tol: float = 1e-5):
    """Unique hull face planes plus their ordered boundary polygons.

    Returns (normals [F,3], offsets [F], polys: list of F index lists into
    `points`, each ordered counter-clockwise seen from outside). Feeds the
    hull-hull SAT/clipping narrow phase, which needs face polygons for
    reference-face clipping (the HullSet face_verts arrays).
    """
    pts = np.asarray(points, np.float64)
    normals, offsets = convex_hull_faces(pts, merge_tol=tol)
    polys = []
    for n, off in zip(normals.astype(np.float64), offsets.astype(np.float64)):
        on_face = np.nonzero(np.abs(pts @ n - off) < 1e-4 * max(1.0, abs(off)))[0]
        center = pts[on_face].mean(axis=0)
        # 2D basis in the face plane
        ref = np.array([1.0, 0.0, 0.0])
        if abs(n[0]) > 0.9:
            ref = np.array([0.0, 1.0, 0.0])
        t1 = np.cross(n, ref)
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        rel = pts[on_face] - center
        ang = np.arctan2(rel @ t2, rel @ t1)
        order = on_face[np.argsort(ang)]
        # ensure CCW when viewed from outside (along -n): the signed area
        # in the (t1, t2) basis must be positive with (t1, t2, n) RH
        poly = order.tolist()
        a2 = 0.0
        p2d = np.stack([(pts[poly] - center) @ t1, (pts[poly] - center) @ t2],
                       axis=1)
        for i in range(len(poly)):
            j = (i + 1) % len(poly)
            a2 += p2d[i, 0] * p2d[j, 1] - p2d[j, 0] * p2d[i, 1]
        if a2 < 0:
            poly = poly[::-1]
        polys.append(poly)
    return normals, offsets, polys


def mesh_inertia(verts: np.ndarray, faces: np.ndarray, density: float = 1.0):
    """Mass, center of mass, and inertia tensor (about the COM) of a closed
    triangle mesh, via the covariance/canonical-tetrahedron method.

    Returns (mass, com [3], inertia [3,3]). Faces must be outward-oriented
    triangles. Exact for polyhedra (same results as Mirtich's integrals).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)

    # canonical tetrahedron covariance
    c_canonical = np.full((3, 3), 1.0 / 120.0)
    np.fill_diagonal(c_canonical, 1.0 / 60.0)

    cov = np.zeros((3, 3))
    mass = 0.0
    com = np.zeros(3)
    for f in faces:
        a, b, c = verts[f[0]], verts[f[1]], verts[f[2]]
        t = np.column_stack([a, b, c])  # maps canonical tet → this tet
        det = np.linalg.det(t)
        cov += det * (t @ c_canonical @ t.T)
        vol6 = det  # 6 × signed volume of tet (origin, a, b, c)
        mass += vol6 / 6.0
        com += vol6 / 6.0 * (a + b + c) / 4.0

    mass = float(mass)
    if mass <= 0:
        raise ValueError("mesh has non-positive volume — check orientation")
    com /= mass

    # shift covariance to COM, convert to inertia tensor
    cov -= mass * np.outer(com, com)
    inertia = np.trace(cov) * np.eye(3) - cov
    return (
        np.float32(mass * density),
        com.astype(np.float32),
        (inertia * density).astype(np.float32),
    )


def support_decimate(points: np.ndarray, n_dirs: int = 256) -> np.ndarray:
    """Reduce a convex point cloud to its support set over a direction fan.

    Collision hulls only ever enter the pipeline through their support
    function (SAT extents, GJK), so the right decimation keeps the argmax
    vertex of max(d·x) for a dense fan of directions `d` (Fibonacci
    sphere) plus the 6 axis directions. For smooth-beveled meshes (e.g.
    the reference's 216-vert multi-segment bevel cube, res/cube.obj) this
    collapses near-coplanar bevel facets to a few-dozen-vertex hull whose
    support function matches the original to the facet sag.
    """
    pts = np.asarray(points, np.float64)
    k = np.arange(n_dirs, dtype=np.float64)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    z = 1.0 - 2.0 * (k + 0.5) / n_dirs
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    dirs = np.stack([r * np.cos(golden * k), r * np.sin(golden * k), z], 1)
    dirs = np.concatenate([dirs, np.eye(3), -np.eye(3)], axis=0)
    idx = np.unique(np.argmax(dirs @ pts.T, axis=1))
    return pts[idx].astype(np.float32)


def chamfer_directions() -> np.ndarray:
    """The 26 symmetric support directions (±axes, ±edge diagonals,
    ±corner diagonals) — the natural plane set for chamfered-cube-like
    collision hulls such as the reference's beveled cube
    (reference: res/cube.obj, a multi-segment Blender bevel)."""
    dirs = []
    for x in (-1, 0, 1):
        for y in (-1, 0, 1):
            for z in (-1, 0, 1):
                if x == y == z == 0:
                    continue
                d = np.array([x, y, z], np.float64)
                dirs.append(d / np.linalg.norm(d))
    return np.asarray(dirs)


def plane_cut_hull(points: np.ndarray,
                   dirs: np.ndarray | None = None,
                   pad: float = 0.0) -> np.ndarray:
    """Outer-approximation decimation: intersect the support half-spaces
    of `points` along `dirs` and return the VERTICES of that H-polytope.

    Unlike `support_decimate` (which keeps a subset of the original
    points and produces an irregular triangulated hull), the result's
    convex hull has EXACTLY one planar face per binding direction — so
    coplanar-face merging, face polygons, and unique-edge-direction
    extraction all stay small and regular. For the reference bevel cube
    with the 26 `chamfer_directions`, this yields a 48-vert, 26-face,
    ~13-edge-direction chamfered cube that circumscribes the true hull
    (support error ≤ the bevel sag; outer approximations can't tunnel).

    Vertex enumeration: all 3-plane intersections, kept when they satisfy
    every half-space (tolerance scaled to the cloud size), deduplicated.
    """
    pts = np.asarray(points, np.float64)
    if dirs is None:
        dirs = chamfer_directions()
    dirs = np.asarray(dirs, np.float64)
    offs = np.max(pts @ dirs.T, axis=0) + pad
    scale = float(np.max(np.abs(pts))) or 1.0
    eps = 1e-7 * scale
    m = dirs.shape[0]
    verts = []
    for i in range(m):
        for j in range(i + 1, m):
            for k in range(j + 1, m):
                a = np.stack([dirs[i], dirs[j], dirs[k]])
                det = np.linalg.det(a)
                if abs(det) < 1e-9:
                    continue
                x = np.linalg.solve(a, np.array(
                    [offs[i], offs[j], offs[k]]))
                if np.max(np.abs(x)) > 10.0 * scale:
                    continue
                if np.all(dirs @ x <= offs + eps):
                    verts.append(x)
    v = np.asarray(verts)
    # dedup within tolerance (corner intersections repeat across triples)
    keyed = np.round(v / (1e-6 * scale)).astype(np.int64)
    _, idx = np.unique(keyed, axis=0, return_index=True)
    return v[np.sort(idx)].astype(np.float32)


def box_inertia(half_extents, mass: float) -> np.ndarray:
    """Solid-box inertia tensor about its COM."""
    hx, hy, hz = [float(h) for h in half_extents]
    m = float(mass)
    return np.diag([
        m / 3.0 * (hy * hy + hz * hz),
        m / 3.0 * (hx * hx + hz * hz),
        m / 3.0 * (hx * hx + hy * hy),
    ]).astype(np.float32)


def sphere_inertia(radius: float, mass: float) -> np.ndarray:
    i = 2.0 / 5.0 * float(mass) * float(radius) ** 2
    return (np.eye(3) * i).astype(np.float32)
