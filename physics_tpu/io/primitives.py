"""Procedural primitive meshes (host-side, NumPy).

The reference ships a Blender-exported bevel-edged cube (res/cube.obj: 216
verts / 218 faces, coords ±1.0 with a 0.9 bevel band, SURVEY.md §2 #18).
These generators produce equivalent geometry from scratch — used for the
demo scene's mesh, inertia-from-mesh tests, and hull extraction — without
copying the reference's asset bytes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def box_mesh(half=(1.0, 1.0, 1.0)) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned box: (verts [8,3], tris [12,3]), outward-oriented."""
    h = np.asarray(half, np.float32)
    verts = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    ) * h
    # faces as quads (vertex indices into the sign-ordered corner table),
    # wound so normals point outward
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append([a, b, c])
        tris.append([a, c, d])
    return verts, np.asarray(tris, np.int64)


def box_mesh_uv(
    half=(1.0, 1.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """UV-mapped box: (verts [24,3], uvs [24,2], tris [12,3]).

    Each face gets its own 4 vertices with the full [0,1]² UV square
    (the reference cube's per-face UV layout style, res/cube.obj `vt`
    records) — for the textured viewer path (src/shader.wgsl samples
    tex_coords per fragment).
    """
    base_v, base_t = box_mesh(half)
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    uv_quad = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    verts, uvs, tris = [], [], []
    for f, q in enumerate(quads):
        off = 4 * f
        verts.extend(base_v[list(q)])
        uvs.extend(uv_quad)
        tris.append([off + 0, off + 1, off + 2])
        tris.append([off + 0, off + 2, off + 3])
    return (
        np.asarray(verts, np.float32),
        np.asarray(uvs, np.float32),
        np.asarray(tris, np.int64),
    )


def beveled_cube_mesh(
    size: float = 1.0, bevel: float = 0.1
) -> Tuple[np.ndarray, np.ndarray]:
    """Bevel-edged cube spanning ±size with flat faces of half-width
    (size − bevel): 6 square faces + 12 edge bevels + 8 corner triangles
    (26 planes, 24 vertices).

    Geometrically equivalent to the reference's demo asset (±1.0 extents,
    0.9 flat band). Vertices are the permutations (±size, ±band, ±band):
    per corner, 3 vertices each keeping one axis at full extent."""
    s, b = float(size), float(size - bevel)
    pts = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                pts.append([sx * s, sy * b, sz * b])
                pts.append([sx * b, sy * s, sz * b])
                pts.append([sx * b, sy * b, sz * s])
    verts = np.asarray(pts, np.float32)
    from physics_tpu.io.meshes import convex_hull

    _, tris = convex_hull(verts)
    return verts, tris


def uv_sphere_mesh(
    radius: float = 1.0, n_lat: int = 12, n_lon: int = 16
) -> Tuple[np.ndarray, np.ndarray]:
    """UV sphere: (verts, tris), outward-oriented."""
    verts = [[0.0, radius, 0.0]]
    for i in range(1, n_lat):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append([
                radius * np.sin(theta) * np.cos(phi),
                radius * np.cos(theta),
                radius * np.sin(theta) * np.sin(phi),
            ])
    verts.append([0.0, -radius, 0.0])
    verts = np.asarray(verts, np.float32)
    last = len(verts) - 1

    tris = []
    for j in range(n_lon):
        tris.append([0, 1 + (j + 1) % n_lon, 1 + j])
    for i in range(n_lat - 2):
        row0 = 1 + i * n_lon
        row1 = row0 + n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            tris.append([row0 + j, row0 + j2, row1 + j])
            tris.append([row0 + j2, row1 + j2, row1 + j])
    row = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        tris.append([row + j, row + (j + 1) % n_lon, last])
    return verts, np.asarray(tris, np.int64)


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Write a minimal OBJ file (positions + faces)."""
    with open(path, "w") as fh:
        fh.write("# physics_tpu primitive\n")
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in tris:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
