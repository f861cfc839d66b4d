"""Reference asset loading (the real `res/` files, not procedural stand-ins).

The reference ships exactly four assets (reference: res/cube.obj — a
216-vert bevel-edged cube exported from Blender 2.82, res/cube.mtl with one
material referencing map_Kd cube-diffuse.jpg and map_Bump cube-normal.png;
consumed via tobj in src/resources.rs:32-120 and copied next to the binary
by build.rs:6-16). This module is the equivalent of that resource root
resolution: it finds the real asset directory and derives the physics data
(convex hull, Mirtich inertia) from the actual mesh rather than from the
procedural `io/primitives.beveled_cube_mesh` approximation.

Resolution order for the asset directory:
  1. the PHYSICS_TPU_RES environment variable,
  2. a `res/` directory at the repository root,
  3. the read-only reference checkout (/root/reference/res), if mounted.
Returns None when none exist — callers fall back to procedural assets so
the framework works standalone.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from physics_tpu.io.meshes import mesh_inertia, plane_cut_hull
from physics_tpu.io.objloader import Model, combined_positions, load_obj

_FALLBACK_DIRS = (
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "res"),
    "/root/reference/res",
)


def reference_res_dir() -> Optional[str]:
    """The asset directory holding cube.obj/cube.mtl/textures, or None."""
    env = os.environ.get("PHYSICS_TPU_RES")
    candidates = ((env,) if env else ()) + _FALLBACK_DIRS
    for d in candidates:
        if d and os.path.isfile(os.path.join(d, "cube.obj")):
            return d
    return None


@dataclass
class CubeAsset:
    """The reference demo cube, loaded from the real OBJ.

    verts/faces are the raw triangulated render mesh; hull_verts is the
    deduplicated point cloud for collision; inertia is the Mirtich
    body-frame tensor of the actual beveled solid at the given mass
    (slightly smaller than a sharp cube's m/12·(…) because the bevels
    shave the corners)."""

    model: Model
    verts: np.ndarray          # [V, 3] unified render vertices
    faces: np.ndarray          # [F, 3] triangles
    hull_verts: np.ndarray     # [H, 3] unique positions (full hull)
    collision_verts: np.ndarray  # [h, 3] support-decimated collision hull
    inertia: np.ndarray        # [3, 3] body-frame inertia (mass `mass`)
    mass: float
    volume: float
    diffuse_texture: Optional[str]   # absolute path or None
    normal_texture: Optional[str]


def load_cube_asset(mass: float = 1.0,
                    res_dir: Optional[str] = None) -> CubeAsset:
    """Load the real reference cube (raises FileNotFoundError if absent).

    Mirrors what src/resources.rs:32-120 produces for rendering (unified
    single-index vertices, material 0 with the diffuse map) and adds what
    the reference never computes: the convex hull and the true inertia
    tensor of the beveled solid.
    """
    d = res_dir or reference_res_dir()
    if d is None:
        raise FileNotFoundError(
            "reference assets not found (set PHYSICS_TPU_RES or place "
            "cube.obj under <repo>/res)")
    model = load_obj(os.path.join(d, "cube.obj"))
    pts = combined_positions(model)
    # unify duplicated corner vertices (the OBJ splits them per-face-normal)
    hull_verts = np.unique(np.round(pts.astype(np.float64), 6), axis=0)
    hull_verts = hull_verts.astype(np.float32)
    from physics_tpu.io.meshes import convex_hull

    _, hull_tris = convex_hull(hull_verts)
    volume, com, inertia = mesh_inertia(hull_verts, hull_tris, density=1.0)
    inertia = np.asarray(inertia, np.float64) * (mass / float(volume))

    mesh = model.meshes[0]
    mat = model.materials[mesh.material] if model.materials else None
    tex = lambda name: (os.path.join(d, name)
                        if name and os.path.isfile(os.path.join(d, name))
                        else None)
    return CubeAsset(
        model=model,
        verts=np.concatenate([m.positions for m in model.meshes], axis=0),
        faces=np.concatenate(
            [m.triangles + off for m, off in zip(
                model.meshes,
                np.cumsum([0] + [len(m.positions)
                                 for m in model.meshes[:-1]]))],
            axis=0),
        hull_verts=hull_verts,
        # plane-cut outer decimation: the 26 chamfer support planes of
        # the true hull, vertex-enumerated → a 48-vert / 26-planar-face /
        # ~13-edge-direction chamfered cube (support error ≤ 0.013 vs the
        # full 216-vert multi-segment bevel, outer so it can't tunnel).
        # The old inner `support_decimate` kept 32 original points whose
        # hull re-triangulated into 60 non-coplanar faces with 82 edge
        # directions — a 47x larger edge-edge SAT per pair.
        collision_verts=plane_cut_hull(hull_verts),
        inertia=inertia.astype(np.float32),
        mass=float(mass),
        volume=float(volume),
        diffuse_texture=tex(mat.diffuse_texture) if mat else None,
        normal_texture=tex(mat.normal_texture) if mat else None,
    )
