"""Minimal Wavefront OBJ / MTL loader (host-side, NumPy).

Equivalent of the reference's resource pipeline (reference:
src/resources.rs:32-120, which uses tobj with triangulate+single_index and a
material_id fallback of 0). Physics only needs positions and triangles;
texture/material data is parsed and carried through for the export/viewer
path but never touches the device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class Material:
    name: str
    diffuse_texture: Optional[str] = None
    normal_texture: Optional[str] = None
    diffuse_color: tuple = (1.0, 1.0, 1.0)


@dataclass
class Mesh:
    """Triangulated mesh: positions [V,3], triangles [F,3], optional uv/normals."""

    positions: np.ndarray
    triangles: np.ndarray
    tex_coords: Optional[np.ndarray] = None
    normals: Optional[np.ndarray] = None
    material: int = 0  # material_id fallback 0, like resources.rs:96-97


@dataclass
class Model:
    meshes: List[Mesh] = field(default_factory=list)
    materials: List[Material] = field(default_factory=list)


def load_obj(path: str) -> Model:
    """Parse an OBJ file; faces are fan-triangulated (tobj triangulate=true)."""
    positions: List = []
    texcoords: List = []
    normals: List = []
    materials: List[Material] = []
    mat_by_name: Dict[str, int] = {}

    # corner key (v, vt, vn) → unified index (tobj single_index=true)
    meshes: List[Mesh] = []
    cur_faces: List = []
    cur_corners: Dict = {}
    cur_pos: List = []
    cur_uv: List = []
    cur_nrm: List = []
    cur_mat = 0

    def flush():
        nonlocal cur_faces, cur_corners, cur_pos, cur_uv, cur_nrm
        if cur_faces:
            meshes.append(
                Mesh(
                    positions=np.asarray(cur_pos, np.float32),
                    triangles=np.asarray(cur_faces, np.int64),
                    tex_coords=np.asarray(cur_uv, np.float32) if any(
                        u is not None for u in cur_uv
                    ) else None,
                    normals=np.asarray(cur_nrm, np.float32) if any(
                        n is not None for n in cur_nrm
                    ) else None,
                    material=cur_mat,
                )
            )
        cur_faces, cur_corners, cur_pos, cur_uv, cur_nrm = [], {}, [], [], []

    def corner_index(spec: str) -> int:
        if spec in cur_corners:
            return cur_corners[spec]
        parts = spec.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = None
        if len(parts) > 1 and parts[1]:
            t = int(parts[1])
            ti = t - 1 if t > 0 else len(texcoords) + t
        ni = None
        if len(parts) > 2 and parts[2]:
            m = int(parts[2])
            ni = m - 1 if m > 0 else len(normals) + m
        idx = len(cur_pos)
        cur_pos.append(positions[vi])
        cur_uv.append(texcoords[ti] if ti is not None else [0.0, 0.0])
        cur_nrm.append(normals[ni] if ni is not None else [0.0, 0.0, 0.0])
        cur_corners[spec] = idx
        return idx

    with open(path, "r") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            cmd = tok[0]
            if cmd == "v":
                positions.append([float(x) for x in tok[1:4]])
            elif cmd == "vt":
                texcoords.append([float(x) for x in tok[1:3]])
            elif cmd == "vn":
                normals.append([float(x) for x in tok[1:4]])
            elif cmd == "f":
                idx = [corner_index(s) for s in tok[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    cur_faces.append([idx[0], idx[k], idx[k + 1]])
            elif cmd == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), tok[1])
                if os.path.exists(mtl_path):
                    for m in load_mtl(mtl_path):
                        mat_by_name[m.name] = len(materials)
                        materials.append(m)
            elif cmd == "usemtl":
                flush()
                cur_mat = mat_by_name.get(tok[1], 0)
            elif cmd in ("o", "g"):
                flush()
    flush()

    if not materials:
        materials.append(Material(name="default"))
    return Model(meshes=meshes, materials=materials)


def load_mtl(path: str) -> List[Material]:
    mats: List[Material] = []
    cur: Optional[Material] = None
    with open(path, "r") as fh:
        for line in fh:
            tok = line.strip().split()
            if not tok or tok[0].startswith("#"):
                continue
            if tok[0] == "newmtl":
                cur = Material(name=tok[1])
                mats.append(cur)
            elif cur is not None and tok[0] == "map_Kd":
                cur.diffuse_texture = tok[-1]
            elif cur is not None and tok[0] in ("map_Bump", "bump", "norm"):
                cur.normal_texture = tok[-1]
            elif cur is not None and tok[0] == "Kd":
                cur.diffuse_color = tuple(float(x) for x in tok[1:4])
    return mats


def combined_positions(model: Model) -> np.ndarray:
    """All vertex positions of a model, concatenated (for hull extraction)."""
    return np.concatenate([m.positions for m in model.meshes], axis=0)
