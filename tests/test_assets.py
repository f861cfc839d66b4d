"""Real reference asset loading (io/assets.py).

Pins loader output against known properties of the actual files
(reference: res/cube.obj — 216-vert Blender 2.82 bevel cube; res/cube.mtl
— one material with map_Kd cube-diffuse.jpg and map_Bump cube-normal.png;
consumed by src/resources.rs:32-120). Skipped when no asset directory
resolves (the framework stays standalone)."""

import numpy as np
import pytest

from physics_tpu.io.assets import load_cube_asset, reference_res_dir

pytestmark = pytest.mark.skipif(
    reference_res_dir() is None, reason="reference assets not mounted")


def test_cube_obj_known_properties():
    a = load_cube_asset()
    # 216 unique positions (reference res/cube.obj vertex count)
    assert a.hull_verts.shape == (216, 3)
    # coordinates span exactly ±1 with the 0.9 bevel band
    assert np.isclose(np.abs(a.hull_verts).max(), 1.0)
    # fan-triangulated faces: 218 polygons -> 428 triangles
    assert a.faces.shape[0] == 428
    # beveled solid: volume strictly between the 0.9-cube and the full cube
    assert 0.9**0 * 7.2 < a.volume < 8.0
    # inertia: isotropic (cube symmetry), below the sharp cube's m/3·2h²
    d = np.diag(a.inertia)
    assert np.allclose(d, d[0], rtol=1e-3)
    assert 0.55 < d[0] < 2.0 / 3.0
    off_diag = a.inertia - np.diag(d)
    assert np.max(np.abs(off_diag)) < 1e-4


def test_cube_mtl_material_refs():
    a = load_cube_asset()
    mats = a.model.materials
    assert len(mats) == 1
    assert mats[0].name == "Material.001"
    assert a.diffuse_texture and a.diffuse_texture.endswith(
        "cube-diffuse.jpg")
    assert a.normal_texture and a.normal_texture.endswith("cube-normal.png")


def test_collision_hull_decimation():
    a = load_cube_asset()
    cv = a.collision_verts
    # plane-cut OUTER decimation: the 26 chamfer support planes of the
    # real bevel cube, vertex-enumerated — a 48-vert chamfered cube whose
    # hull has exactly 26 planar faces and 9 unique edge directions (the
    # old inner support_decimate re-triangulated into 60 faces / 82 edge
    # directions, a 47x larger edge-edge SAT per pair)
    assert cv.shape[0] == 48
    # support function: circumscribes the true hull (can't tunnel), within
    # the bevel sag outward on a probe fan
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((512, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    s_full = (dirs @ a.hull_verts.T).max(1)
    s_dec = (dirs @ cv.T).max(1)
    assert np.all(s_dec >= s_full - 1e-5)
    assert np.max(s_dec - s_full) < 0.02

    from physics_tpu.io.meshes import convex_hull_face_polygons

    normals, _, polys = convex_hull_face_polygons(cv)
    assert normals.shape[0] == 26
    assert sorted(set(len(p) for p in polys)) == [4, 6, 8]


def test_mesh_rain_builds_with_real_assets():
    from physics_tpu.scenes import mesh_rain

    state = mesh_rain(n_bodies=4, real_assets=True, size=0.5)
    assert state.num_bodies == 4
    # the real hull registered (more than the procedural 24 verts is fine;
    # the capacity row must match the decimated collision hull)
    assert int(np.asarray(state.hulls.vert_count)[0]) > 8
    # inertia scaled: I(size) = I(file)·size² at fixed unit mass
    d = np.diag(np.asarray(state.inv_inertia[0]))
    assert np.all(d > 0)
