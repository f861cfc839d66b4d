"""Viewer playback: camera-path scripting + offline trajectory rendering."""

import numpy as np
import pytest

from physics_tpu.render.playback import (
    CameraPath,
    play_trajectory,
    render_trajectory_frames,
)


def test_camera_path_interpolation():
    path = CameraPath([
        (0.0, (0, 0, 10), (0, 0, 0)),
        (2.0, (10, 0, 0), (0, 1, 0)),
    ])
    e0, t0 = path.pose(0.0)
    np.testing.assert_allclose(e0, [0, 0, 10])
    e1, t1 = path.pose(2.0)
    np.testing.assert_allclose(e1, [10, 0, 0])
    em, tm = path.pose(1.0)          # cosine ease midpoint = linear mid
    np.testing.assert_allclose(em, [5, 0, 5], atol=1e-5)
    np.testing.assert_allclose(tm, [0, 0.5, 0], atol=1e-5)
    # clamping outside the key range
    np.testing.assert_allclose(path.pose(-1.0)[0], e0)
    np.testing.assert_allclose(path.pose(99.0)[0], e1)
    vp = path.view_proj(0.5)
    assert vp.shape == (4, 4) and np.all(np.isfinite(vp))


def test_monotonic_keyframes_required():
    with pytest.raises(ValueError):
        CameraPath([(1.0, (0, 0, 1), (0, 0, 0)), (1.0, (0, 0, 2), (0, 0, 0))])


def test_render_trajectory_frames(tmp_path):
    from physics_tpu.io.primitives import box_mesh
    from physics_tpu.render import rasterizer

    try:
        rasterizer.ensure_built()
    except Exception:
        pytest.skip("native rasterizer unavailable")

    verts, tris = box_mesh((0.5, 0.5, 0.5))
    t_count, n = 3, 2
    pos = np.zeros((t_count, n, 3), np.float32)
    pos[:, 0, 0] = np.linspace(-1, 1, t_count)
    pos[:, 1, 1] = 1.0
    quat = np.zeros((t_count, n, 4), np.float32)
    quat[..., 0] = 1.0
    cam = CameraPath([(0.0, (0, 2, 8), (0, 0, 0)),
                      (1.0, (2, 2, 8), (0, 0, 0))])
    out = tmp_path / "frames"
    wrote = render_trajectory_frames(
        pos, quat, verts, tris, str(out), camera=cam, fps=3.0,
        width=160, height=120)
    assert wrote == t_count
    files = sorted(out.glob("frame_*.png"))
    assert len(files) == t_count
    # frames differ (the body and the camera move)
    a = files[0].read_bytes()
    b = files[-1].read_bytes()
    assert a != b


def test_play_trajectory_npz(tmp_path):
    from physics_tpu.io.export import save_trajectory
    from physics_tpu.io.primitives import box_mesh
    from physics_tpu.render import rasterizer

    try:
        rasterizer.ensure_built()
    except Exception:
        pytest.skip("native rasterizer unavailable")

    verts, tris = box_mesh((0.5, 0.5, 0.5))
    pos = np.zeros((2, 1, 3), np.float32)
    quat = np.zeros((2, 1, 4), np.float32)
    quat[..., 0] = 1.0
    traj = tmp_path / "traj.npz"
    save_trajectory(str(traj), pos, quat)
    wrote = play_trajectory(str(traj), verts, tris,
                            str(tmp_path / "out"), width=64, height=48)
    assert wrote == 2
