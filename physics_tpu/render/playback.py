"""Trajectory playback: re-render a saved simulation offline.

The reference's viewer is a live wgpu window coupled to the physics loop
(src/rendering.rs); here playback is decoupled from simulation — record a
trajectory on device (engine.rollout(..., sample_every=k) →
io.export.save_trajectory), then render it at leisure with the native
rasterizer and a scripted camera path. Nothing here touches the sim hot
path.

    from physics_tpu.render.playback import CameraPath, play_trajectory
    path = CameraPath([(0.0, (0, 4, 18), (0, 1, 0)),
                       (5.0, (12, 6, 12), (0, 0, 0))])
    play_trajectory("traj.npz", verts, tris, "frames/", camera=path, fps=60)

CLI:  python -m physics_tpu.render.playback traj.npz --out frames
      (renders the shared built-in cube mesh unless --obj is given)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from physics_tpu.render.camera import Camera, Projection, look_at_rh

Vec3 = Tuple[float, float, float]


class CameraPath:
    """Keyframed (time, eye, target) camera path with smooth interpolation.

    Keyframes are piecewise-linear in eye/target with cosine ease-in-out
    inside each segment; before the first / after the last keyframe the
    pose clamps. Produces a view-projection matrix per query time.
    """

    def __init__(self, keyframes: Sequence[Tuple[float, Vec3, Vec3]],
                 width: int = 800, height: int = 600,
                 fovy: float = np.pi / 8):
        if not keyframes:
            raise ValueError("CameraPath needs at least one keyframe")
        self.times = np.asarray([k[0] for k in keyframes], np.float32)
        if np.any(np.diff(self.times) <= 0):
            raise ValueError("keyframe times must be strictly increasing")
        self.eyes = np.asarray([k[1] for k in keyframes], np.float32)
        self.targets = np.asarray([k[2] for k in keyframes], np.float32)
        self.proj = Projection(width, height, fovy=fovy).matrix()

    def pose(self, t: float) -> Tuple[np.ndarray, np.ndarray]:
        ts = self.times
        if t <= ts[0]:
            return self.eyes[0], self.targets[0]
        if t >= ts[-1]:
            return self.eyes[-1], self.targets[-1]
        k = int(np.searchsorted(ts, t) - 1)
        u = (t - ts[k]) / (ts[k + 1] - ts[k])
        u = 0.5 - 0.5 * np.cos(np.pi * u)          # ease in-out
        eye = (1 - u) * self.eyes[k] + u * self.eyes[k + 1]
        tgt = (1 - u) * self.targets[k] + u * self.targets[k + 1]
        return eye, tgt

    def view_proj(self, t: float) -> np.ndarray:
        eye, tgt = self.pose(t)
        return self.proj @ look_at_rh(eye, tgt)


def _static_view_proj(width: int, height: int) -> np.ndarray:
    return Projection(width, height).matrix() @ Camera().view_matrix()


def render_trajectory_frames(
    pos: np.ndarray,                    # [T, N, 3]
    quat: np.ndarray,                   # [T, N, 4] (w, x, y, z)
    verts: np.ndarray,
    tris: np.ndarray,
    out_dir: str,
    camera: Optional[CameraPath] = None,
    fps: float = 60.0,
    width: int = 800,
    height: int = 600,
    colors: Optional[np.ndarray] = None,
) -> int:
    """Rasterize every trajectory sample to `out_dir/frame_%05d.png`.

    Returns the number of frames written. All bodies share one mesh (the
    instanced-draw model of the reference, src/rendering/model.rs).
    """
    from physics_tpu.maths.quaternion import to_matrix_np
    from physics_tpu.render.rasterizer import rasterize, save_png

    os.makedirs(out_dir, exist_ok=True)
    t_count, n, _ = pos.shape
    for f in range(t_count):
        rot = to_matrix_np(quat[f])                     # [N, 3, 3]
        mats = np.zeros((n, 4, 4), np.float32)
        mats[:, :3, :3] = rot
        mats[:, :3, 3] = pos[f]
        mats[:, 3, 3] = 1.0
        vp = (camera.view_proj(f / fps) if camera is not None
              else _static_view_proj(width, height))
        img = rasterize(verts, tris, mats, vp, width, height, colors)
        save_png(os.path.join(out_dir, f"frame_{f:05d}.png"), img)
    return t_count


def play_trajectory(
    traj_path: str,
    verts: np.ndarray,
    tris: np.ndarray,
    out_dir: str,
    camera: Optional[CameraPath] = None,
    fps: float = 60.0,
    **kw,
) -> int:
    """Load an io.export.save_trajectory npz and render it."""
    data = np.load(traj_path)
    return render_trajectory_frames(
        data["pos"], data["quat"], verts, tris, out_dir, camera=camera,
        fps=fps, **kw,
    )


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("traj", help="trajectory .npz (pos [T,N,3], quat [T,N,4])")
    p.add_argument("--out", default="playback_frames")
    p.add_argument("--obj", default=None,
                   help="OBJ mesh shared by all bodies (default: unit cube)")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--fps", type=float, default=60.0)
    p.add_argument("--orbit", type=float, default=0.0,
                   help="orbit the scene center at this radius (0 = static "
                        "reference camera)")
    args = p.parse_args(argv)

    if args.obj:
        from physics_tpu.io.objloader import load_obj

        mesh = load_obj(args.obj).meshes[0]
        verts, tris = mesh.positions, mesh.triangles
    else:
        from physics_tpu.io.primitives import box_mesh

        verts, tris = box_mesh((0.5, 0.5, 0.5))

    camera = None
    if args.orbit > 0:
        data = np.load(args.traj)
        center = data["pos"].mean(axis=(0, 1))
        t_end = data["pos"].shape[0] / args.fps
        keys = []
        for i in range(9):
            a = 2 * np.pi * i / 8
            eye = center + args.orbit * np.array(
                [np.cos(a), 0.35, np.sin(a)])
            keys.append((t_end * i / 8, tuple(eye), tuple(center)))
        camera = CameraPath(keys, args.width, args.height)

    n = play_trajectory(args.traj, verts, tris, args.out, camera=camera,
                        fps=args.fps, width=args.width, height=args.height)
    print(f"wrote {n} frames to {args.out}/")


if __name__ == "__main__":
    main()
