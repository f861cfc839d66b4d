"""FPS camera + perspective projection matching the reference viewer.

Mirrors reference src/rendering/camera.rs:
  * yaw/pitch camera → right-handed look-at view matrix (calc_matrix,
    camera.rs:36-45);
  * perspective projection with the OpenGL→wgpu depth remap
    (OPENGL_TO_WGPU_MATRIX, camera.rs:7-13: z' = 0.5·z + 0.5·w);
  * default pose from RenderingState::new (rendering.rs:145-147):
    position (0, 0, 20), yaw −π/2, pitch −π/20, fovy π/8,
    znear 0.1, zfar 100.

All NumPy, host-side, viewer-only — never in the simulation path.
"""

from __future__ import annotations

import numpy as np

OPENGL_TO_WGPU = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.5, 0.5],
        [0.0, 0.0, 0.0, 1.0],
    ],
    np.float32,
)  # row-major (nalgebra's column-major literal transposed)


def look_at_rh(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    eye = np.asarray(eye, np.float32)
    f = np.asarray(target, np.float32) - eye
    f = f / np.linalg.norm(f)
    up = np.asarray(up, np.float32)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective_gl(aspect: float, fovy: float, znear: float, zfar: float
                   ) -> np.ndarray:
    """nalgebra Perspective3 (OpenGL clip conventions), row-major."""
    f = 1.0 / np.tan(fovy / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (zfar + znear) / (znear - zfar)
    m[2, 3] = 2.0 * zfar * znear / (znear - zfar)
    m[3, 2] = -1.0
    return m


class Camera:
    """Yaw/pitch FPS camera (reference camera.rs:18-46)."""

    def __init__(self, position=(0.0, 0.0, 20.0), yaw=-np.pi / 2,
                 pitch=-np.pi / 20):
        self.position = np.asarray(position, np.float32)
        self.yaw = float(yaw)
        self.pitch = float(pitch)

    def view_matrix(self) -> np.ndarray:
        direction = np.array(
            [
                np.cos(self.pitch) * np.cos(self.yaw),
                np.sin(self.pitch),
                np.cos(self.pitch) * np.sin(self.yaw),
            ],
            np.float32,
        )
        return look_at_rh(self.position, self.position + direction)


class Projection:
    """Perspective + wgpu depth remap (reference camera.rs:48-71)."""

    def __init__(self, width: int, height: int, fovy=np.pi / 8,
                 znear=0.1, zfar=100.0):
        self.aspect = width / height
        self.fovy = fovy
        self.znear = znear
        self.zfar = zfar

    def matrix(self) -> np.ndarray:
        return OPENGL_TO_WGPU @ perspective_gl(
            self.aspect, self.fovy, self.znear, self.zfar
        )


def default_view_proj(width: int = 800, height: int = 600) -> np.ndarray:
    """The reference's startup camera (rendering.rs:145-147)."""
    return Projection(width, height).matrix() @ Camera().view_matrix()
