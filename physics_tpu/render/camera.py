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


_SAFE_HALF_PI = np.pi / 2 - 0.0001   # reference camera.rs:15


class CameraController:
    """FPS camera controller, semantics of the reference's
    CameraController (reference: src/rendering/camera.rs:73-183; constructed
    with speed 4.0, sensitivity 0.4 at src/rendering.rs:148).

    Headless-friendly: feed it key states / mouse deltas / scroll amounts
    programmatically and call `update_camera(camera, dt)` once per frame.
    Yaw/pitch rates, the pitch-following scroll ("scrollward") zoom, the
    vertical Space/LShift axis and the ±(π/2 − 1e-4) pitch clamp match the
    reference.
    """

    _KEYS = {
        "w": "forward", "up": "forward",
        "s": "backward", "down": "backward",
        "a": "left", "left": "left",
        "d": "right", "right": "right",
        "space": "up",
        "lshift": "down",
    }

    def __init__(self, speed: float = 4.0, sensitivity: float = 0.4):
        self.speed = float(speed)
        self.sensitivity = float(sensitivity)
        self.amount = {k: 0.0 for k in
                       ("forward", "backward", "left", "right", "up", "down")}
        self.rotate_horizontal = 0.0
        self.rotate_vertical = 0.0
        self.scroll = 0.0

    def process_keyboard(self, key: str, pressed: bool) -> bool:
        """Key name (case-insensitive: w/a/s/d/up/down/left/right/space/
        lshift) → True if handled (reference camera.rs:104-137)."""
        axis = self._KEYS.get(key.lower())
        if axis is None:
            return False
        self.amount[axis] = 1.0 if pressed else 0.0
        return True

    def process_mouse(self, dx: float, dy: float) -> None:
        self.rotate_horizontal = float(dx)
        self.rotate_vertical = float(dy)

    def process_scroll(self, lines: float = None, pixels: float = None) -> None:
        """Line deltas scale ×100 like the reference (camera.rs:146-150)."""
        if lines is not None:
            self.scroll = -lines * 100.0
        elif pixels is not None:
            self.scroll = -pixels

    def update_camera(self, camera: "Camera", dt: float) -> None:
        """Advance the camera by dt seconds (reference camera.rs:152-182)."""
        a = self.amount
        yaw_sin, yaw_cos = np.sin(camera.yaw), np.cos(camera.yaw)
        forward = np.array([yaw_cos, 0.0, yaw_sin], np.float32)
        right = np.array([-yaw_sin, 0.0, yaw_cos], np.float32)
        pos = np.asarray(camera.position, np.float32)
        pos = pos + forward * (a["forward"] - a["backward"]) * self.speed * dt
        pos = pos + right * (a["right"] - a["left"]) * self.speed * dt

        pitch_sin, pitch_cos = np.sin(camera.pitch), np.cos(camera.pitch)
        scrollward = np.array(
            [pitch_cos * yaw_cos, pitch_sin, pitch_cos * yaw_sin], np.float32)
        nrm = np.linalg.norm(scrollward)
        if nrm > 0:
            scrollward = scrollward / nrm
        pos = pos + scrollward * self.scroll * self.speed * self.sensitivity * dt
        self.scroll = 0.0

        pos[1] += (a["up"] - a["down"]) * self.speed * dt
        camera.position = pos

        camera.yaw += self.rotate_horizontal * self.sensitivity * dt
        camera.pitch += self.rotate_vertical * self.sensitivity * dt
        self.rotate_horizontal = 0.0
        self.rotate_vertical = 0.0
        camera.pitch = float(np.clip(camera.pitch, -_SAFE_HALF_PI,
                                     _SAFE_HALF_PI))
