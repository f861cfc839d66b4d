"""ctypes wrapper for the native C++ rasterizer (native/rasterizer.cpp).

Replaces the reference's wgpu render pass (reference: src/rendering.rs
render(), :317-410) with an offline software rasterizer: same data flow
(per-instance model matrices × camera view-proj × one mesh), entirely on
the host, never inside the jitted sim loop. The .so is built on demand
with g++ (pybind11 is unavailable here; plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librasterizer.so"))
_lib = None


def ensure_built() -> str:
    """Build librasterizer.so with g++ if missing; returns its path."""
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "rasterizer.cpp"))
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True,
        )
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.rasterize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,   # verts
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,   # tris
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,   # models
            ctypes.POINTER(ctypes.c_float),                   # view_proj
            ctypes.POINTER(ctypes.c_float),                   # colors|null
            ctypes.c_int32, ctypes.c_int32,                   # w, h
            ctypes.POINTER(ctypes.c_uint8),                   # out
            ctypes.POINTER(ctypes.c_float),                   # background
        ]
        lib.rasterize.restype = None
        lib.rasterize_textured.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,   # verts
            ctypes.POINTER(ctypes.c_float),                   # uvs|null
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,   # tris
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,   # models
            ctypes.POINTER(ctypes.c_float),                   # view_proj
            ctypes.POINTER(ctypes.c_float),                   # colors|null
            ctypes.POINTER(ctypes.c_uint8),                   # tex|null
            ctypes.c_int32, ctypes.c_int32,                   # tex w, h
            ctypes.c_float,                                   # light_strength
            ctypes.c_int32, ctypes.c_int32,                   # w, h
            ctypes.POINTER(ctypes.c_uint8),                   # out
            ctypes.POINTER(ctypes.c_float),                   # background
        ]
        lib.rasterize_textured.restype = None
        _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize(
    verts: np.ndarray,
    tris: np.ndarray,
    model_mats: np.ndarray,
    view_proj: np.ndarray,
    width: int = 800,
    height: int = 600,
    colors: Optional[np.ndarray] = None,
    background=(0.0, 0.0, 0.0),
    uvs: Optional[np.ndarray] = None,
    texture: Optional[np.ndarray] = None,
    light_strength: float = 1.0,
) -> np.ndarray:
    """Render instances of one mesh; returns an RGB image [h, w, 3] uint8.

    With `uvs` [V,2] and `texture` (RGBA8 [H,W,4]) the fill samples the
    diffuse texture perspective-correctly — the reference's fragment path
    (src/shader.wgsl:48-51); `light_strength=0` gives its exact unlit look.
    Background default black = the reference's clear color
    (rendering.rs:344-352 clears to BLACK)."""
    lib = _get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    models = np.ascontiguousarray(model_mats, np.float32).reshape(-1, 16)
    vp = np.ascontiguousarray(view_proj, np.float32).reshape(16)
    bg = np.ascontiguousarray(background, np.float32)
    out = np.empty((height, width, 3), np.uint8)

    col_ptr = None
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.float32)
        col_ptr = _fptr(colors)

    uv_ptr, tex_ptr, tw, th = None, None, 0, 0
    if uvs is not None and texture is not None:
        uvs = np.ascontiguousarray(uvs, np.float32)
        if len(uvs) != len(verts):
            raise ValueError(f"uvs ({len(uvs)}) must match verts ({len(verts)})")
        texture = np.ascontiguousarray(texture, np.uint8)
        if texture.ndim != 3 or texture.shape[2] != 4:
            raise ValueError("texture must be RGBA8 [H, W, 4]")
        uv_ptr = _fptr(uvs)
        tex_ptr = texture.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        th, tw = texture.shape[:2]

    lib.rasterize_textured(
        _fptr(verts), np.int32(len(verts)),
        uv_ptr,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(len(tris)),
        _fptr(models), np.int32(len(models)),
        _fptr(vp),
        col_ptr,
        tex_ptr, np.int32(tw), np.int32(th),
        np.float32(light_strength),
        np.int32(width), np.int32(height),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _fptr(bg),
    )
    return out


def render_state(
    state,
    verts: np.ndarray,
    tris: np.ndarray,
    view_proj: Optional[np.ndarray] = None,
    width: int = 800,
    height: int = 600,
    colors: Optional[np.ndarray] = None,
    uvs: Optional[np.ndarray] = None,
    texture: Optional[np.ndarray] = None,
    light_strength: float = 1.0,
) -> np.ndarray:
    """Render a SimState with one shared mesh (device→host once)."""
    from physics_tpu.io.export import get_render_data
    from physics_tpu.render.camera import default_view_proj

    mats = get_render_data(state)
    if view_proj is None:
        view_proj = default_view_proj(width, height)
    return rasterize(verts, tris, mats, view_proj, width, height, colors,
                     uvs=uvs, texture=texture, light_strength=light_strength)


def save_ppm(path: str, image: np.ndarray) -> None:
    """Write an RGB uint8 image as binary PPM (no image deps needed)."""
    h, w, _ = image.shape
    with open(path, "wb") as fh:
        fh.write(f"P6\n{w} {h}\n255\n".encode())
        fh.write(image.tobytes())


def save_png(path: str, image: np.ndarray) -> None:
    """Write PNG via matplotlib if present, else fall back to PPM."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, image)
    except Exception:
        save_ppm(os.path.splitext(path)[0] + ".ppm", image)
