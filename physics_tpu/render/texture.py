"""Texture loading and procedural generation for the viewer.

Equivalent of the reference's texture upload path (reference:
src/rendering/texture.rs:58-128 decodes PNG/JPEG bytes to RGBA8 and
uploads with a linear-mag/nearest-min sampler; src/resources.rs:23-30 loads
the bytes from the res/ dir). Here textures are plain RGBA8 numpy arrays
sampled by the native rasterizer (bilinear, perspective-correct) — no GPU,
no samplers. PIL decodes files when available; procedural fallbacks keep
the viewer asset-free.
"""

from __future__ import annotations

import numpy as np


def load_texture(path: str) -> np.ndarray:
    """Decode an image file to RGBA8 [H, W, 4] (PIL-backed)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)


def checkerboard(
    size: int = 256,
    tiles: int = 8,
    color_a=(200, 170, 120),
    color_b=(90, 70, 50),
) -> np.ndarray:
    """Procedural RGBA8 checkerboard (stands in for the reference's
    cube-diffuse.jpg when running asset-free)."""
    ij = np.indices((size, size)) // max(size // tiles, 1)
    mask = (ij[0] + ij[1]) % 2 == 0
    tex = np.empty((size, size, 4), np.uint8)
    tex[..., :3] = np.where(mask[..., None], color_a, color_b)
    tex[..., 3] = 255
    return tex


def uv_grid(size: int = 256, lines: int = 8) -> np.ndarray:
    """UV-debug texture: color = (u, v, 0.25) with dark grid lines."""
    v, u = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    tex = np.empty((size, size, 4), np.uint8)
    tex[..., 0] = (u * 255).astype(np.uint8)
    tex[..., 1] = ((1.0 - v) * 255).astype(np.uint8)
    tex[..., 2] = 64
    tex[..., 3] = 255
    step = size // lines
    tex[::step, :, :3] = 20
    tex[:, ::step, :3] = 20
    return tex


def solid(rgb=(204, 204, 209), size: int = 4) -> np.ndarray:
    tex = np.empty((size, size, 4), np.uint8)
    tex[..., :3] = np.asarray(rgb, np.uint8)
    tex[..., 3] = 255
    return tex
