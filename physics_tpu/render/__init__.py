from physics_tpu.render import camera, rasterizer

__all__ = ["camera", "rasterizer"]
