from physics_tpu.ops import forces, integrator

__all__ = ["forces", "integrator"]
