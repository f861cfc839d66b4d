from physics_tpu.utils import profiling

__all__ = ["profiling"]
