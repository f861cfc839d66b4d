from physics_tpu.parallel import sharding

__all__ = ["sharding"]
