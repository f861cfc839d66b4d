from physics_tpu.parallel import multihost, sharding

__all__ = ["multihost", "sharding"]
