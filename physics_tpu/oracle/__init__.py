from physics_tpu.oracle import reference

__all__ = ["reference"]
