from physics_tpu.maths import quaternion
from physics_tpu.maths import linalg

__all__ = ["quaternion", "linalg"]
