from physics_tpu.maths import quaternion
from physics_tpu.maths import linalg
from physics_tpu.maths import blocksparse

__all__ = ["quaternion", "linalg", "blocksparse"]
