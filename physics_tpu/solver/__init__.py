from physics_tpu.solver import joints, cg, contacts

__all__ = ["joints", "cg", "contacts"]
