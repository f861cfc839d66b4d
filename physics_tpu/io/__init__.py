from physics_tpu.io import meshes, objloader, checkpoint, export

__all__ = ["meshes", "objloader", "checkpoint", "export"]
