"""State export — the headless replacement for the reference's render path.

The reference builds per-instance 4×4 model matrices T(p)·R(q) on the CPU
and uploads them to the GPU every frame (reference: src/physics.rs:58-85,
src/rendering/graphics.rs:14-21). Here the transforms are computed on device
and transferred to host only when sampling — never inside the step loop
(SURVEY.md §3.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from physics_tpu.maths import quaternion as quat
from physics_tpu.state import SimState


@jax.jit
def instance_matrices(state: SimState) -> jnp.ndarray:
    """Per-body 4×4 world transforms [N, 4, 4] = T(pos)·R(quat).

    Device-side equivalent of Instance::to_raw (reference: graphics.rs:14-21).
    """
    n = state.num_bodies
    rot = quat.to_matrix(state.quat)                       # [N,3,3]
    m = jnp.zeros((n, 4, 4), jnp.float32)
    m = m.at[:, :3, :3].set(rot)
    m = m.at[:, :3, 3].set(state.pos)
    m = m.at[:, 3, 3].set(1.0)
    return m


def get_render_data(state: SimState) -> np.ndarray:
    """Host copy of the instance transforms (one device→host transfer)."""
    return np.asarray(instance_matrices(state))


def save_trajectory(path: str, pos: jnp.ndarray, quat_arr: jnp.ndarray) -> None:
    """Persist a sampled trajectory ([T,N,3] positions, [T,N,4] quats)."""
    np.savez(path, pos=np.asarray(pos), quat=np.asarray(quat_arr))


def export_obj_frame(path: str, state: SimState, mesh_positions, mesh_faces) -> None:
    """Write one world-space OBJ frame for all bodies sharing one mesh."""
    mats = get_render_data(state)
    verts_h = np.concatenate(
        [np.asarray(mesh_positions), np.ones((len(mesh_positions), 1))], axis=1
    )
    with open(path, "w") as fh:
        offset = 0
        for i in range(mats.shape[0]):
            world = verts_h @ mats[i].T
            for v in world:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for f in np.asarray(mesh_faces):
                fh.write(
                    f"f {f[0]+1+offset} {f[1]+1+offset} {f[2]+1+offset}\n"
                )
            offset += len(mesh_positions)
