"""Quick parity check: pallas_banded vs jacobi on a small stack (CPU)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from physics_tpu.engine import step, prepare_contacts
from physics_tpu.scenes import box_stack
from physics_tpu.config import SimConfig

cfgj = SimConfig(
    ground_plane=True, pair_collisions=True, broadphase="sweep",
    sweep_window=8, contact_iters=8, position_iters=8, boxes_only=True,
    max_contacts=128,
)
cfgp = cfgj.replace(contact_solver="pallas_banded", pallas_tile=256,
                    pallas_window=128)

state0 = box_stack(6)

# --- cold solve parity over a few steps ---
sj = state0
sp = state0
for i in range(5):
    sj = step(sj, cfgj)
    sp = step(sp, cfgp)
    dv = np.abs(np.asarray(sj.vel) - np.asarray(sp.vel)).max()
    dx = np.abs(np.asarray(sj.pos) - np.asarray(sp.pos)).max()
    print(f"cold step {i}: dvel={dv:.2e} dpos={dx:.2e}", flush=True)

# --- warm solve parity ---
sj = prepare_contacts(state0, cfgj)
sp = prepare_contacts(state0, cfgp)
print("warm capacities:", sj.contact_key.shape, sp.contact_key.shape)
for i in range(5):
    sj = step(sj, cfgj)
    sp = step(sp, cfgp)
    dv = np.abs(np.asarray(sj.vel) - np.asarray(sp.vel)).max()
    dx = np.abs(np.asarray(sj.pos) - np.asarray(sp.pos)).max()
    print(f"warm step {i}: dvel={dv:.2e} dpos={dx:.2e}", flush=True)
