"""Direct parity: banded Pallas narrow phase vs XLA fast path (TPU)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from physics_tpu.engine import rollout, prepare_contacts
from physics_tpu.scenes import box_pile, pile_config
from physics_tpu.ops.broadphase import pair_candidates
from physics_tpu.ops.narrowphase import (
    _pair_contacts_boxes, _pair_contacts_boxes_pallas)

N = 1024
cfgj = pile_config(N).replace(contact_iters=8, contact_solver="jacobi",
                              contact_rebuild=1)
cfgp = cfgj.replace(contact_solver="pallas_banded")

state = prepare_contacts(box_pile(N), cfgj)
state, _ = rollout(state, cfgj, 120)   # settle with the known-good path
_ = np.asarray(state.pos)
print("settled", flush=True)


@jax.jit
def both(s):
    cand = pair_candidates(s, cfgj)
    a = _pair_contacts_boxes(s, cand, cfgj)
    b = _pair_contacts_boxes_pallas(s, cand, cfgp)
    return a, b


a, b = both(state)
aa = {f: np.asarray(getattr(a, f)) for f in a._fields}
bb = {f: np.asarray(getattr(b, f)) for f in b._fields}
print("actives xla:", aa["active"].sum(), " pallas:", bb["active"].sum(),
      flush=True)
same_act = (aa["active"] == bb["active"])
print("active agreement:", same_act.mean(), flush=True)
m = aa["active"] & bb["active"]
for f in ("depth", "friction", "restitution"):
    d = np.abs(aa[f][m] - bb[f][m]).max() if m.any() else 0
    print(f"{f} max diff on co-active: {d:.3e}", flush=True)
for f in ("point", "normal"):
    d = np.abs(aa[f][:, m] - bb[f][:, m]).max() if m.any() else 0
    print(f"{f} max diff on co-active: {d:.3e}", flush=True)
kd = (aa["key"][m] != bb["key"][m]).mean() if m.any() else 0
print("key mismatch frac:", kd, flush=True)
# where do they disagree on active?
only_p = bb["active"] & ~aa["active"]
only_x = aa["active"] & ~bb["active"]
print("only-pallas actives:", only_p.sum(), " only-xla:", only_x.sum(),
      flush=True)
if only_p.sum():
    i = np.where(only_p)[0][:5]
    print("sample only-pallas: depth_p", bb["depth"][i],
          "bodies", bb["body_a"][i], bb["body_b"][i], flush=True)
if only_x.sum():
    i = np.where(only_x)[0][:5]
    print("sample only-xla: depth_x", aa["depth"][i],
          "bodies", aa["body_a"][i], aa["body_b"][i], flush=True)
