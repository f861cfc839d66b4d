"""Measure contact band structure on a settled 4k pile (sizes the fused
banded Pallas solver's static window)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from physics_tpu.engine import rollout, prepare_contacts
from physics_tpu.scenes import box_pile, pile_config
from physics_tpu.ops.broadphase import body_aabbs, pair_candidates
from physics_tpu.ops.narrowphase import (
    convex_data, ground_contacts, pair_contacts, concat_contacts)
from physics_tpu.solver.contacts import compact_contacts

N = 4096
state = box_pile(N)
cfg = pile_config(N).replace(contact_iters=8)
state = prepare_contacts(state, cfg)
print("settling 240 steps...", flush=True)
state, _ = rollout(state, cfg, 240)
_ = np.asarray(state.pos)
print("settled. computing contacts...", flush=True)


@jax.jit
def contacts_fn(s):
    cvx = convex_data(s)
    gc = ground_contacts(s, cvx, cfg)
    cand = pair_candidates(s, cfg)
    pc = pair_contacts(s, cvx, cand, cfg)
    cts = concat_contacts(gc, pc)
    cts, drop = compact_contacts(cts, cfg.max_contacts)
    aabbs = body_aabbs(s)
    order = jnp.argsort(aabbs[:, 0, 0]).astype(jnp.int32)
    return cts.body_a, cts.body_b, cts.active, order, drop


ba, bb, act, order, drop = map(np.asarray, contacts_fn(state))
rank = np.empty(N, np.int64)
rank[order] = np.arange(N)

act = act.astype(bool)
print(f"contacts: {act.sum()} active of {act.size} slots, dropped={drop}")

ra = rank[ba]
has_b = bb >= 0
rb = np.where(has_b, rank[np.clip(bb, 0, N - 1)], ra)
lo = np.minimum(ra, rb)[act]
hi = np.maximum(ra, rb)[act]
d = (hi - lo)
print("active pair rank-diff: max", d.max(), "p99", np.percentile(d, 99),
      "p50", np.percentile(d, 50))

# tile spans: sort actives by lo, tiles of TILE contacts
for TILE in (512, 1024):
    o = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[o], hi[o]
    c = lo_s.size
    ntiles = -(-c // TILE)
    pad = ntiles * TILE - c
    lo_p = np.concatenate([lo_s, np.full(pad, lo_s[-1])])
    hi_p = np.concatenate([hi_s, np.full(pad, lo_s[-1])])
    spans = []
    for t in range(ntiles):
        l = lo_p[t*TILE:(t+1)*TILE].min()
        h = hi_p[t*TILE:(t+1)*TILE].max()
        spans.append(h - l + 1)
    spans = np.array(spans)
    print(f"TILE={TILE}: ntiles={ntiles} span max={spans.max()} "
          f"p90={np.percentile(spans, 90):.0f} mean={spans.mean():.0f}")
