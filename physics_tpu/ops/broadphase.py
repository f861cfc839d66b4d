"""Broad phase: AABB computation and candidate-pair generation.

New capability — the reference has no collision detection at all
(SURVEY.md §0). Two TPU-native strategies, both with fixed-capacity outputs:

  * 'allpairs' — a static upper-triangular pair list masked by AABB overlap.
    Exact; O(N²) pairs. Right choice for N ≲ 512.
  * 'sweep'    — sort bodies by AABB min-x (XLA sort), each body is paired
    with its next `sweep_window` neighbors in sorted order, masked by
    (a) x-interval overlap and (b) full AABB overlap. Fixed [N·K, 2] output.
    Misses a pair only if more than K bodies' x-intervals start inside a
    body's x-extent — surfaced as `pair_overflow` in metrics, never silent
    (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.maths import quaternion as quat
from physics_tpu.state import SHAPE_BOX, SHAPE_HULL, SHAPE_NONE, SHAPE_SPHERE, SimState

Array = jnp.ndarray


class PairCandidates(NamedTuple):
    body_a: Array   # [P] int32
    body_b: Array   # [P] int32
    mask: Array     # [P] bool
    overflow: Array # [] int32 — pairs potentially missed (sweep window)


def body_aabbs(state: SimState) -> Array:
    """World AABBs [N, 2, 3] (min, max) per body.

    Boxes use the |R|·h extent identity; spheres and hulls use their bounding
    radius (hull bounding radius is precomputed into shape params[0] at
    scene-build time).
    """
    stype = state.shapes.stype
    params = state.shapes.params

    rot = quat.to_matrix(state.quat)                       # [N,3,3]
    box_ext = jnp.einsum("nij,nj->ni", jnp.abs(rot), params)  # [N,3]
    radius = params[:, 0]
    sphere_ext = jnp.broadcast_to(radius[:, None], box_ext.shape)

    ext = jnp.where(
        (stype == SHAPE_BOX)[:, None],
        box_ext,
        jnp.where(
            ((stype == SHAPE_SPHERE) | (stype == SHAPE_HULL))[:, None],
            sphere_ext,
            jnp.zeros_like(box_ext),
        ),
    )
    return jnp.stack([state.pos - ext, state.pos + ext], axis=-2)


@lru_cache(maxsize=32)
def _upper_tri_pairs_np(n: int):
    """Static i<j pair list, cached as HOST numpy (a jnp array here would
    leak tracers across jit traces)."""
    iu = np.triu_indices(n, k=1)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


def _upper_tri_pairs(n: int):
    a, b = _upper_tri_pairs_np(n)
    return jnp.asarray(a), jnp.asarray(b)


def _aabb_overlap(aabbs: Array, ia: Array, ib: Array) -> Array:
    lo = jnp.maximum(aabbs[ia, 0], aabbs[ib, 0])
    hi = jnp.minimum(aabbs[ia, 1], aabbs[ib, 1])
    return jnp.all(lo <= hi, axis=-1)


def allpairs_candidates(state: SimState, aabbs: Array) -> PairCandidates:
    n = state.num_bodies
    ia, ib = _upper_tri_pairs(n)
    collidable = state.shapes.stype != SHAPE_NONE
    mask = _aabb_overlap(aabbs, ia, ib) & collidable[ia] & collidable[ib]
    return PairCandidates(ia, ib, mask, jnp.int32(0))


def sweep_candidates(
    state: SimState, aabbs: Array, window: int
) -> PairCandidates:
    """Sort-by-x sweep-and-prune with a fixed neighbor window.

    The sort runs on device (jnp.argsort → XLA sort, TPU-friendly); the
    candidate tensor is [N·window, 2] regardless of scene density.
    """
    n = state.num_bodies
    k = min(window, n - 1)
    min_x = aabbs[:, 0, 0]
    collidable = state.shapes.stype != SHAPE_NONE
    # push non-collidable bodies to the end of the sorted order
    sort_key = jnp.where(collidable, min_x, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)        # [N]

    # neighbor offsets 1..k in sorted order
    base = jnp.arange(n, dtype=jnp.int32)[:, None]         # [N,1]
    offs = jnp.arange(1, k + 1, dtype=jnp.int32)[None, :]  # [1,k]
    jpos = base + offs                                     # [N,k]
    valid = jpos < n
    jpos = jnp.minimum(jpos, n - 1)

    ia = jnp.broadcast_to(order[:, None], (n, k))          # [N,k]
    ib = order[jpos]

    # x-overlap: neighbor's min-x must start before our max-x
    max_x_a = aabbs[ia, 1, 0]
    min_x_b = aabbs[ib, 0, 0]
    x_overlap = min_x_b <= max_x_a

    ia_f = ia.reshape(-1)
    ib_f = ib.reshape(-1)
    mask = (
        valid.reshape(-1)
        & x_overlap.reshape(-1)
        & _aabb_overlap(aabbs, ia_f, ib_f)
        & collidable[ia_f]
        & collidable[ib_f]
    )

    # overflow: window neighbor k (the furthest we look) still x-overlaps →
    # there may be pairs beyond the window.
    last_overlap = x_overlap[:, -1] & valid[:, -1] & collidable[ia[:, -1]]
    overflow = jnp.sum(last_overlap.astype(jnp.int32))
    return PairCandidates(ia_f, ib_f, mask, overflow)


def compact_pairs(cand: PairCandidates, max_pairs: int) -> PairCandidates:
    """Keep at most `max_pairs` active candidates (top_k on the mask).

    The sweep emits a fixed [N·K] candidate tensor in which only the
    AABB-overlapping fraction is live; compacting before the (much more
    expensive) narrow phase shrinks the per-pair working set. Active pairs
    beyond capacity are counted into `overflow` — never silently dropped.
    """
    p = cand.body_a.shape[0]
    if max_pairs <= 0 or p <= max_pairs:
        return cand
    # full argsort + slice: lax.top_k is O(n·k) on TPU and k here is
    # thousands — a single XLA sort is orders of magnitude faster
    score = cand.mask.astype(jnp.float32)
    idx = jnp.argsort(-score)[:max_pairs]
    dropped = jnp.maximum(
        jnp.sum(cand.mask.astype(jnp.int32)) - max_pairs, 0
    )
    return PairCandidates(
        body_a=cand.body_a[idx],
        body_b=cand.body_b[idx],
        mask=cand.mask[idx],
        overflow=cand.overflow + dropped,
    )


def pair_candidates(state: SimState, cfg: SimConfig) -> PairCandidates:
    aabbs = body_aabbs(state)
    if cfg.broadphase == "sweep":
        cand = sweep_candidates(state, aabbs, cfg.sweep_window)
    else:
        cand = allpairs_candidates(state, aabbs)
    return compact_pairs(cand, cfg.max_pair_candidates)
