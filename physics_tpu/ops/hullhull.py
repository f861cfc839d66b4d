"""Convex-hull vs convex-hull narrow phase: face-SAT + reference-face clipping.

Generalizes the box-box manifold (ops/boxbox.py) to arbitrary convex
polyhedra from the HullSet (OBJ pipeline): candidate separating axes are the
face normals of both hulls (separation evaluated with masked support
points), the winning face becomes the reference face, and the most
anti-parallel face of the other hull is clipped against the reference
face's side planes — Sutherland–Hodgman with depth carried as an
interpolated coordinate, all one-hot einsums (see boxbox.py TPU note).

Deliberate approximation (documented): edge-edge separating axes are NOT
enumerated (that's O(E_a·E_b) per pair); deep edge-edge hull penetration
resolves on a face axis with slightly-off normal. Face-dominant contact —
resting, stacking, raining meshes — is exact. For separated pairs, use
`gjk_distance` (solver-grade distance/witness queries).

Returned normal points from hull B toward hull A (Contacts convention).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from physics_tpu.ops.boxbox import _clip_polygon

Array = jnp.ndarray


class HullData(NamedTuple):
    """One hull's geometry, body frame, padded (see state.HullSet)."""

    verts: Array        # [V, 3]
    vert_mask: Array    # [V] f32
    face_n: Array       # [F, 3]
    face_off: Array     # [F]
    face_mask: Array    # [F] f32
    face_verts: Array   # [F, E] int32
    face_vert_count: Array  # [F]


def hull_hull_manifold(
    pos_a: Array, rot_a: Array, ha: HullData,
    pos_b: Array, rot_b: Array, hb: HullData,
) -> Tuple[Array, Array, Array, Array]:
    """Contact manifold for one hull pair.

    Returns (points [CAP,3] world, normals [CAP,3] B→A, depth [CAP],
    valid [CAP]) with CAP = 2·E (clip capacity).
    """
    e_cap = ha.face_verts.shape[1]
    cap = 2 * e_cap

    # world geometry
    va = pos_a + ha.verts @ rot_a.T                       # [Va,3]
    vb = pos_b + hb.verts @ rot_b.T
    na_w = ha.face_n @ rot_a.T                            # [Fa,3]
    nb_w = hb.face_n @ rot_b.T
    # sanitize padded faces (off = +inf) to 0 — one-hot contractions would
    # otherwise produce 0·inf = NaN; validity is carried by face_mask
    offa_w = jnp.where(
        ha.face_mask > 0, ha.face_off + na_w @ pos_a, 0.0
    )
    offb_w = jnp.where(
        hb.face_mask > 0, hb.face_off + nb_w @ pos_b, 0.0
    )

    # --- face-SAT: separation of each face plane vs the other hull's
    # support point (masked min over vertices) ---
    big = jnp.float32(1e30)
    dots_ab = na_w @ vb.T                                 # [Fa,Vb]
    sep_a = jnp.min(
        jnp.where(hb.vert_mask[None, :] > 0, dots_ab, big), axis=1
    ) - offa_w
    sep_a = jnp.where(ha.face_mask > 0, sep_a, -big)
    dots_ba = nb_w @ va.T
    sep_b = jnp.min(
        jnp.where(ha.vert_mask[None, :] > 0, dots_ba, big), axis=1
    ) - offb_w
    sep_b = jnp.where(hb.face_mask > 0, sep_b, -big)

    sep_all = jnp.concatenate([sep_a, sep_b])             # [Fa+Fb]
    best = jnp.argmax(sep_all)
    separated = jnp.max(sep_all) > 0.0
    fa = sep_a.shape[0]
    ref_is_a = best < fa

    # --- reference face selection (one-hot) ---
    oh_a = jax.nn.one_hot(jnp.where(ref_is_a, best, 0), fa, dtype=jnp.float32)
    oh_b = jax.nn.one_hot(
        jnp.where(ref_is_a, 0, best - fa), sep_b.shape[0], dtype=jnp.float32
    )

    n_ref = jnp.where(ref_is_a, oh_a @ na_w, oh_b @ nb_w)      # ref → inc
    off_ref = jnp.where(ref_is_a, oh_a @ offa_w, oh_b @ offb_w)
    ref_poly_idx_f = jnp.where(
        ref_is_a,
        oh_a @ ha.face_verts.astype(jnp.float32),
        oh_b @ hb.face_verts.astype(jnp.float32),
    )                                                          # [E] float
    ref_poly_cnt = jnp.where(
        ref_is_a,
        jnp.round(oh_a @ ha.face_vert_count.astype(jnp.float32)),
        jnp.round(oh_b @ hb.face_vert_count.astype(jnp.float32)),
    ).astype(jnp.int32)
    # gather ref face polygon vertices (one-hot over the OWNER's verts)
    va_cap = va.shape[0]
    vb_cap = vb.shape[0]
    oh_ref_poly_a = jax.nn.one_hot(
        ref_poly_idx_f.astype(jnp.int32), va_cap, dtype=jnp.float32
    )
    oh_ref_poly_b = jax.nn.one_hot(
        ref_poly_idx_f.astype(jnp.int32), vb_cap, dtype=jnp.float32
    )
    ref_poly = jnp.where(ref_is_a, oh_ref_poly_a @ va, oh_ref_poly_b @ vb)

    # --- incident face: most anti-parallel valid face of the OTHER hull ---
    align_b = jnp.where(hb.face_mask > 0, nb_w @ n_ref, big)
    align_a = jnp.where(ha.face_mask > 0, na_w @ n_ref, big)
    inc_idx = jnp.where(
        ref_is_a, jnp.argmin(align_b), jnp.argmin(align_a)
    )
    oh_inc_b = jax.nn.one_hot(inc_idx, sep_b.shape[0], dtype=jnp.float32)
    oh_inc_a = jax.nn.one_hot(inc_idx, fa, dtype=jnp.float32)
    inc_poly_idx = jnp.where(
        ref_is_a,
        oh_inc_b @ hb.face_verts.astype(jnp.float32),
        oh_inc_a @ ha.face_verts.astype(jnp.float32),
    ).astype(jnp.int32)
    inc_poly_cnt = jnp.where(
        ref_is_a,
        jnp.round(oh_inc_b @ hb.face_vert_count.astype(jnp.float32)),
        jnp.round(oh_inc_a @ ha.face_vert_count.astype(jnp.float32)),
    ).astype(jnp.int32)
    oh_inc_poly_b = jax.nn.one_hot(inc_poly_idx, vb_cap, dtype=jnp.float32)
    oh_inc_poly_a = jax.nn.one_hot(inc_poly_idx, va_cap, dtype=jnp.float32)
    inc_poly = jnp.where(ref_is_a, oh_inc_poly_b @ vb, oh_inc_poly_a @ va)

    # --- 2D frame on the reference face ---
    edge0 = ref_poly[1] - ref_poly[0]
    t1 = edge0 / jnp.maximum(jnp.linalg.norm(edge0), 1e-9)
    t2 = jnp.cross(n_ref, t1)
    p0 = ref_poly[0]

    def to2d(x):
        rel = x - p0
        return jnp.stack(
            [rel @ t1, rel @ t2, x @ n_ref - off_ref], axis=-1
        )  # (u, v, separation below ref face)

    ref2d = to2d(ref_poly)                                # [E,3]
    poly = jnp.zeros((cap, 3), jnp.float32).at[:e_cap].set(to2d(inc_poly))
    m = inc_poly_cnt

    # --- clip against each reference edge's side plane ---
    # CCW polygon (seen from outside, i.e. around +n_ref): interior is to
    # the LEFT of each edge, so keep cross2d(e, x - a) ≥ 0  ⟺
    # e_v·x_u − e_u·x_v ≤ e_v·a_u − e_u·a_v.
    idx_e = jnp.arange(e_cap)
    nxt_oh = jax.nn.one_hot(
        (idx_e + 1) % jnp.maximum(ref_poly_cnt, 1), e_cap, dtype=jnp.float32
    )
    ref2d_next = nxt_oh @ ref2d
    for k in range(e_cap):
        a_uv = ref2d[k, :2]
        e_uv = ref2d_next[k, :2] - a_uv
        plane = jnp.stack(
            [e_uv[1], -e_uv[0], e_uv[1] * a_uv[0] - e_uv[0] * a_uv[1]]
        )
        noop = jnp.array([0.0, 0.0, big], jnp.float32)
        plane = jnp.where(k < ref_poly_cnt, plane, noop)
        poly, m = _clip_polygon(poly, m, plane)

    slot = jnp.arange(cap)
    depth = -poly[:, 2]
    valid = (slot < m) & (depth > 0.0) & jnp.logical_not(separated)
    points = (
        p0[None, :]
        + poly[:, 0:1] * t1[None, :]
        + poly[:, 1:2] * t2[None, :]
        + poly[:, 2:3] * n_ref[None, :]
    )
    # contact normal B → A: n_ref points ref → incident
    n_out = jnp.where(ref_is_a, -n_ref, n_ref)
    normals = jnp.broadcast_to(n_out, (cap, 3))
    return points, normals, depth, valid


# ---------------------------------------------------------------------------
# GJK distance query (fixed-iteration, jit/vmap-safe)
# ---------------------------------------------------------------------------

def _support(verts: Array, mask: Array, d: Array) -> Array:
    """Masked support point of a vertex cloud along direction d."""
    dots = jnp.where(mask > 0, verts @ d, -jnp.float32(1e30))
    oh = jax.nn.one_hot(jnp.argmax(dots), verts.shape[0], dtype=jnp.float32)
    return oh @ verts


def gjk_distance(
    verts_a: Array, mask_a: Array, verts_b: Array, mask_b: Array,
    max_iters: int = 24,
) -> Tuple[Array, Array, Array]:
    """GJK distance between two convex vertex clouds (world frame).

    Fixed-iteration subgradient variant suited to lax loops: tracks the
    closest point v on the Minkowski difference A ⊖ B via Frank-Wolfe style
    updates v ← v + t·(s − v) with exact line search (t clamped to [0,1]),
    which converges to the true distance for disjoint hulls. Returns
    (distance, witness direction (unit, B→A), separated flag). For
    overlapping hulls distance ≈ 0 and `separated` is False — use the
    SAT manifold for penetration depth.
    """

    def mdiff_support(d):
        return _support(verts_a, mask_a, d) - _support(verts_b, mask_b, -d)

    v0 = mdiff_support(jnp.array([1.0, 0.0, 0.0], jnp.float32))

    def body(_, v):
        s = mdiff_support(-v)
        dv = s - v
        denom = dv @ dv
        t = jnp.where(denom > 1e-12, -(v @ dv) / denom, 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        return v + t * dv

    v = jax.lax.fori_loop(0, max_iters, body, v0)
    dist = jnp.linalg.norm(v)
    direction = v / jnp.maximum(dist, 1e-9)
    # separated iff the support along -v cannot pass the origin
    s_final = mdiff_support(-v)
    separated = (s_final @ v) > 1e-6
    return jnp.where(separated, dist, 0.0), direction, separated
