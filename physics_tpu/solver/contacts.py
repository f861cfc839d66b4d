"""Velocity-level contact resolution: projected Jacobi impulse solver.

New capability (the reference has no contacts, SURVEY.md §0), architected
for the TPU: Gauss-Seidel/PGS is inherently sequential, so instead every
iteration computes impulse corrections for ALL contacts from the current
velocities (one batched kernel) and scatter-adds them simultaneously
(segment-sum). Convergence is kept by mass-splitting: each contact's
correction is scaled by 1/deg, where deg is the number of active contacts
touching its bodies — the classic averaged-projection trick that makes
Jacobi contact iteration contractive.

Per contact, normal impulse λₙ ≥ 0 with a Baumgarte bias velocity
(β·max(depth − slop, 0)/dt) plus restitution, and a friction box-clamp
|λₜ| ≤ μ·λₙ along two tangent directions. All state lives in the fori_loop
carry; the whole solve fuses into the step program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.maths import quaternion as quat
from physics_tpu.ops.broadphase import pair_candidates
from physics_tpu.ops.narrowphase import (
    Contacts,
    concat_contacts,
    convex_data,
    ground_contacts,
    pair_contacts,
)
from physics_tpu.state import SimState

Array = jnp.ndarray


def _tangent_basis(n: Array) -> Tuple[Array, Array]:
    """Orthonormal (t1, t2) ⊥ n, branchless (works for any unit n)."""
    # pick the reference axis least aligned with n
    ax = jnp.abs(n)
    use_x = (ax[..., 0] <= ax[..., 1]) & (ax[..., 0] <= ax[..., 2])
    use_y = (~use_x) & (ax[..., 1] <= ax[..., 2])
    e = jnp.where(
        use_x[..., None],
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
        jnp.where(
            use_y[..., None],
            jnp.array([0.0, 1.0, 0.0], jnp.float32),
            jnp.array([0.0, 0.0, 1.0], jnp.float32),
        ),
    )
    t1 = jnp.cross(n, e)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve_impulses(
    state: SimState,
    contacts: Contacts,
    cfg: SimConfig,
    axis_name: str | None = None,
    warm: Tuple[Array, Array] | None = None,
):
    """Iteratively resolve contacts.

    Returns (vel, omega, pseudo_vel, pseudo_omega, lam3, metrics): the
    pseudo velocities are the split-impulse position correction (integrate
    them into pos/quat over one dt, outside the momentum state); lam3 [C,3]
    holds the converged real impulses (λn, λt1, λt2) per slot.

    `warm=(prev_keys_sorted, prev_lam3)` warm-starts the solve: each
    contact's feature key is matched against the previous step's sorted key
    table (searchsorted) and the matched impulses are applied up front, so
    the Jacobi sweeps only correct the *change* since last step — the
    standard impulse-caching trick, which roughly halves the sweeps needed
    for resting stacks.

    With `axis_name` (inside shard_map) the contact buffer is sharded across
    that mesh axis while body velocities stay replicated: every impulse
    scatter becomes a local delta followed by a psum, which keeps the Jacobi
    iteration mathematically identical to the single-device solve.
    """
    n = state.num_bodies
    c = contacts.body_a.shape[0]
    dt = jnp.float32(cfg.dt)

    a = contacts.body_a
    b_raw = contacts.body_b
    has_b = b_raw >= 0
    b = jnp.clip(b_raw, 0, n - 1)
    act = contacts.active
    actf = act.astype(jnp.float32)

    inv_m_a = state.inv_mass[a] * actf
    inv_m_b = jnp.where(has_b, state.inv_mass[b], 0.0) * actf

    rot = quat.to_matrix(state.quat)
    inv_i_w = jnp.einsum("nij,njk,nlk->nil", rot, state.inv_inertia, rot)
    inv_i_a = inv_i_w[a] * actf[:, None, None]
    inv_i_b = inv_i_w[b] * (has_b & act).astype(jnp.float32)[:, None, None]

    r_a = contacts.point - state.pos[a]
    r_b = contacts.point - state.pos[b]
    nrm = contacts.normal
    t1, t2 = _tangent_basis(nrm)

    def eff_mass(d: Array) -> Array:
        # k = Σ 1/m + d·((I⁻¹(r×d))×r) for each body
        ra_x = jnp.cross(r_a, d)
        rb_x = jnp.cross(r_b, d)
        term_a = jnp.einsum(
            "ci,ci->c", d, jnp.cross(jnp.einsum("cij,cj->ci", inv_i_a, ra_x), r_a)
        )
        term_b = jnp.einsum(
            "ci,ci->c", d, jnp.cross(jnp.einsum("cij,cj->ci", inv_i_b, rb_x), r_b)
        )
        return inv_m_a + inv_m_b + term_a + term_b

    k_n = jnp.maximum(eff_mass(nrm), 1e-9)
    k_t1 = jnp.maximum(eff_mass(t1), 1e-9)
    k_t2 = jnp.maximum(eff_mass(t2), 1e-9)

    # contact degree per body → Jacobi relaxation 1/deg
    ones = actf
    deg = jnp.zeros((n,), jnp.float32).at[a].add(ones)
    deg = deg.at[b].add(jnp.where(has_b, ones, 0.0))
    if axis_name:
        deg = jax.lax.psum(deg, axis_name)
    deg_c = jnp.maximum(jnp.maximum(deg[a], jnp.where(has_b, deg[b], 0.0)), 1.0)
    relax = jnp.float32(cfg.contact_relaxation) / deg_c

    def rel_vel(vel: Array, omega: Array) -> Array:
        va = vel[a] + jnp.cross(omega[a], r_a)
        vb = jnp.where(
            has_b[:, None], vel[b] + jnp.cross(omega[b], r_b), 0.0
        )
        return va - vb

    # restitution uses the pre-solve approach velocity. SPLIT IMPULSE:
    # the velocity solve targets restitution only — penetration is fixed by
    # a separate pseudo-velocity position pass below, so the cached real
    # impulses contain no Baumgarte energy (safe to warm start).
    v_n0 = jnp.einsum("ci,ci->c", nrm, rel_vel(state.vel, state.omega))
    bias = (
        jnp.float32(cfg.baumgarte)
        / dt
        * jnp.maximum(contacts.depth - jnp.float32(cfg.penetration_slop), 0.0)
    )
    bounce = contacts.restitution * jnp.maximum(-v_n0, 0.0)
    # warm-started solves use split impulse (bias handled positionally);
    # cold solves keep classic Baumgarte bias in the velocity target, which
    # reaches force balance in far fewer sweeps when starting from λ = 0
    use_split = warm is not None
    v_target = bounce if use_split else jnp.maximum(bias, bounce)

    # ---- impulse-application machinery ----
    # The endpoint body indices are FIXED across the Jacobi sweeps, so the
    # sort permutation for a sorted segment-sum is computed once and reused
    # every iteration (sorted segment-sum ≈ 2× a duplicate-index scatter-add
    # on TPU, and we fold the two endpoints and linear+angular parts into
    # ONE [2C, 6] segment-sum per sweep).
    b_seg = jnp.where(has_b & act, b, n)  # dead endpoints → segment n
    a_seg = jnp.where(act, a, n)
    seg_ids = jnp.concatenate([a_seg, b_seg])
    seg_perm = jnp.argsort(seg_ids)
    seg_sorted = seg_ids[seg_perm]

    def apply(vel, omega, imp):
        """Apply impulse ±imp [C,3] to the bodies (psum'd when sharded)."""
        dv_a = imp * inv_m_a[:, None]
        dw_a = jnp.einsum("cij,cj->ci", inv_i_a, jnp.cross(r_a, imp))
        dv_b = -imp * inv_m_b[:, None]
        dw_b = -jnp.einsum("cij,cj->ci", inv_i_b, jnp.cross(r_b, imp))
        contrib = jnp.concatenate(
            [
                jnp.concatenate([dv_a, dw_a], axis=-1),
                jnp.concatenate([dv_b, dw_b], axis=-1),
            ],
            axis=0,
        )  # [2C, 6]
        summed = jax.ops.segment_sum(
            contrib[seg_perm], seg_sorted, num_segments=n + 1,
            indices_are_sorted=True,
        )[:n]
        dvel, domega = summed[:, :3], summed[:, 3:]
        if axis_name:
            dvel, domega = jax.lax.psum((dvel, domega), axis_name)
        return vel + dvel, omega + domega

    def iteration(_, carry):
        vel, omega, lam_n, lam_t1, lam_t2 = carry

        # one velocity snapshot per sweep: normal and friction corrections
        # are computed together and applied in a single segment-sum (pure
        # Jacobi; the friction clamp uses this sweep's updated λₙ)
        v = rel_vel(vel, omega)
        v_n = jnp.einsum("ci,ci->c", nrm, v)
        d_lam = (v_target - v_n) / k_n * relax * actf
        lam_n_new = jnp.maximum(lam_n + d_lam, 0.0)

        lim = contacts.friction * lam_n_new
        v_t1 = jnp.einsum("ci,ci->c", t1, v)
        lam_t1_new = jnp.clip(lam_t1 - v_t1 / k_t1 * relax * actf, -lim, lim)
        v_t2 = jnp.einsum("ci,ci->c", t2, v)
        lam_t2_new = jnp.clip(lam_t2 - v_t2 / k_t2 * relax * actf, -lim, lim)

        imp = (
            (lam_n_new - lam_n)[:, None] * nrm
            + (lam_t1_new - lam_t1)[:, None] * t1
            + (lam_t2_new - lam_t2)[:, None] * t2
        )
        vel, omega = apply(vel, omega, imp)
        return vel, omega, lam_n_new, lam_t1_new, lam_t2_new

    zeros_c = jnp.zeros((c,), jnp.float32)
    lam0_n, lam0_t1, lam0_t2 = zeros_c, zeros_c, zeros_c
    vel0, omega0 = state.vel, state.omega
    if warm is not None:
        prev_keys, prev_lam = warm
        kp = prev_keys.shape[0]
        pos = jnp.clip(
            jnp.searchsorted(prev_keys, contacts.key), 0, kp - 1
        )
        found = (
            (jnp.take(prev_keys, pos) == contacts.key)
            & act
            & (contacts.key != 0)
        )
        matched = jnp.where(found[:, None], jnp.take(prev_lam, pos, axis=0),
                            0.0)
        lam0_n, lam0_t1, lam0_t2 = matched[:, 0], matched[:, 1], matched[:, 2]
        imp0 = (
            lam0_n[:, None] * nrm
            + lam0_t1[:, None] * t1
            + lam0_t2[:, None] * t2
        )
        vel0, omega0 = apply(vel0, omega0, imp0)

    vel, omega, lam_n, lam_t1, lam_t2 = jax.lax.fori_loop(
        0,
        cfg.contact_iters,
        iteration,
        (vel0, omega0, lam0_n, lam0_t1, lam0_t2),
    )
    lam3 = jnp.stack([lam_n, lam_t1, lam_t2], axis=-1)

    # ---- split-impulse position correction ----
    # Pseudo-velocities (never part of the real momentum state) are solved
    # against the Baumgarte bias target and integrated into dpos/drot by the
    # caller. Same operators, normal direction only.
    def p_iteration(_, carry):
        pvel, pomega, lam_b = carry
        pv = rel_vel(pvel, pomega)
        pv_n = jnp.einsum("ci,ci->c", nrm, pv)
        d_lam = (bias - pv_n) / k_n * relax * actf
        lam_b_new = jnp.maximum(lam_b + d_lam, 0.0)
        pvel, pomega = apply(pvel, pomega, (lam_b_new - lam_b)[:, None] * nrm)
        return pvel, pomega, lam_b_new

    zero_nv = jnp.zeros_like(state.vel)
    if use_split and cfg.position_iters > 0:
        pvel, pomega, _ = jax.lax.fori_loop(
            0, cfg.position_iters, p_iteration, (zero_nv, zero_nv, zeros_c)
        )
    else:
        pvel, pomega = zero_nv, zero_nv

    count = jnp.sum(act.astype(jnp.int32))
    max_pen = jnp.max(jnp.where(act, contacts.depth, 0.0), initial=0.0)
    imp_sum = jnp.sum(lam_n)
    if axis_name:
        count = jax.lax.psum(count, axis_name)
        max_pen = jax.lax.pmax(max_pen, axis_name)
        imp_sum = jax.lax.psum(imp_sum, axis_name)
    metrics = {
        "contact_count": count,
        "max_penetration": max_pen,
        "normal_impulse_sum": imp_sum,
    }
    return vel, omega, pvel, pomega, lam3, metrics


def compact_contacts(
    contacts: Contacts, max_contacts: int
) -> Tuple[Contacts, Array]:
    """Keep the `max_contacts` deepest active contacts (top_k gather).

    Most contact slots are inactive padding (masked broad-phase candidates);
    compacting before the iterative solve shrinks the hot loop's working set
    from O(pair_capacity) to O(max_contacts). Returns (contacts, overflow):
    overflow counts *active* contacts dropped — surfaced, never silent.
    """
    c = contacts.body_a.shape[0]
    if max_contacts <= 0 or c <= max_contacts:
        return contacts, jnp.int32(0)
    # argsort+slice instead of lax.top_k: k is thousands here and TPU
    # top_k degrades to O(n·k); one XLA sort is far cheaper
    score = jnp.where(contacts.active, contacts.depth, -jnp.inf)
    idx = jnp.argsort(-score)[:max_contacts]
    overflow = jnp.maximum(
        jnp.sum(contacts.active.astype(jnp.int32)) - max_contacts, 0
    )
    taken = Contacts(*[getattr(contacts, f)[idx] for f in Contacts._fields])
    return taken, overflow


def contact_capacity(state: SimState, cfg: SimConfig) -> int:
    """Total contact-slot count of one step under `cfg` (static), via
    eval_shape on the generation pipeline — used to size the warm-start
    buffers (engine.prepare_contacts)."""

    def gen(s):
        cvx = convex_data(s)
        groups = []
        if cfg.ground_plane:
            groups.append(ground_contacts(s, cvx, cfg))
        if cfg.pair_collisions and s.num_bodies > 1:
            groups.append(pair_contacts(s, cvx, pair_candidates(s, cfg), cfg))
        if not groups:
            return jnp.zeros((0,), jnp.int32)
        contacts = concat_contacts(*groups)
        contacts, _ = compact_contacts(contacts, cfg.max_contacts)
        return contacts.key

    return int(jax.eval_shape(gen, state).shape[0])


def _pad_leading(arr: Array, multiple: int) -> Array:
    """Zero-pad the leading axis up to a multiple (False/0 ⇒ inactive)."""
    rem = arr.shape[0] % multiple
    if rem == 0:
        return arr
    pad = [(0, multiple - rem)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def _chunk(arr: Array, axis_name: str, n_shards: int) -> Array:
    """This device's contiguous slice of a leading-axis-sharded array
    (padded with inactive slots if not evenly divisible)."""
    arr = _pad_leading(arr, n_shards)
    size = arr.shape[0] // n_shards
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(arr, idx * size, size, 0)


def resolve_contacts(
    state: SimState,
    cfg: SimConfig,
    shard: Tuple[str, int] | None = None,
) -> Tuple[SimState, Dict]:
    """Broad phase → narrow phase → impulse solve. Pure function of state.

    `shard=(axis_name, n_shards)` (inside shard_map, body state replicated)
    splits the broad-phase candidate list and the narrow-phase work across
    the mesh axis; the Jacobi solve psums impulse deltas each sweep so the
    result matches the single-device solve.
    """
    cvx = convex_data(state)
    groups = []
    metrics: Dict = {}
    axis_name = shard[0] if shard else None

    if cfg.ground_plane:
        gc = ground_contacts(state, cvx, cfg)
        if shard:
            gc = Contacts(*[
                _chunk(getattr(gc, f), *shard) for f in Contacts._fields
            ])
        groups.append(gc)
    if cfg.pair_collisions and state.num_bodies > 1:
        cand = pair_candidates(state, cfg)
        if shard:
            from physics_tpu.ops.broadphase import PairCandidates

            cand = PairCandidates(
                _chunk(cand.body_a, *shard),
                _chunk(cand.body_b, *shard),
                _chunk(cand.mask, *shard),
                cand.overflow,
            )
        groups.append(pair_contacts(state, cvx, cand, cfg))
        metrics["pair_overflow"] = cand.overflow

    if not groups:
        return state, metrics

    contacts = concat_contacts(*groups)
    max_c = cfg.max_contacts // (shard[1] if shard else 1)
    contacts, dropped = compact_contacts(contacts, max_c)
    if cfg.max_contacts > 0:
        if axis_name:
            dropped = jax.lax.psum(dropped, axis_name)
        metrics["contact_overflow"] = dropped

    # warm start: enabled when the state's warm buffers were allocated at
    # this config's contact capacity (engine.prepare_contacts); sharded
    # solves skip it (per-shard key tables are not maintained)
    c_total = contacts.key.shape[0]
    use_warm = (
        shard is None and state.contact_key.shape[0] == c_total and c_total > 0
    )
    warm = (state.contact_key, state.contact_lam) if use_warm else None

    vel, omega, pvel, pomega, lam3, solve_metrics = solve_impulses(
        state, contacts, cfg, axis_name=axis_name, warm=warm
    )
    # split-impulse position correction: pseudo velocities integrate into
    # the pose immediately and never enter the momentum state
    dt = jnp.float32(cfg.dt)
    new_pos = state.pos + pvel * dt
    dq = quat.exp_map(pomega * dt)
    new_quat = quat.normalize(quat.mul(dq, state.quat))
    state = state.replace(vel=vel, omega=omega, pos=new_pos, quat=new_quat)
    if use_warm:
        order = jnp.argsort(contacts.key)
        state = state.replace(
            contact_key=contacts.key[order],
            contact_lam=lam3[order],
        )
    return state, {**metrics, **solve_metrics}
