"""Split SAT manifold across two Pallas kernels (full-graph crash workaround).

Kernel A: axes + SAT + face frame + corner projection + edge point.
Kernel B: 4 Sutherland-Hodgman clips + point reconstruction + combine.
Compare against the XLA box_box_manifold_batched.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physics_tpu.maths import vec3c as v3
from physics_tpu.ops import boxbox_batched as bb
from physics_tpu.ops.boxbox_batched import (
    _CAP, _FUDGE, _PARALLEL_EPS, _argmax_unrolled, _axis_cols, _clip,
    _select,
)

TILE = 512
rng = np.random.default_rng(0)


def rand_rot(n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y),
    ], 1).astype(np.float32)


pa_n = rng.uniform(-0.6, 0.6, (TILE, 3)).astype(np.float32)
pb_n = np.zeros((TILE, 3), np.float32)
ra_n = rand_rot(TILE)
rb_n = rand_rot(TILE)
ha_n = np.full((TILE, 3), 0.5, np.float32)
hb_n = np.full((TILE, 3), 0.5, np.float32)

ta = jnp.asarray(np.concatenate([pa_n.T, ra_n.T, ha_n.T, np.zeros((1, TILE), np.float32)]))
tb = jnp.asarray(np.concatenate([pb_n.T, rb_n.T, hb_n.T, np.zeros((1, TILE), np.float32)]))

RA = 56   # kernel A output rows


def kernel_a(ta_ref, tb_ref, out_ref):
    A, B = ta_ref[:], tb_ref[:]
    pa = (A[0], A[1], A[2])
    ra9 = tuple(A[3 + k] for k in range(9))
    ha = (A[12], A[13], A[14])
    pb = (B[0], B[1], B[2])
    rb9 = tuple(B[3 + k] for k in range(9))
    hb = (B[12], B[13], B[14])

    t_w = v3.sub(pb, pa)
    u = _axis_cols(ra9)
    w = _axis_cols(rb9)
    axes = list(u) + list(w)
    cross_axes, cross_ok = [], []
    for i in range(3):
        for j in range(3):
            cx = v3.cross(u[i], w[j])
            nn = v3.norm(cx)
            cross_ok.append(nn > _PARALLEL_EPS)
            cross_axes.append(v3.scale(cx, 1.0 / jnp.maximum(nn, _PARALLEL_EPS)))
    axes = axes + cross_axes

    def proj(axis, half, cols):
        return (half[0] * jnp.abs(v3.dot(axis, cols[0]))
                + half[1] * jnp.abs(v3.dot(axis, cols[1]))
                + half[2] * jnp.abs(v3.dot(axis, cols[2])))

    dist = [v3.dot(ax, t_w) for ax in axes]
    big_neg = jnp.float32(-1e30)
    sep = []
    for k in range(15):
        s = jnp.abs(dist[k]) - (proj(axes[k], ha, u) + proj(axes[k], hb, w))
        if k >= 6:
            s = jnp.where(cross_ok[k - 6], s, big_neg)
        sep.append(s)

    separated = _argmax_unrolled(sep)[0] > 0.0
    best_face_sep, best_face = _argmax_unrolled(sep[:6])
    best_edge_sep, best_edge = _argmax_unrolled(sep[6:])
    any_edge = jnp.zeros_like(best_face_sep, dtype=bool)
    for ok in cross_ok:
        any_edge = any_edge | ok
    best_edge_sep = jnp.where(any_edge, best_edge_sep, big_neg)
    use_edge = best_edge_sep * _FUDGE > best_face_sep

    axis_f = _select(best_face, axes[:6])
    dist_f = _select(best_face, dist[:6])
    n_face = v3.scale(axis_f, jnp.sign(dist_f + 1e-30))
    axis_e = _select(best_edge, axes[6:])
    dist_e = _select(best_edge, dist[6:])
    n_edge = v3.scale(axis_e, jnp.sign(dist_e + 1e-30))

    ref_is_a = best_face < 3
    ref_axis = jnp.where(ref_is_a, best_face, best_face - 3)
    ref_cols = [v3.where(ref_is_a, u[k], w[k]) for k in range(3)]
    inc_cols = [v3.where(ref_is_a, w[k], u[k]) for k in range(3)]
    ref_half = [jnp.where(ref_is_a, ha[k], hb[k]) for k in range(3)]
    inc_half = [jnp.where(ref_is_a, hb[k], ha[k]) for k in range(3)]
    ref_pos = v3.where(ref_is_a, pa, pb)
    inc_pos = v3.where(ref_is_a, pb, pa)
    ref_n = v3.where(ref_is_a, n_face, v3.neg(n_face))

    p_idx = jnp.where(ref_axis == 0, 1, 0)
    q_idx = jnp.where(ref_axis == 2, 1, 2)
    u_p = _select(p_idx, ref_cols)
    u_q = _select(q_idx, ref_cols)
    h_p = _select(p_idx, ref_half)
    h_q = _select(q_idx, ref_half)
    h_axis = _select(ref_axis, ref_half)
    c_ref = v3.add(ref_pos, v3.scale(ref_n, h_axis))

    align = [v3.dot(inc_cols[k], ref_n) for k in range(3)]
    _, inc_axis = _argmax_unrolled([jnp.abs(x) for x in align])
    inc_align = _select(inc_axis, align)
    inc_sign = -jnp.sign(inc_align + 1e-30)
    inc_n_axis = _select(inc_axis, inc_cols)
    inc_h = _select(inc_axis, inc_half)
    c_inc = v3.add(inc_pos, v3.scale(inc_n_axis, inc_sign * inc_h))
    ip_idx = jnp.where(inc_axis == 0, 1, 0)
    iq_idx = jnp.where(inc_axis == 2, 1, 2)
    w_p = v3.scale(_select(ip_idx, inc_cols), _select(ip_idx, inc_half))
    w_q = v3.scale(_select(iq_idx, inc_cols), _select(iq_idx, inc_half))

    signs = [(1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0)]
    su, sv, ss = [], [], []
    for sp, sq in signs:
        corner = v3.add(c_inc, v3.add(v3.scale(w_p, sp), v3.scale(w_q, sq)))
        rel = v3.sub(corner, c_ref)
        su.append(v3.dot(rel, u_p))
        sv.append(v3.dot(rel, u_q))
        ss.append(v3.dot(rel, ref_n))

    # edge contact point
    ei = jnp.where(best_edge < 3, 0, jnp.where(best_edge < 6, 1, 2))
    ej = best_edge - ei * 3
    ua = _select(ei, u)
    vb = _select(ej, w)
    p_a, p_b = pa, pb
    for k in range(3):
        sa = (jnp.sign(v3.dot(u[k], n_edge) + 1e-30)
              * (ei != k).astype(jnp.float32) * ha[k])
        p_a = v3.add(p_a, v3.scale(u[k], sa))
        sb = (jnp.sign(-v3.dot(w[k], n_edge) + 1e-30)
              * (ej != k).astype(jnp.float32) * hb[k])
        p_b = v3.add(p_b, v3.scale(w[k], sb))
    d_ab = v3.sub(p_b, p_a)
    c_uv = v3.dot(ua, vb)
    denom = 1.0 - c_uv * c_uv
    s_par = jnp.where(jnp.abs(denom) > 1e-9,
                      (v3.dot(d_ab, ua) - c_uv * v3.dot(d_ab, vb)) / denom,
                      0.0)
    r_par = s_par * c_uv - v3.dot(d_ab, vb)
    q_a = v3.add(p_a, v3.scale(ua, s_par))
    q_b = v3.add(p_b, v3.scale(vb, r_par))
    edge_point = v3.scale(v3.add(q_a, q_b), 0.5)
    edge_depth = -_select(best_edge, sep[6:])

    f = lambda x: x.astype(jnp.float32)
    zero = jnp.zeros_like(h_p)
    rows = (su + sv + ss                            # 12
            + list(u_p) + list(u_q) + list(ref_n) + list(c_ref)  # 12
            + [h_p, h_q]                            # 2
            + list(edge_point) + [edge_depth] + list(n_edge)     # 7
            + list(n_face)                          # 3
            + [f(use_edge), f(separated)]           # 2
            )                                       # 38
    rows += [zero] * (RA - len(rows))
    out_ref[:] = jnp.stack(rows)


def kernel_b(sa_ref, out_ref):
    S = sa_ref[:]
    su = [S[k] for k in range(4)]
    sv = [S[4 + k] for k in range(4)]
    ss = [S[8 + k] for k in range(4)]
    u_p = (S[12], S[13], S[14])
    u_q = (S[15], S[16], S[17])
    ref_n = (S[18], S[19], S[20])
    c_ref = (S[21], S[22], S[23])
    h_p, h_q = S[24], S[25]
    edge_point = (S[26], S[27], S[28])
    edge_depth = S[29]
    n_edge = (S[30], S[31], S[32])
    n_face = (S[33], S[34], S[35])
    use_edge = S[36] > 0
    separated = S[37] > 0

    zero = jnp.zeros_like(h_p)
    pu = jnp.stack(su + [zero] * 4)
    pv = jnp.stack(sv + [zero] * 4)
    ps = jnp.stack(ss + [zero] * 4)
    m = jnp.full_like(h_p, 4).astype(jnp.int32)
    one = jnp.float32(1.0)
    NCLIP = int(os.environ.get("NCLIP", "4"))
    planes = [(one, 0.0, h_p), (-one, 0.0, h_p),
              (0.0, one, h_q), (0.0, -one, h_q)]
    for ci in range(NCLIP):
        cu, cv, dd = planes[ci]
        pu, pv, ps, m = _clip(pu, pv, ps, m, cu, cv, dd, True)

    COMBINE = int(os.environ.get("COMBINE", "2"))
    slot_rows = []
    for k in range(_CAP):
        pt = v3.add(c_ref, v3.add(
            v3.add(v3.scale(u_p, pu[k]), v3.scale(u_q, pv[k])),
            v3.scale(ref_n, ps[k])))
        d = -ps[k]
        if COMBINE >= 1:
            # Mosaic-safe: no bool-dtype jnp.where, no python-int compare
            valid = (jnp.int32(k) < m) & (d > 0.0) & ~separated
            if k == 0:
                pt = v3.where(use_edge, edge_point, pt)
                d = jnp.where(use_edge, edge_depth, d)
                valid = ((use_edge & (edge_depth > 0.0) & ~separated)
                         | (~use_edge & valid))
            else:
                d = jnp.where(use_edge, 0.0, d)
                valid = valid & ~use_edge
            d = jnp.where(valid, d, 0.0)
        slot_rows += [pt[0], pt[1], pt[2], d]
    if COMBINE >= 2:
        n_out = v3.neg(v3.where(use_edge, n_edge, n_face))
    else:
        n_out = n_face
    rows = slot_rows + [n_out[0], n_out[1], n_out[2]]
    rows += [jnp.zeros_like(h_p)] * (40 - len(rows))
    out_ref[:] = jnp.stack(rows)


ONLY = os.environ.get("ONLY", "")


@jax.jit
def run(ta, tb):
    stage = pl.pallas_call(
        kernel_a,
        out_shape=jax.ShapeDtypeStruct((RA, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ta, tb)
    if ONLY == "a":
        return jnp.pad(stage, ((0, 0), (0, 0)))[:40]
    return pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((40, TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(stage)


t0 = time.time()
try:
    out = np.asarray(run(ta, tb))
    print(f"COMPILED in {time.time()-t0:.0f}s", flush=True)
except Exception as e:
    print("FAIL:", type(e).__name__, str(e)[:300], flush=True)
    sys.exit(1)

man = bb.box_box_manifold_batched(
    tuple(jnp.asarray(pa_n.T)), tuple(jnp.asarray(ra_n.T)),
    tuple(jnp.asarray(ha_n.T)),
    tuple(jnp.asarray(pb_n.T)), tuple(jnp.asarray(rb_n.T)),
    tuple(jnp.asarray(hb_n.T)),
)
ref_d = np.stack([
    np.where(np.asarray(man.valid[s]), np.asarray(man.depth[s]), 0.0)
    for s in range(_CAP)])
got_d = np.stack([out[4 * s + 3] for s in range(_CAP)])
err_d = np.abs(ref_d - got_d).max()
ref_n = np.stack([np.asarray(man.normal[c]) for c in range(3)])
err_n = np.abs(ref_n - out[32:35]).max()
# points where valid
errs_p = []
for s in range(_CAP):
    vmask = np.asarray(man.valid[s])
    if vmask.any():
        rp = np.stack([np.asarray(man.points[s][c]) for c in range(3)])
        gp = out[4 * s:4 * s + 3]
        errs_p.append(np.abs((rp - gp))[:, vmask].max())
print(f"depth err {err_d:.2e}  normal err {err_n:.2e}  "
      f"point err {max(errs_p):.2e}", flush=True)
