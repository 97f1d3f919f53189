"""Whole-substep lane-major Pallas TPU kernel, one per robot topology.

Round-4 established (PERF.md) that the physics hot path's cost on TPU is
not FLOPs but XLA's *composition* of many tiny per-env tensors: the
(M + hD) Cholesky lowered to `slice_reduce` SMEM loop fusions (fixed by
ops/pallas_chol.py, 2-2.5x), and the remaining time sits in FK
materialization barriers (~2 ms/substep at B=4000 on ant) and CRBA
einsums. This module extends the batch-on-lanes treatment from the
solve to the ENTIRE substep: FK + CRBA mass/bias + actuator/passive +
factor/solve + floor-contact & joint-limit constraint solve + implicit
friction + integration run as ONE `pallas_call` per control step, with
every logical scalar a (B_blk,)-wide lane vector living in VMEM. No
(B,)-shaped intermediate ever reaches HBM; HBM traffic per control step
is exactly qpos/qvel/ctrl in and qpos/qvel/qacc/FK out.

The math mirrors the existing single-env modules term for term —
kinematics.fk, dynamics.mass_bias/actuator_force/passive_force,
collision.constraint_terms (flat-floor + limits case), pipeline.step's
semi-implicit Euler with the lagged FK frame (MuJoCo step order) — and
is validated against them in tests/test_lane_step.py (interpret mode on
CPU; on-device comparison in the bench harness). Reference counterpart:
the whole of mjx.step as consumed at reference engine.py:668-670.

Trace-time symbolic algebra: model constants enter the kernel as Python
floats, and the `add/mul/...` helpers fold constants and eliminate
exact zeros while tracing, so topology sparsity (ancestor masks, one-hot
S rows, one-hot limit Jacobians) prunes the op graph at trace time — the
kernel for a given robot contains only that robot's nonzero terms.

Eligibility (everything the GUARD robot suite uses): free/ball/hinge/
slide joints, flat floor contacts, joint limits. Geom-pair contacts and
analytic terrain fall back to the XLA path (enabled() returns False).

Substeps run as a fori_loop inside the kernel (carry stays in VMEM), so
kernel code size is one substep regardless of model.substeps (ant: 12).
"""

from __future__ import annotations

import functools
import math
import os
import types

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guardx_tpu.physics.model import Model, FREE, BALL, SLIDE, HINGE

# MuJoCo default solimp (collision.py)
_IMP_D = 0.9
_IMP_DMAX = 0.95
_JACOBI_ITERS = 8
_JACOBI_OMEGA = 0.8


# ---------------------------------------------------------------------------
# trace-time lane algebra: values are Python floats (constants) or traced
# (B_blk,) lane arrays; constants fold, exact zeros vanish
# ---------------------------------------------------------------------------

def _isc(x):
    return isinstance(x, (int, float))


def _iszero(x):
    return _isc(x) and float(x) == 0.0


def mul(a, b):
    if _iszero(a) or _iszero(b):
        return 0.0
    if _isc(a):
        if float(a) == 1.0:
            return b
        if _isc(b):
            return float(a) * float(b)
    elif _isc(b) and float(b) == 1.0:
        return a
    return a * b


def add(a, b):
    if _iszero(a):
        return b
    if _iszero(b):
        return a
    if _isc(a) and _isc(b):
        return float(a) + float(b)
    return a + b


def sub(a, b):
    if _iszero(b):
        return a
    if _isc(a) and _isc(b):
        return float(a) - float(b)
    if _iszero(a):
        return neg(b)
    return a - b


def neg(a):
    if _isc(a):
        return -float(a)
    return -a


def fma(acc, a, b):
    return add(acc, mul(a, b))


def dot(xs, ys):
    s = 0.0
    for x, y in zip(xs, ys):
        s = fma(s, x, y)
    return s


def lane_sqrt(x):
    return math.sqrt(x) if _isc(x) else jnp.sqrt(x)


def lane_rsqrt(x):
    return 1.0 / math.sqrt(x) if _isc(x) else jax.lax.rsqrt(x)


def lane_sin(x):
    return math.sin(x) if _isc(x) else jnp.sin(x)


def lane_cos(x):
    return math.cos(x) if _isc(x) else jnp.cos(x)


# vectors: length-3 lists; quaternions: length-4 lists (WXYZ)

def vadd(a, b):
    return [add(x, y) for x, y in zip(a, b)]


def vsub(a, b):
    return [sub(x, y) for x, y in zip(a, b)]


def vscale(v, s):
    return [mul(x, s) for x in v]


def cross(a, b):
    return [
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    ]


def qmul(q, p):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = p
    return [
        sub(sub(sub(mul(w1, w2), mul(x1, x2)), mul(y1, y2)), mul(z1, z2)),
        sub(add(add(mul(w1, x2), mul(x1, w2)), mul(y1, z2)), mul(z1, y2)),
        add(sub(add(mul(w1, y2), mul(y1, w2)), mul(x1, z2)), mul(z1, x2)),
        add(add(sub(mul(w1, z2), mul(y1, x2)), mul(x1, y2)), mul(z1, w2)),
    ]


def qrot(q, v):
    """Rotate vec3 v by quat q: v + 2 q_w (u x v) + 2 u x (u x v)."""
    u = q[1:]
    t = vscale(cross(u, v), 2.0)
    return vadd(vadd(v, vscale(t, q[0])), cross(u, t))


def qmat(q):
    """3x3 rotation matrix (rows) from WXYZ quat."""
    w, x, y, z = q
    xx, yy, zz = mul(x, x), mul(y, y), mul(z, z)
    xy, xz, yz = mul(x, y), mul(x, z), mul(y, z)
    wx, wy, wz = mul(w, x), mul(w, y), mul(w, z)
    return [
        [sub(1.0, mul(2.0, add(yy, zz))), mul(2.0, sub(xy, wz)),
         mul(2.0, add(xz, wy))],
        [mul(2.0, add(xy, wz)), sub(1.0, mul(2.0, add(xx, zz))),
         mul(2.0, sub(yz, wx))],
        [mul(2.0, sub(xz, wy)), mul(2.0, add(yz, wx)),
         sub(1.0, mul(2.0, add(xx, yy)))],
    ]


def qnormalize(q):
    inv = lane_rsqrt(dot(q, q))
    return [mul(x, inv) for x in q]


def matvec(R, v):
    return [dot(R[0], v), dot(R[1], v), dot(R[2], v)]


def cross_motion(a, b):
    """Spatial motion cross product for 6-lists (dynamics._cross_motion)."""
    w1, v1 = a[:3], a[3:]
    w2, v2 = b[:3], b[3:]
    return cross(w1, w2) + vadd(cross(w1, v2), cross(v1, w2))


def cross_force(m, f):
    """Spatial force cross product (dynamics._cross_force)."""
    w, v = m[:3], m[3:]
    n, fl = f[:3], f[3:]
    return vadd(cross(w, n), cross(v, fl)) + cross(w, fl)


# ---------------------------------------------------------------------------
# model snapshot: everything the kernel needs as host-side python values
# ---------------------------------------------------------------------------

def snapshot(model: Model):
    """Pull static model arrays to host numpy (trace-time constants)."""
    g = lambda x: np.asarray(jax.device_get(x))
    sn = types.SimpleNamespace(
        nq=model.nq, nv=model.nv, nu=model.nu, nbody=model.nbody,
        njnt=model.njnt, substeps=model.substeps,
        h=float(model.timestep) / model.substeps,
        jnt_type=list(model.jnt_type_t),
        jnt_qposadr=list(model.jnt_qposadr_t),
        jnt_dofadr=list(model.jnt_dofadr_t),
        jnt_bodyid=list(model.jnt_bodyid_t),
        body_parent=list(model.body_parent_t),
        gravity=g(model.gravity).astype(float),
        body_pos=g(model.body_pos).astype(float),
        body_quat=g(model.body_quat).astype(float),
        body_mass=g(model.body_mass).astype(float),
        body_inertia=g(model.body_inertia).astype(float),
        body_ipos=g(model.body_ipos).astype(float),
        body_iquat=g(model.body_iquat).astype(float),
        jnt_axis=g(model.jnt_axis).astype(float),
        jnt_pos=g(model.jnt_pos).astype(float),
        jnt_stiffness=g(model.jnt_stiffness).astype(float),
        jnt_springref=g(model.jnt_springref).astype(float),
        dof_damping=g(model.dof_damping).astype(float),
        dof_armature=g(model.dof_armature).astype(float),
        dof_jntid=g(model.dof_jntid).astype(int),
        dof_vp_mask=g(model.dof_vp_mask).astype(float),
        treeroot=g(model.body_treeroot).astype(int),
        anc=g(model.anc_mask) > 0.5,
        danc=g(model.dof_anc_mask) > 0.5,
        gear=g(model.actuator_gear).astype(float),
        act_dofadr=g(model.actuator_dofadr).astype(int),
        ctrlrange=g(model.actuator_ctrlrange).astype(float),
        forcerange=g(model.actuator_forcerange).astype(float),
        ncon=int(model.ncontact),
        nlim=int(model.nlimit),
    )
    if sn.ncon:
        sn.con_bodyid = g(model.con_bodyid).astype(int)
        sn.con_point = g(model.con_point).astype(float)
        sn.con_radius = g(model.con_radius).astype(float)
        sn.con_friction = g(model.con_friction).astype(float)
        sn.con_margin = g(model.con_margin).astype(float)
    sn.npair = int(model.npair)
    if sn.npair:
        sn.pair_body_a = g(model.pair_body_a).astype(int)
        sn.pair_body_b = g(model.pair_body_b).astype(int)
        sn.pair_pos_a = g(model.pair_pos_a).astype(float)
        sn.pair_pos_b = g(model.pair_pos_b).astype(float)
        sn.pair_radius_a = g(model.pair_radius_a).astype(float)
        sn.pair_is_box = g(model.pair_is_box).astype(float)
        sn.pair_size_b = g(model.pair_size_b).astype(float)
        sn.pair_mat_b = g(model.pair_mat_b).astype(float)
        sn.pair_friction = g(model.pair_friction).astype(float)
        sn.pair_margin = g(model.pair_margin).astype(float)
    sn.solref_tc = float(g(model.con_solref)[0])
    if sn.nlim:
        sn.lim_dofadr = g(model.lim_dofadr).astype(int)
        sn.lim_qposadr = g(model.lim_qposadr).astype(int)
        sn.lim_range = g(model.lim_range).astype(float)
    return sn


def enabled(model: Model) -> bool:
    """True when the model is expressible in this kernel (GUARD robots:
    flat floor + limits; no geom pairs, no terrain, no planar fast path)."""
    mode = os.environ.get('GUARDX_MEGAKERNEL', 'auto')
    if mode == 'off':
        return False
    if model.fastpath_planar3 or model.terrain_amp != 0.0:
        return False
    if model.nv > 40:
        return False
    # constraint-row ceiling: the Jacobi state (MinvJ: nr x nv lane
    # channels) must fit VMEM alongside the factor; franka (nr=105,
    # nv=21) fits, but cap against pathological candidate lists
    if model.ncontact + model.npair + model.nlimit > 128:
        return False
    if mode == 'on':
        return True
    # below ~8 dofs the XLA composition is already fine (swimmer measured
    # 1.09x — the kernel's sub-tile lane vectors give back what fusion
    # saves); the win regime is the articulated robots (walker 3.9x,
    # ant 6.6x, doggo 3.1x at B=4000)
    if model.nv < 8:
        return False
    return jax.devices()[0].platform in ('tpu', 'axon')


# ---------------------------------------------------------------------------
# the substep math (lists of lane scalars; mirrors the single-env modules)
# ---------------------------------------------------------------------------

def _c3(a):
    return [float(a[0]), float(a[1]), float(a[2])]


def _c4(a):
    return [float(a[0]), float(a[1]), float(a[2]), float(a[3])]


def _fk(sn, qpos):
    """kinematics.fk on lanes: (xpos, xquat, xmat, xipos, S, origin)."""
    xpos = [[0.0, 0.0, 0.0]]
    xquat = [[1.0, 0.0, 0.0, 0.0]]
    dof_info = [None] * sn.nv
    for i in range(1, sn.nbody):
        p = sn.body_parent[i]
        quat = qmul(xquat[p], _c4(sn.body_quat[i]))
        pos = vadd(xpos[p], qrot(xquat[p], _c3(sn.body_pos[i])))
        for j in range(sn.njnt):
            if sn.jnt_bodyid[j] != i:
                continue
            t = sn.jnt_type[j]
            qadr, dadr = sn.jnt_qposadr[j], sn.jnt_dofadr[j]
            if t == FREE:
                pos = [qpos[qadr], qpos[qadr + 1], qpos[qadr + 2]]
                quat = qnormalize([qpos[qadr + 3 + k] for k in range(4)])
                for k in range(3):
                    dof_info[dadr + k] = ("trans", k, None)
                R = qmat(quat)
                for k in range(3):
                    dof_info[dadr + 3 + k] = (
                        "rot", [R[0][k], R[1][k], R[2][k]], pos)
            elif t == BALL:
                q_j = qnormalize([qpos[qadr + k] for k in range(4)])
                anchor = vadd(pos, qrot(quat, _c3(sn.jnt_pos[j])))
                quat = qmul(quat, q_j)
                pos = vsub(anchor, qrot(quat, _c3(sn.jnt_pos[j])))
                R = qmat(quat)
                for k in range(3):
                    dof_info[dadr + k] = (
                        "rot", [R[0][k], R[1][k], R[2][k]], anchor)
            elif t == HINGE:
                angle = qpos[qadr]
                axis = _c3(sn.jnt_axis[j])
                axis_w = qrot(quat, axis)
                anchor = vadd(pos, qrot(quat, _c3(sn.jnt_pos[j])))
                half = mul(0.5, angle)
                s = lane_sin(half)
                q_j = [lane_cos(half), mul(axis[0], s), mul(axis[1], s),
                       mul(axis[2], s)]
                quat = qmul(quat, q_j)
                pos = vsub(anchor, qrot(quat, _c3(sn.jnt_pos[j])))
                dof_info[dadr] = ("rot", axis_w, anchor)
            else:  # SLIDE
                axis_w = qrot(quat, _c3(sn.jnt_axis[j]))
                pos = vadd(pos, vscale(axis_w, qpos[qadr]))
                dof_info[dadr] = ("slide", axis_w, None)
        xpos.append(pos)
        xquat.append(quat)
    xmat = [qmat(q) for q in xquat]
    xipos = [vadd(xpos[i], matvec(xmat[i], _c3(sn.body_ipos[i])))
             for i in range(sn.nbody)]
    origin = [xpos[sn.treeroot[i]] for i in range(sn.nbody)]

    S = []
    for d in range(sn.nv):
        kind, axis, anchor = dof_info[d]
        bodyid = sn.jnt_bodyid[sn.dof_jntid[d]]
        org = origin[bodyid]
        if kind == "trans":
            e = [0.0, 0.0, 0.0]
            e[axis] = 1.0
            S.append([0.0, 0.0, 0.0] + e)
        elif kind == "slide":
            S.append([0.0, 0.0, 0.0] + list(axis))
        else:
            p_rel = vsub(anchor, org)
            S.append(list(axis) + cross(p_rel, axis))
    return xpos, xquat, xmat, xipos, S, origin


def _spatial_inertia(sn, i, xquat, xipos, origin):
    """6x6 spatial inertia of body i about its tree root
    (dynamics.spatial_inertia)."""
    iqw = qmul(xquat[i], _c4(sn.body_iquat[i]))
    Ri = qmat(iqw)
    Ivals = [float(v) for v in sn.body_inertia[i]]
    m = float(sn.body_mass[i])
    c = vsub(xipos[i], origin[i])
    # Ic = Ri diag(I) Ri^T
    Ic = [[0.0] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(a + 1):
            s = 0.0
            for k in range(3):
                s = fma(s, mul(Ri[a][k], Ivals[k]), Ri[b][k])
            Ic[a][b] = s
            Ic[b][a] = s
    cx = [
        [0.0, neg(c[2]), c[1]],
        [c[2], 0.0, neg(c[0])],
        [neg(c[1]), c[0], 0.0],
    ]
    I6 = [[0.0] * 6 for _ in range(6)]
    for a in range(3):
        for b in range(3):
            # top-left: Ic + m * cx cx^T
            s = Ic[a][b]
            for k in range(3):
                s = fma(s, mul(m, cx[a][k]), cx[b][k])
            I6[a][b] = s
            I6[a][3 + b] = mul(m, cx[a][b])        # m * cx
            I6[3 + a][b] = mul(m, cx[b][a])        # m * cx^T
            I6[3 + a][3 + b] = m if a == b else 0.0
    return I6


def _mass_bias(sn, qvel, xquat, xipos, S, origin):
    """dynamics.mass_bias on lanes: (M upper-triangular dict, bias list)."""
    nv, nbody = sn.nv, sn.nbody
    anc_dofs = [[d for d in range(nv) if sn.anc[i, d]]
                for i in range(nbody)]
    I6 = [None] * nbody
    for i in range(1, nbody):
        I6[i] = _spatial_inertia(sn, i, xquat, xipos, origin)

    M = [[0.0] * nv for _ in range(nv)]
    v_body = [None] * nbody
    f_total = [None] * nbody
    # velocity-product terms shared across bodies
    Sq = [[mul(S[d][k], qvel[d]) for k in range(6)] for d in range(nv)]
    v_at_dof = [
        [functools.reduce(add, (Sq[d2][k] for d2 in range(nv)
                                if sn.danc[d, d2]), 0.0) for k in range(6)]
        for d in range(nv)
    ]
    W = []
    for d in range(nv):
        w6 = cross_motion(v_at_dof[d], S[d])
        scale = mul(qvel[d], float(sn.dof_vp_mask[d]))
        W.append([mul(x, scale) for x in w6])

    for i in range(1, nbody):
        dofs = anc_dofs[i]
        # IS[d] = I6_i @ S[d]
        IS = {d: [dot(I6[i][r], S[d]) for r in range(6)] for d in dofs}
        for ai, da in enumerate(dofs):
            for db in dofs[ai:]:
                M[da][db] = add(M[da][db], dot(S[da], IS[db]))
        v_body[i] = [functools.reduce(
            add, (Sq[d][k] for d in dofs), 0.0) for k in range(6)]
        a_vp = [functools.reduce(
            add, (W[d][k] for d in dofs), 0.0) for k in range(6)]
        h_b = [dot(I6[i][r], v_body[i]) for r in range(6)]
        f_b = vadd6 = [add(dot(I6[i][r], a_vp), cf)
                       for r, cf in zip(range(6),
                                        cross_force(v_body[i], h_b))]
        m = float(sn.body_mass[i])
        mg = [m * float(sn.gravity[k]) for k in range(3)]
        c_rel = vsub(xipos[i], origin[i])
        f_grav = cross(c_rel, mg) + mg
        f_total[i] = vsub(f_b, f_grav)

    bias = [0.0] * nv
    for i in range(1, nbody):
        for d in anc_dofs[i]:
            bias[d] = add(bias[d], dot(S[d], f_total[i]))

    # mirror to full symmetric, add armature (damping added by caller)
    for a in range(nv):
        M[a][a] = add(M[a][a], float(sn.dof_armature[a]))
        for b in range(a + 1, nv):
            M[b][a] = M[a][b]
    return M, bias


def _tau(sn, qpos, ctrl):
    """actuator_force + passive_force on lanes."""
    tau = [0.0] * sn.nv
    for u in range(sn.nu):
        c = ctrl[u]
        lo, hi = sn.ctrlrange[u]
        if abs(lo) < 1e8 or abs(hi) < 1e8:
            c = jnp.clip(c, lo, hi)
        flo, fhi = sn.forcerange[u]
        if abs(flo) < 1e8 or abs(fhi) < 1e8:
            c = jnp.clip(c, flo, fhi)
        d = int(sn.act_dofadr[u])
        tau[d] = fma(tau[d], float(sn.gear[u]), c)
    for j in range(sn.njnt):
        if sn.jnt_type[j] not in (SLIDE, HINGE):
            continue
        k = float(sn.jnt_stiffness[j])
        if k == 0.0:
            continue
        qadr, dadr = sn.jnt_qposadr[j], sn.jnt_dofadr[j]
        tau[dadr] = sub(tau[dadr],
                        mul(k, sub(qpos[qadr], float(sn.jnt_springref[j]))))
    return tau


def _chol(M, nv):
    """Cholesky factor with inverse diagonal (pallas_chol recurrence)."""
    L = [[None] * nv for _ in range(nv)]
    for i in range(nv):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = sub(s, mul(L[i][k], L[j][k]))
            if i == j:
                L[i][j] = lane_rsqrt(s)
            else:
                L[i][j] = mul(s, L[j][j])
    return L


def _chol_solve(L, b, nv):
    """Solve L L^T x = b (L from _chol, diag stored inverted)."""
    y = [None] * nv
    for i in range(nv):
        s = b[i]
        for k in range(i):
            s = sub(s, mul(L[i][k], y[k]))
        y[i] = mul(s, L[i][i])
    x = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            s = sub(s, mul(L[k][i], x[k]))
        x[i] = mul(s, L[i][i])
    return x


def _lmax(a, b):
    if _isc(a) and _isc(b):
        return max(a, b)
    return jnp.maximum(a, b)


def _matmat(A, B):
    """(3,3) lane/const matrix product C = A @ B."""
    return [[dot(A[i], [B[0][j], B[1][j], B[2][j]]) for j in range(3)]
            for i in range(3)]


def _matTvec(R, v):
    """R^T v for a (3,3) lane/const matrix."""
    return [dot([R[0][i], R[1][i], R[2][i]], v) for i in range(3)]


def _point_jac_rows(sn, body, p_c, S, origin, nv):
    """Per-dof world point Jacobian of a point p_c on `body` (3 comps)."""
    out = {}
    if body == 0:
        return out
    rel = vsub(p_c, origin[body])
    for d in range(nv):
        if sn.anc[body, d]:
            out[d] = vadd(S[d][3:], cross(S[d][:3], rel))
    return out


def _constraints(sn, qpos, qvel, qacc_free, xpos, xmat, S, origin, L, h):
    """collision.constraint_terms on lanes (flat floor + geom pairs +
    joint limits; the box/sphere branch per pair resolves at trace time
    since pair_is_box is static model data).

    Returns (qfrc list, Hc nv x nv list-of-lists)."""
    nv = sn.nv
    nl = sn.nlim
    nc = sn.ncon + sn.npair
    nr = nc + nl

    rows_J = []      # per row: dense length-nv list (zeros pruned by algebra)
    rows_depth = []
    Jt = []          # per contact: [tangent-x row, tangent-y row]
    fric = []        # per contact: sliding friction coefficient (const)

    for c in range(sn.ncon):
        b = int(sn.con_bodyid[c])
        pw = vadd(xpos[b], matvec(xmat[b], _c3(sn.con_point[c])))
        depth = sub(float(sn.con_radius[c] + sn.con_margin[c]), pw[2])
        rel = vsub(pw, origin[b])
        row_n = [0.0] * nv
        row_tx = [0.0] * nv
        row_ty = [0.0] * nv
        for d in range(nv):
            if not sn.anc[b, d]:
                continue
            lin = vadd(S[d][3:], cross(S[d][:3], rel))
            row_tx[d], row_ty[d], row_n[d] = lin[0], lin[1], lin[2]
        rows_J.append(row_n)
        rows_depth.append(depth)
        Jt.append([row_tx, row_ty])
        fric.append(float(sn.con_friction[c]))

    for c in range(sn.npair):
        ba, bb = int(sn.pair_body_a[c]), int(sn.pair_body_b[c])
        pa_w = vadd(xpos[ba], matvec(xmat[ba], _c3(sn.pair_pos_a[c])))
        pb_w = vadd(xpos[bb], matvec(xmat[bb], _c3(sn.pair_pos_b[c])))
        ra = float(sn.pair_radius_a[c])
        marg = float(sn.pair_margin[c])
        if sn.pair_is_box[c] > 0.5:
            # sphere-box: closest point on the box to the sphere center
            # (collision.py:167-193)
            Mb = sn.pair_mat_b[c]
            Rb = _matmat(xmat[bb], [[float(Mb[i, j]) for j in range(3)]
                                    for i in range(3)])
            local = _matTvec(Rb, vsub(pa_w, pb_w))
            sb = [float(x) for x in sn.pair_size_b[c]]
            clamped = [jnp.clip(local[k], -sb[k], sb[k]) for k in range(3)]
            outside = vsub(local, clamped)
            d2_out = dot(outside, outside)
            dist_out = lane_sqrt(add(d2_out, 1e-18))
            gaps = [sub(sb[k], jnp.abs(local[k])) for k in range(3)]
            min_g = jnp.minimum(jnp.minimum(gaps[0], gaps[1]), gaps[2])
            # first-minimum one-hot over the 3 face gaps (argmin semantics)
            is0 = jnp.where((gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2]),
                            1.0, 0.0)
            is1 = jnp.where((gaps[1] <= gaps[2]), 1.0, 0.0) * (1.0 - is0)
            is2 = (1.0 - is0) * (1.0 - is1)
            n_in = [mul(m, jnp.sign(local[k]))
                    for k, m in enumerate((is0, is1, is2))]
            # inside test on the SQUARED distance: dist_out above carries a
            # +1e-18 sqrt guard, so it can never drop below 1e-9 and the
            # exact-inside case (outside == 0) would take the wrong branch
            # (zero normal => no de-penetration force — found on franka
            # gripper-inside-cube states, 17/512 env divergence)
            inside = jnp.where(d2_out < 1e-18, 1.0, 0.0)
            dist_sb = add(mul(inside, neg(min_g)),
                          mul(sub(1.0, inside), dist_out))
            inv_out = 1.0 / _lmax(dist_out, 1e-9)
            n_local = [add(mul(inside, n_in[k]),
                           mul(sub(1.0, inside), mul(outside[k], inv_out)))
                       for k in range(3)]
            n_p = matvec(Rb, n_local)
            depth = sub(ra + marg, dist_sb)
            p_c = vadd(pb_w, matvec(Rb, clamped))
        else:
            # sphere-sphere (collision.py:158-164)
            delta = vsub(pa_w, pb_w)
            dist = lane_sqrt(add(dot(delta, delta), 1e-18))
            inv = 1.0 / _lmax(dist, 1e-9)
            n_p = [mul(x, inv) for x in delta]
            rb = float(sn.pair_size_b[c, 0])
            depth = sub(ra + rb + marg, dist)
            p_c = vadd(pb_w, vscale(n_p, rb))

        # contact frame (t1, t2, n) with the data-dependent up vector
        # (collision.py:200-209)
        flat = jnp.where(jnp.abs(n_p[2]) < 0.9, 1.0, 0.0)
        up = [sub(1.0, flat), 0.0, flat]
        t1 = cross(up, n_p)
        inv_t1 = 1.0 / _lmax(lane_sqrt(add(dot(t1, t1), 1e-18)), 1e-9)
        t1 = [mul(x, inv_t1) for x in t1]
        t2 = cross(n_p, t1)

        # relative point Jacobian (body a minus body b), frame-projected
        ja = _point_jac_rows(sn, ba, p_c, S, origin, nv)
        jb = _point_jac_rows(sn, bb, p_c, S, origin, nv)
        row_n = [0.0] * nv
        row_tx = [0.0] * nv
        row_ty = [0.0] * nv
        for d in set(ja) | set(jb):
            rel3 = vsub(ja.get(d, [0.0] * 3), jb.get(d, [0.0] * 3))
            row_tx[d] = dot(rel3, t1)
            row_ty[d] = dot(rel3, t2)
            row_n[d] = dot(rel3, n_p)
        rows_J.append(row_n)
        rows_depth.append(depth)
        Jt.append([row_tx, row_ty])
        fric.append(float(sn.pair_friction[c]))

    lim_sign = []
    for l in range(nl):
        d = int(sn.lim_dofadr[l])
        q_l = qpos[int(sn.lim_qposadr[l])]
        lo, hi = float(sn.lim_range[l, 0]), float(sn.lim_range[l, 1])
        over = sub(q_l, hi)
        under = sub(lo, q_l)
        sign = jnp.where(under > over, 1.0, -1.0)
        depth = _lmax(over, under)
        row = [0.0] * nv
        row[d] = sign
        rows_J.append(row)
        rows_depth.append(depth)
        lim_sign.append((d, sign))

    active = [jnp.where(rows_depth[r] > 0.0, 1.0, 0.0) for r in range(nr)]

    # Delassus columns: Minv J^T for every row; the contact-tangent columns
    # are reduced to their diagonals wt IMMEDIATELY (solve -> dot -> dead)
    # so 2*nc*nv lane values never coexist (VMEM liveness: amp_humanoid
    # has 34 contacts x 2 tangents x 34 dofs)
    MinvJ = [_chol_solve(L, rows_J[r], nv) for r in range(nr)]
    wt = [[dot(Jt[c][k], _chol_solve(L, Jt[c][k], nv)) for k in range(2)]
          for c in range(nc)]

    # Delassus matrix A = J M^-1 J^T is never materialized (nr^2 lane
    # channels OOM'd VMEM at nr=62 on amp_humanoid): the Jacobi iteration
    # computes A@lam as J @ (sum_r lam_r * MinvJ_r), which is also sparser
    # (J rows are anc-masked / one-hot).
    w = [dot(rows_J[r], MinvJ[r]) for r in range(nr)]

    imp = (1.0 - _IMP_D) / _IMP_D
    R = []
    for r in range(nr):
        if r < nc:
            R.append(mul(imp / 3.0, add(add(w[r], wt[r][0]), wt[r][1])))
        else:
            R.append(mul(imp, w[r]))
    R = [_lmax(x, 1e-6) for x in R]

    tc = sn.solref_tc
    k_imp = _IMP_D / (_IMP_DMAX * _IMP_DMAX * tc * tc)
    b_imp = 2.0 / (_IMP_DMAX * tc)

    rhs = []
    for r in range(nr):
        ddot = neg(dot(rows_J[r], qvel))
        a_free = dot(rows_J[r], qacc_free)
        rhs.append(mul(add(add(mul(k_imp, rows_depth[r]),
                               mul(b_imp, ddot)), neg(a_free)), active[r]))
    diag = [add(w[r], R[r]) for r in range(nr)]
    inv_diag = [1.0 / d for d in diag]

    lam = [mul(_lmax(mul(rhs[r], inv_diag[r]), 0.0), active[r])
           for r in range(nr)]
    for _ in range(_JACOBI_ITERS):
        t = [0.0] * nv
        for r in range(nr):
            for d in range(nv):
                t[d] = fma(t[d], MinvJ[r][d], lam[r])
        Alam = [dot(rows_J[r], t) for r in range(nr)]
        resid = [sub(sub(rhs[r], Alam[r]), mul(R[r], lam[r]))
                 for r in range(nr)]
        lam = [mul(_lmax(add(lam[r],
                             mul(_JACOBI_OMEGA, mul(resid[r], inv_diag[r]))),
                         0.0), active[r]) for r in range(nr)]

    qfrc = [0.0] * nv
    for r in range(nr):
        for d in range(nv):
            qfrc[d] = fma(qfrc[d], rows_J[r][d], lam[r])

    Hc = [[0.0] * nv for _ in range(nv)]
    if nc:
        for c in range(nc):
            fn = lam[c]
            vt = [dot(Jt[c][k], qvel) for k in range(2)]
            vt_speed = lane_sqrt(add(add(mul(vt[0], vt[0]),
                                         mul(vt[1], vt[1])), 1e-12))
            cone = mul(fric[c], fn)
            cone_slope = cone / (vt_speed + 1e-3)
            for k in range(2):
                slope = jnp.minimum(
                    b_imp / (wt[c][k] + R[c]), cone_slope)
                slope = mul(slope, active[c])
                nzd = [d for d in range(nv) if not _iszero(Jt[c][k][d])]
                for a in nzd:
                    ja_s = mul(Jt[c][k][a], slope)
                    for b2 in nzd:
                        if b2 < a:
                            continue
                        v = mul(ja_s, Jt[c][k][b2])
                        Hc[a][b2] = add(Hc[a][b2], v)
        for a in range(nv):
            for b2 in range(a + 1, nv):
                Hc[b2][a] = Hc[a][b2]
    return qfrc, Hc


def _integrate(sn, qpos, qvel, h):
    """integrate_qpos on lanes (quaternion exp for free/ball)."""
    out = list(qpos)
    for j in range(sn.njnt):
        t = sn.jnt_type[j]
        qadr, dadr = sn.jnt_qposadr[j], sn.jnt_dofadr[j]
        if t == FREE:
            for k in range(3):
                out[qadr + k] = fma(out[qadr + k], h, qvel[dadr + k])
            q = [out[qadr + 3 + k] for k in range(4)]
            wl = [qvel[dadr + 3 + k] for k in range(3)]
            out[qadr + 3:qadr + 7] = _quat_exp_step(q, wl, h)
        elif t == BALL:
            q = [out[qadr + k] for k in range(4)]
            wl = [qvel[dadr + k] for k in range(3)]
            out[qadr:qadr + 4] = _quat_exp_step(q, wl, h)
        else:
            out[qadr] = fma(out[qadr], h, qvel[dadr])
    return out


def _quat_exp_step(q, w_local, h):
    n2 = dot(w_local, w_local)
    angle = lane_sqrt(add(n2, 1e-18))
    inv = lane_rsqrt(add(n2, 1e-18))
    half = mul(0.5, mul(angle, h))
    s = lane_sin(half)
    dq = [lane_cos(half)] + [mul(mul(x, inv), s) for x in w_local]
    return qnormalize(qmul(q, dq))


def _substep(sn, qpos, qvel, ctrl_tau, h):
    """One full substep: returns (qpos', qvel', qacc, fk_frame).

    ctrl_tau: actuator torque list (constant across substeps except the
    spring term, which depends on qpos — recomputed here)."""
    xpos, xquat, xmat, xipos, S, origin = _fk(sn, qpos)
    M, bias = _mass_bias(sn, qvel, xquat, xipos, S, origin)
    for d in range(sn.nv):
        M[d][d] = add(M[d][d], h * float(sn.dof_damping[d]))
    L = _chol(M, sn.nv)
    tau = _tau(sn, qpos, ctrl_tau)
    rhs = [sub(sub(tau[d], bias[d]),
               mul(float(sn.dof_damping[d]), qvel[d]))
           for d in range(sn.nv)]
    qacc_free = _chol_solve(L, rhs, sn.nv)
    if sn.ncon or sn.nlim or sn.npair:
        qfrc, Hc = _constraints(
            sn, qpos, qvel, qacc_free, xpos, xmat, S, origin, L, h)
        M2 = [[add(M[a][b], mul(h, Hc[a][b])) for b in range(sn.nv)]
              for a in range(sn.nv)]
        L2 = _chol(M2, sn.nv)
        rhs2 = [add(add(rhs[d], qfrc[d]),
                    neg(dot(Hc[d], qvel))) for d in range(sn.nv)]
        qacc = _chol_solve(L2, rhs2, sn.nv)
    else:
        qacc = qacc_free
    qvel_new = [fma(qvel[d], h, qacc[d]) for d in range(sn.nv)]
    qpos_new = _integrate(sn, qpos, qvel_new, h)
    fk_frame = (xpos, xquat, xmat, xipos)
    return qpos_new, qvel_new, qacc, fk_frame


# ---------------------------------------------------------------------------
# kernel assembly
# ---------------------------------------------------------------------------

def _as_lane(v, blk, dtype=jnp.float32):
    if _isc(v):
        return jnp.full((blk,), float(v), dtype)
    return v


def _pack(vals, blk):
    return jnp.stack([_as_lane(v, blk) for v in vals])


def _fk_flat(fk_frame):
    xpos, xquat, xmat, xipos = fk_frame
    out = []
    for p in xpos:
        out += p
    for q in xquat:
        out += q
    for Rm in xmat:
        for row in Rm:
            out += row
    for p in xipos:
        out += p
    return out


def _pick_blk(sn) -> int:
    """Lane block sized to keep the peak live set in VMEM. The dominant
    simultaneous residents are the Jacobi solve columns (nr * nv), the
    factor and solve intermediates (~nv^2 * 4), the FK/inertia set
    (~nbody * 60) and the per-pair contact geometry."""
    nc = sn.ncon + sn.npair
    nr = nc + sn.nlim
    channels = (
        sn.nq + 2 * sn.nv + sn.nbody * 60 + 4 * sn.nv * sn.nv
        + (nr + 2 * nc) * (sn.nv + 2) + sn.npair * 24 + 6 * sn.nv + 64
    )
    env = os.environ.get('GUARDX_MEGAKERNEL_BLK')
    if env:
        return int(env)
    # measured: Mosaic's true scoped-vmem footprint runs ~3x this channel
    # estimate (loop carries, spills, alignment), so budget conservatively
    # (walker@512 uses ~10M true; doggo@256 OOMed at 18.6M/16M)
    for blk in (512, 256, 128):
        if channels * blk * 4 < 3600 * 1024:
            return blk
    return 128


@functools.lru_cache(maxsize=32)
def _build_kernel(model_key, interpret=False):
    """Build the pallas_call wrapper for one model snapshot (cached)."""
    sn = _SNAPSHOTS[model_key]
    nq, nv, nu, nbody = sn.nq, sn.nv, sn.nu, sn.nbody
    nfk = nbody * 19
    blk = _pick_blk(sn)
    h = sn.h

    def kernel(qpos_ref, qvel_ref, ctrl_ref,
               qpos_o, qvel_o, qacc_o, fk_o):
        qpos0 = [qpos_ref[i, :] for i in range(nq)]
        qvel0 = [qvel_ref[i, :] for i in range(nv)]
        ctrl = [ctrl_ref[i, :] for i in range(nu)]

        if sn.substeps == 1:
            qpos, qvel, qacc, fk_frame = _substep(sn, qpos0, qvel0, ctrl, h)
            fkv = _fk_flat(fk_frame)
        else:
            def body(_, carry):
                qpos_a, qvel_a, _qacc_a, _fk_a = carry
                qp = [qpos_a[i, :] for i in range(nq)]
                qv = [qvel_a[i, :] for i in range(nv)]
                qp2, qv2, qacc, fk_frame = _substep(sn, qp, qv, ctrl, h)
                return (_pack(qp2, blk), _pack(qv2, blk),
                        _pack(qacc, blk), _pack(_fk_flat(fk_frame), blk))

            init = (_pack(qpos0, blk), _pack(qvel0, blk),
                    jnp.zeros((nv, blk), jnp.float32),
                    jnp.zeros((nfk, blk), jnp.float32))
            qpos_a, qvel_a, qacc_a, fk_a = jax.lax.fori_loop(
                0, sn.substeps, body, init)
            qpos = [qpos_a[i, :] for i in range(nq)]
            qvel = [qvel_a[i, :] for i in range(nv)]
            qacc = [qacc_a[i, :] for i in range(nv)]
            fkv = [fk_a[i, :] for i in range(nfk)]

        for i in range(nq):
            qpos_o[i, :] = _as_lane(qpos[i], blk)
        for i in range(nv):
            qvel_o[i, :] = _as_lane(qvel[i], blk)
            qacc_o[i, :] = _as_lane(qacc[i], blk)
        for i in range(nfk):
            fk_o[i, :] = _as_lane(fkv[i], blk)

    def step_batch(qpos, qvel, ctrl):
        """(B, nq)/(B, nv)/(B, nu) -> (qpos', qvel', qacc, xpos, xquat,
        xmat, xipos) batched."""
        B = qpos.shape[0]
        pad = (-B) % blk
        if pad:
            z = lambda x, n: jnp.concatenate(
                [x, jnp.zeros((pad, n), x.dtype)], axis=0)
            qpos_p = z(qpos, nq)
            # padded lanes run the same math; keep quats valid (w=1) so
            # normalization never divides by zero
            qinit = jnp.zeros((pad, nq), qpos.dtype)
            for j in range(sn.njnt):
                if sn.jnt_type[j] == FREE:
                    qinit = qinit.at[:, sn.jnt_qposadr[j] + 3].set(1.0)
                elif sn.jnt_type[j] == BALL:
                    qinit = qinit.at[:, sn.jnt_qposadr[j]].set(1.0)
            qpos_p = jnp.concatenate([qpos, qinit], axis=0)
            qvel_p = z(qvel, nv)
            ctrl_p = z(ctrl, nu)
        else:
            qpos_p, qvel_p, ctrl_p = qpos, qvel, ctrl
        Bp = B + pad

        out_shapes = (
            jax.ShapeDtypeStruct((nq, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nv, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nv, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nfk, Bp), jnp.float32),
        )
        spec = lambda n: pl.BlockSpec((n, blk), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
        qpos_t, qvel_t, qacc_t, fk_t = pl.pallas_call(
            kernel,
            grid=(Bp // blk,),
            in_specs=[spec(nq), spec(nv), spec(nu)],
            out_specs=(spec(nq), spec(nv), spec(nv), spec(nfk)),
            out_shape=out_shapes,
            # large-nv models (amp_humanoid: nv=34, 62 constraint rows)
            # need more scoped VMEM than the 16M default; v5e has headroom
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qpos_p.T, qvel_p.T, ctrl_p.T)

        qpos2 = qpos_t.T[:B]
        qvel2 = qvel_t.T[:B]
        qacc2 = qacc_t.T[:B]
        fk = fk_t.T[:B]
        o = 0
        xpos = fk[:, o:o + nbody * 3].reshape(B, nbody, 3)
        o += nbody * 3
        xquat = fk[:, o:o + nbody * 4].reshape(B, nbody, 4)
        o += nbody * 4
        xmat = fk[:, o:o + nbody * 9].reshape(B, nbody, 3, 3)
        o += nbody * 9
        xipos = fk[:, o:o + nbody * 3].reshape(B, nbody, 3)
        return qpos2, qvel2, qacc2, xpos, xquat, xmat, xipos

    return step_batch


# snapshot registry: Model pytrees are unhashable; key by object id of the
# underlying host arrays (stable per Engine instance)
_SNAPSHOTS = {}


def get_step_batch(model: Model, interpret: bool = False):
    key = id(model)
    if key not in _SNAPSHOTS:
        _SNAPSHOTS[key] = snapshot(model)
    return _build_kernel(key, interpret)


# ---------------------------------------------------------------------------
# single-env surface: custom_vmap routes the engine's vmap into the kernel
# ---------------------------------------------------------------------------

_ENV_FNS = {}


def step_env_arrays(model: Model, step_general_env):
    """Cached custom_vmap fn over (qpos, qvel, ctrl) for one model.

    step_general_env(qpos, qvel, ctrl) -> same output tuple, single env —
    the unbatched fallback (the existing XLA scan path)."""
    key = id(model)
    if key in _ENV_FNS:
        return _ENV_FNS[key]

    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(qpos, qvel, ctrl):
        return step_general_env(qpos, qvel, ctrl)

    @f.def_vmap
    def _f_vmap(axis_size, in_batched, qpos, qvel, ctrl):
        bc = lambda x, b: x if b else jnp.broadcast_to(
            x, (axis_size,) + x.shape)
        qpos = bc(qpos, in_batched[0])
        qvel = bc(qvel, in_batched[1])
        ctrl = bc(ctrl, in_batched[2])
        out = get_step_batch(model)(qpos, qvel, ctrl)
        return out, tuple(True for _ in out)

    _ENV_FNS[key] = f
    return f
