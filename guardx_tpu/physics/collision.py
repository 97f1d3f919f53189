"""Unilateral constraints: floor contacts + joint limits, one coupled solve.

The GUARD robots only ever contact the floor plane (all task geoms are
contype=0/conaffinity=0 — reference engine.py:366-381, world.py:316-323 —
and robot geoms enable contact only against the floor), so the contact set
is a STATIC list of candidate points built at model-load time
(model.py: con_bodyid/con_point/con_radius). Each candidate is a sphere
point (capsule caps contribute two); a contact is active when the sphere
penetrates the pair margin above z=0 — MuJoCo activates contact force as
soon as dist < includemargin (= sum of both geoms' margins, verified
empirically against mujoco.mj_contactForce), and the old-Gym-derived GUARD
robots (swimmer/ant margin=0.01) rely on exactly that: the swimmer's links
never *penetrate* the floor (its root has no z dof) yet propel by friction
through margin contacts.

Joint limits (limited slide/hinge joints, model.py: lim_*) are 1-D
unilateral constraints in joint space and enter the SAME solve — the
coupling matters: the doggo's ankle limits carry the standing load through
the foot contacts, and solving them separately (penalty springs scaled by
the tiny leg inertias, the previous design) let the legs buckle ~18 deg
past their stops.

Force model (the structure of MuJoCo's soft-constraint solve,
lambda = (aref - a_free)/(A + R), with solref [timeconst, dampratio] and
solimp [d0, dmax] defaults):

  aref_i = k*depth_i + b*ddot_i        (impedance spring-damper target)
  (A + R) lambda = aref - a_free,  lambda >= 0   (projected Jacobi, A the
      constraint-space Delassus matrix J M^-1 J^T over contacts AND limits)
  k = d/(dmax^2 tc^2),  b = 2/(dmax tc),
  R_i = (1-d)/d * mean_k(w_ik)         (impedance regularization; keeps
      forces finite — and matching MuJoCo — when a direction is
      kinematically locked, e.g. the point/swimmer roots have no z dof)

The -a_free feed-forward supplies the exact gravity/inverse-dynamics
cancellation, so bodies rest at near-zero penetration like MuJoCo's (a pure
penalty spring must sink until k*depth balances weight — the light GUARD
doggo, total mass 0.04, sank ~5 cm that way).

Friction is velocity-based and cannot be applied explicitly: at GUARD
timesteps (swimmer h=0.015 with 6 margin contacts) the stick-slope forces
are far beyond the explicit-Euler stability limit. Instead they return as a
damping matrix Hc = sum_c,k slope[c,k] * J_ck J_ck^T folded into the
implicit-Euler left-hand side (M + h*D + h*Hc) by the pipeline —
unconditionally stable for any slope. The slope is clamped per-contact so
the implied force respects the Coulomb cone ||ft|| <= mu*fn at the current
slip speed: at small slip it acts as stick (static friction), at large slip
it saturates to sliding Coulomb friction.

Branch-free: inactive constraints contribute exactly zero force/damping.
"""

from __future__ import annotations

import jax.numpy as jnp

import functools
import jax

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from guardx_tpu.physics.model import Model

# MuJoCo default solimp impedance (d0=0.9, dmax=0.95); GUARD models never
# override solimp so these are global constants.
_IMP_D = 0.9
_IMP_DMAX = 0.95
_JACOBI_ITERS = 8
_JACOBI_OMEGA = 0.8


def constraint_terms(model: Model, qpos, qvel, qacc_free, xpos, xmat, S,
                     origin, chol, h):
    """Unilateral-constraint contributions for the implicit-Euler solve.

    Returns (qfrc, Hc):
      qfrc: (nv,) explicit generalized force (contact normals + limit
            torques from the coupled projected-Jacobi solve)
      Hc:   (nv, nv) velocity-damping matrix to fold into the LHS as h*Hc
            (friction slopes)

    Args:
      qpos/qvel: generalized state
      qacc_free: (nv,) acceleration of the smooth (constraint-free)
        dynamics, for the a_free feed-forward
      xpos/xmat: body frames from FK
      S: (nv, 6) dof motion subspaces (tree-root-origin spatial coords)
      origin: (nbody, 3) per-body tree-root reference position
      chol: (factor, solve_fn) for the smooth (M + h*D) from
            pipeline._spd_factor — supplies Delassus products
      h: substep timestep
    """
    chol, solve = chol
    nv = model.nv
    nfloor = model.con_bodyid.shape[0] if model.ncontact else 0
    npair = model.pair_body_a.shape[0] if model.npair else 0
    nl = model.lim_dofadr.shape[0] if model.nlimit else 0
    dtype = qvel.dtype

    Sw, Sv = S[:, :3], S[:, 3:]  # (nv, 3)

    def _point_jac(bids, points):
        """(n, nv, 3) world-frame point Jacobians for points on bodies."""
        n = bids.shape[0]
        anc = model.anc_mask[bids]  # (n, nv)
        rel = points - origin[bids]
        lin = Sv[None, :, :] + jnp.cross(
            jnp.broadcast_to(Sw[None, :, :], (n,) + Sw.shape),
            rel[:, None, :],
        )  # (n, nv, 3)
        return anc[:, :, None] * lin

    # Contact blocks: each contributes (Jc3, depth, friction) where Jc3 is
    # (n, nv, 3) in the contact frame with direction 2 = normal.
    blocks = []

    if nfloor:
        bid = model.con_bodyid
        pw = xpos[bid] + _einsum("cij,cj->ci", xmat[bid], model.con_point)
        Jf = _point_jac(bid, pw)
        if model.terrain_amp == 0.0:
            # flat floor: margin-aware depth, normal = +z (frame = identity)
            depth_f = model.con_radius + model.con_margin - pw[:, 2]
            blocks.append((Jf, depth_f, model.con_friction))
        else:
            # analytic sinusoidal terrain: height + gradient give the
            # contact depth and surface normal per candidate
            amp, fx, fy = model.terrain_amp, model.terrain_fx, model.terrain_fy
            x, y = pw[:, 0], pw[:, 1]
            hz = amp * jnp.sin(fx * x) * jnp.sin(fy * y)
            dhdx = amp * fx * jnp.cos(fx * x) * jnp.sin(fy * y)
            dhdy = amp * fy * jnp.sin(fx * x) * jnp.cos(fy * y)
            depth_f = model.con_radius + model.con_margin - (pw[:, 2] - hz)
            n_f = jnp.stack([-dhdx, -dhdy, jnp.ones_like(hz)], axis=-1)
            n_f = n_f / jnp.linalg.norm(n_f, axis=-1, keepdims=True)
            t1 = jnp.cross(
                jnp.broadcast_to(
                    jnp.array([0.0, 1.0, 0.0], dtype), n_f.shape
                ),
                n_f,
            )
            t1 = t1 / jnp.maximum(
                jnp.linalg.norm(t1, axis=-1), 1e-9
            )[:, None]
            t2 = jnp.cross(n_f, t1)
            frame_f = jnp.stack([t1, t2, n_f], axis=-1)
            blocks.append((
                _einsum("cvk,ckl->cvl", Jf, frame_f),
                depth_f,
                model.con_friction,
            ))

    if npair:
        ba, bb = model.pair_body_a, model.pair_body_b
        pa_w = xpos[ba] + _einsum("cij,cj->ci", xmat[ba], model.pair_pos_a)
        pb_w = xpos[bb] + _einsum("cij,cj->ci", xmat[bb], model.pair_pos_b)

        # sphere-sphere: normal along center delta
        delta_ss = pa_w - pb_w
        dist_ss = jnp.linalg.norm(delta_ss, axis=-1)
        n_ss = delta_ss / jnp.maximum(dist_ss, 1e-9)[:, None]
        rb = model.pair_size_b[:, 0]
        depth_ss = model.pair_radius_a + rb + model.pair_margin - dist_ss
        p_ss = pb_w + n_ss * rb[:, None]

        # sphere-box: closest point on the box to the sphere center
        Rb = _einsum("cij,cjk->cik", xmat[bb], model.pair_mat_b)  # world rot
        local = _einsum("cji,cj->ci", Rb, pa_w - pb_w)  # box frame
        sb = model.pair_size_b
        clamped = jnp.clip(local, -sb, sb)
        outside_delta = local - clamped
        dist_out = jnp.linalg.norm(outside_delta, axis=-1)
        # inside the box: push out through the nearest face
        face_gap = sb - jnp.abs(local)  # (np, 3) >= 0 when inside
        min_ax = jnp.argmin(face_gap, axis=-1)
        ax_onehot = jax.nn.one_hot(min_ax, 3, dtype=dtype)
        n_in_local = ax_onehot * jnp.sign(
            jnp.take_along_axis(local, min_ax[:, None], axis=-1)
        )
        inside = (dist_out < 1e-9).astype(dtype)
        dist_sb = jnp.where(
            inside > 0.0,
            -jnp.min(face_gap, axis=-1),
            dist_out,
        )
        n_local = jnp.where(
            (inside > 0.0)[:, None],
            n_in_local,
            outside_delta / jnp.maximum(dist_out, 1e-9)[:, None],
        )
        n_sb = _einsum("cij,cj->ci", Rb, n_local)
        depth_sb = model.pair_radius_a + model.pair_margin - dist_sb
        p_sb = pb_w + _einsum("cij,cj->ci", Rb, clamped)

        is_box = model.pair_is_box
        n_p = jnp.where((is_box > 0.0)[:, None], n_sb, n_ss)
        depth_p = jnp.where(is_box > 0.0, depth_sb, depth_ss)
        p_c = jnp.where((is_box > 0.0)[:, None], p_sb, p_ss)

        # contact frame (t1, t2, n)
        up = jnp.where(
            (jnp.abs(n_p[:, 2]) < 0.9)[:, None],
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype), n_p.shape),
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), n_p.shape),
        )
        t1 = jnp.cross(up, n_p)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1), 1e-9)[:, None]
        t2 = jnp.cross(n_p, t1)
        frame = jnp.stack([t1, t2, n_p], axis=-1)  # (np, 3, 3)

        # relative point Jacobian (body a minus body b), projected to frame
        Jrel = _point_jac(ba, p_c) - _point_jac(bb, p_c)  # (np, nv, 3)
        Jp = _einsum("cvk,ckl->cvl", Jrel, frame)
        blocks.append((Jp, depth_p, model.pair_friction))

    nc = sum(b[0].shape[0] for b in blocks)
    rows_J, rows_depth = [], []
    if nc:
        Jc = jnp.concatenate([b[0] for b in blocks], axis=0)  # (nc, nv, 3)
        fric_c = jnp.concatenate([b[2] for b in blocks], axis=0)
        rows_J.append(Jc[:, :, 2])
        rows_depth.append(jnp.concatenate([b[1] for b in blocks], axis=0))

    if nl:
        q_l = qpos[model.lim_qposadr]
        lo, hi = model.lim_range[:, 0], model.lim_range[:, 1]
        over = q_l - hi  # >0: above upper limit, push with -e_dof
        under = lo - q_l  # >0: below lower limit, push with +e_dof
        sign = jnp.where(under > over, 1.0, -1.0).astype(dtype)
        depth_l = jnp.maximum(over, under)
        Jl = (
            jax.nn.one_hot(model.lim_dofadr, nv, dtype=dtype)
            * sign[:, None]
        )  # (nl, nv)
        rows_J.append(Jl)
        rows_depth.append(depth_l)

    if not rows_J:
        z = jnp.zeros(nv, dtype=dtype)
        return z, jnp.zeros((nv, nv), dtype=dtype)

    J = jnp.concatenate(rows_J, axis=0)  # (nr, nv)
    depth = jnp.concatenate(rows_depth, axis=0)  # (nr,)
    active = (depth > 0.0).astype(dtype)

    # Delassus products: one batched triangular solve covers the normal/
    # limit rows AND the contact tangent diagonals (for friction slopes)
    if nc:
        Jt = Jc[:, :, :2].transpose(1, 0, 2).reshape(nv, nc * 2)
        big = jnp.concatenate([J.T, Jt], axis=1)  # (nv, nr + 2nc)
    else:
        big = J.T
    Minv_big = solve(chol, big)
    nr = J.shape[0]
    MinvJ = Minv_big[:, :nr]  # (nv, nr)
    A = _einsum("rv,vs->rs", J, MinvJ)  # (nr, nr)
    w = jnp.diagonal(A)  # (nr,)
    if nc:
        MinvJt = Minv_big[:, nr:].reshape(nv, nc, 2)
        wt = _einsum("cvk,vck->ck", Jc[:, :, :2], MinvJt)  # (nc, 2)
        # impedance regularization from the mean over the 3 directions
        # (matches MuJoCo's diagonal approximation; keeps locked rows finite)
        R_c = ((1.0 - _IMP_D) / _IMP_D) * (
            (w[:nc] + wt[:, 0] + wt[:, 1]) / 3.0
        )
        R_l = ((1.0 - _IMP_D) / _IMP_D) * w[nc:]
        R = jnp.concatenate([R_c, R_l])
    else:
        R = ((1.0 - _IMP_D) / _IMP_D) * w
    R = jnp.maximum(R, 1e-6)

    tc = model.con_solref[0]
    k = _IMP_D / (_IMP_DMAX * _IMP_DMAX * tc * tc)
    b = 2.0 / (_IMP_DMAX * tc)

    # impedance target and free acceleration along each row
    ddot = -_einsum("rv,v->r", J, qvel)  # rate of depth increase
    a_free = _einsum("rv,v->r", J, qacc_free)
    rhs = (k * depth + b * ddot - a_free) * active
    diag = w + R

    # projected Jacobi on (A + R) lambda = rhs, lambda >= 0
    lam = jnp.maximum(rhs / diag, 0.0) * active

    def jacobi(lam, _):
        resid = rhs - _einsum("rs,s->r", A, lam) - R * lam
        lam = jnp.maximum(lam + _JACOBI_OMEGA * resid / diag, 0.0) * active
        return lam, None

    lam, _ = jax.lax.scan(jacobi, lam, (), length=_JACOBI_ITERS)

    qfrc = _einsum("rv,r->v", J, lam)
    Hc = jnp.zeros((nv, nv), dtype=dtype)

    if nc:
        fn = lam[:nc]
        active_c = active[:nc]
        # friction slope, clamped so slope*|v_t| <= mu*fn at the current
        # slip speed (smoothly blends stick -> sliding Coulomb)
        vt = _einsum("cvk,v->ck", Jc[:, :, :2], qvel)  # (nc, 2)
        vt_speed = jnp.linalg.norm(vt, axis=-1)
        slope_t = b / (wt + R[:nc, None])  # (nc, 2)
        cone_slope = (fric_c * fn) / (vt_speed + 1e-3)
        slope_t = jnp.minimum(slope_t, cone_slope[:, None]) * active_c[:, None]
        Hc = _einsum("cvk,ck,cwk->vw", Jc[:, :, :2], slope_t, Jc[:, :, :2])

    return qfrc, Hc
