"""Mass matrix, bias forces, and passive/actuator/limit forces.

All quantities use world-origin spatial coordinates (see kinematics.py).
Equation of motion solved by the pipeline:

    (M(q) + diag(armature)) qacc = tau_actuator + tau_passive + tau_contact
                                   - bias(q, qvel)

where bias = Coriolis/centrifugal + gravity (MuJoCo's qfrc_bias), computed
with the same ancestor-masked Jacobian used for the CRBA mass matrix, so the
whole computation is dense batched linear algebra:

    J6[i]  = anc_mask[i, :] * S.T          (6 x nv motion Jacobian of body i)
    M      = sum_i J6[i]^T I6[i] J6[i]
    bias   = sum_i J6[i]^T (I6[i] a_vp[i] + v[i] x* (I6[i] v[i]) - f_grav[i])
    a_vp[i]= sum_j anc[i,j] (v[body(j)] xm S[j]) qvel[j]

Equivalent to recursive CRBA + RNEA (Featherstone RBDA ch.5-6) but shaped as
matmuls for the TPU. Numerically validated against host MuJoCo's mj_fullM and
qfrc_bias in tests/test_physics.py.
"""

from __future__ import annotations

import jax.numpy as jnp

import functools
import jax

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from guardx_tpu.physics.model import Model, SLIDE, HINGE


def _skew(v):
    """Skew-symmetric matrix for batched vectors (..., 3) -> (..., 3, 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def spatial_inertia(model: Model, xmat, xipos_rel, xquat):
    """6x6 spatial inertia of each body about its tree-root origin.

    xipos_rel: body CoM relative to the body's tree-root position.
    """
    # world-frame rotational inertia about CoM: R_i * diag(I) * R_i^T where
    # R_i is the inertial-frame orientation (body orientation * iquat)
    from guardx_tpu.physics import maths

    iquat_world = maths.quat_mul(xquat, model.body_iquat)
    Ri = maths.quat_to_mat(iquat_world)  # (nbody, 3, 3)
    # contract-3 products as broadcast-sum (VPU): batched (3,3)x(3,3)
    # matmuls hit the MXU as thousands of 128x128-padded tiles (PERF.md
    # r4 — the in-context cost of these tiny einsums dominated mass_bias)
    tmp = Ri * model.body_inertia[:, None, :]
    Ic = jnp.sum(
        tmp[..., :, None, :] * Ri[..., None, :, :], axis=-1
    )  # (nbody, 3, 3) = Ri diag(I) Ri^T
    m = model.body_mass[:, None, None]
    cx = _skew(xipos_rel)  # (nbody, 3, 3)
    cxT = jnp.swapaxes(cx, -1, -2)
    cxcxT = jnp.sum(
        cx[..., :, None, :] * cx[..., None, :, :], axis=-1
    )  # cx @ cx^T
    top_left = Ic + m * cxcxT
    top_right = m * cx
    bot_left = m * cxT
    bot_right = m * jnp.broadcast_to(jnp.eye(3, dtype=xmat.dtype), cx.shape)
    I6 = jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bot_left, bot_right], axis=-1),
        ],
        axis=-2,
    )  # (nbody, 6, 6)
    return I6


def _cross_motion(a, b):
    """Spatial motion cross product a xm b for (...,6) vectors."""
    w1, v1 = a[..., :3], a[..., 3:]
    w2, v2 = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], axis=-1
    )


def _cross_force(m, f):
    """Spatial force cross product m x* f for (...,6) vectors."""
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)], axis=-1
    )


def mass_bias(model: Model, qvel, xmat, xipos, xquat, S, origin):
    """Mass matrix (with armature) and bias force (Coriolis + gravity).

    All spatial quantities are referenced at each body's tree-root position
    (origin), which S already is (kinematics.fk).
    """
    xipos_rel = xipos - origin
    anc = model.anc_mask  # (nbody, nv)
    # per-body 6 x nv Jacobian: J6[i, :, j] = anc[i, j] * S[j]
    J6 = anc[:, None, :] * S.T[None, :, :]  # (nbody, 6, nv)
    I6 = spatial_inertia(model, xmat, xipos_rel, xquat)
    nbody, _, nv = J6.shape

    # Contraction shaping for the TPU (PERF.md r4): the 6-wide contractions
    # run as broadcast-sums on the VPU (a batched (6,6)x(6,nv) einsum
    # lowers to thousands of padded MXU tiles), and the big contractions
    # flatten (nbody, 6) -> 6*nbody so ONE well-shaped matmul does the
    # work (ant: the two-stage einsum form cost 2.9 ms at B=4000; this
    # form 0.3 ms — identical math, reassociated).
    IJ = jnp.sum(
        I6[..., :, :, None] * J6[..., None, :, :], axis=-2
    )  # (nbody, 6, nv)
    Jf = J6.reshape(nbody * 6, nv)
    IJf = IJ.reshape(nbody * 6, nv)
    M = _einsum("ki,kj->ij", Jf, IJf)  # contract 6*nbody
    M = M + jnp.diag(model.dof_armature)

    # body spatial velocities (flattened matvec, contract nv)
    v_body = _einsum("kj,j->k", Jf, qvel).reshape(nbody, 6)

    # velocity-product accelerations: a_vp[i] = sum_j anc[i,j] W[j]
    # W[j] = (v_frame(j) xm S[j]) * qvel[j], where v_frame(j) is the velocity
    # of the virtual frame after dof j (preceding dofs only — dof_anc_mask)
    Sq = S * qvel[:, None]
    v_at_dof = jnp.sum(
        model.dof_anc_mask[:, :, None] * Sq[None, :, :], axis=1
    )  # (nv, 6)
    W = _cross_motion(v_at_dof, S) * (qvel * model.dof_vp_mask)[:, None]  # (nv, 6)
    a_vp = jnp.sum(anc[:, :, None] * W[None, :, :], axis=1)  # (nbody, 6)

    # spatial momentum and gyroscopic term (contract-6 as VPU sums)
    h_body = jnp.sum(I6 * v_body[:, None, :], axis=-1)  # (nbody, 6)
    f_body = (
        jnp.sum(I6 * a_vp[:, None, :], axis=-1)
        + _cross_force(v_body, h_body)
    )
    # gravity spatial force about the tree-root origin: (c_rel x m g, m g)
    mg = model.body_mass[:, None] * model.gravity[None, :]  # (nbody, 3)
    f_grav = jnp.concatenate([jnp.cross(xipos_rel, mg), mg], axis=-1)
    f_total = f_body - f_grav

    bias = _einsum("kv,k->v", Jf, f_total.reshape(nbody * 6))  # (nv,)
    return M, bias


def actuator_force(model: Model, ctrl):
    """Generalized force from joint-transmission actuators.

    ctrl is clamped to ctrlrange and gear-scaled force to forcerange, matching
    MuJoCo's <motor>/<general> actuators used by all GUARD robots.
    """
    c = jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1])
    # MuJoCo clamps the actuator force (gain*ctrl) to forcerange BEFORE the
    # gear transmission maps it into joint space (mjData.actuator_force).
    f_act = jnp.clip(
        c, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]
    )
    force = model.actuator_gear * f_act
    tau = jnp.zeros(model.nv, dtype=ctrl.dtype)
    tau = tau.at[model.actuator_dofadr].add(force)
    return tau


def passive_force(model: Model, qpos, qvel):
    """Joint spring forces (stiffness toward springref). Damping is handled
    implicitly in the integrator (see pipeline.step), like MuJoCo's Euler."""
    tau = jnp.zeros(model.nv, dtype=qvel.dtype)
    for j in range(model.njnt):
        t = model.jnt_type_t[j]
        if t not in (SLIDE, HINGE):
            continue
        k = model.jnt_stiffness[j]
        qadr = model.jnt_qposadr_t[j]
        dadr = model.jnt_dofadr_t[j]
        tau = tau.at[dadr].add(-k * (qpos[qadr] - model.jnt_springref[j]))
    return tau
