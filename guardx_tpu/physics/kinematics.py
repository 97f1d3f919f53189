"""Forward kinematics, joint frames, and dof motion subspaces.

Single-environment functions; the pipeline vmaps them over the env batch.
The per-joint loop is a *static* Python loop over the (small) kinematic tree,
unrolled at trace time, so at runtime this is straight-line vector code.

Spatial-vector convention (Featherstone, world-origin coordinates):
  motion  m = (omega, v_o)  — angular velocity; linear velocity of the
                              body-fixed point currently at the world origin
  force   f = (n_o, f)      — torque about the world origin; linear force
A hinge dof at world anchor p with world axis a has motion subspace
S = (a, p x a); a slide dof has S = (0, a).
"""

from __future__ import annotations

import jax.numpy as jnp

import functools
import jax

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from guardx_tpu.physics import maths
from guardx_tpu.physics.model import (
    Model, Data, FREE, BALL, SLIDE, HINGE,
)


def fk(model: Model, qpos: jnp.ndarray):
    """Forward kinematics.

    Returns (xpos, xquat, xmat, xipos, S) where S is the (nv, 6) matrix of
    dof motion subspaces in world-origin spatial coordinates.
    Mirrors the role of MuJoCo's mj_kinematics for the subset of joint types
    used by the GUARD robots (free/hinge/slide; ball is supported for FK).
    """
    nbody, nv = model.nbody, model.nv
    xpos = [jnp.zeros(3, dtype=qpos.dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype=qpos.dtype)]
    # (kind, world axis, absolute anchor) per dof, recorded at the moment the
    # joint is processed — MuJoCo resolves multi-joint bodies SEQUENTIALLY,
    # so a slide that precedes a hinge in the same body keeps its un-rotated
    # axis (e.g. the point robot's x/y slides are world-fixed even though the
    # body also carries a z hinge; the walker's robot_y slide, which comes
    # AFTER its robot_z hinge in xmls/walker.xml, does rotate with it).
    dof_info = [None] * nv

    for i in range(1, nbody):
        p = model.body_parent_t[i]
        quat = maths.quat_mul(xquat[p], model.body_quat[i])
        pos = xpos[p] + maths.quat_rotate(xquat[p], model.body_pos[i])
        # apply this body's joints in order, recording axes/anchors as we go
        for j in range(model.njnt):
            if model.jnt_bodyid_t[j] != i:
                continue
            t = model.jnt_type_t[j]
            qadr = model.jnt_qposadr_t[j]
            dadr = model.jnt_dofadr_t[j]
            if t == FREE:
                pos = qpos[qadr:qadr + 3]
                quat = qpos[qadr + 3:qadr + 7]
                quat = quat / jnp.linalg.norm(quat)
                for k in range(3):
                    dof_info[dadr + k] = ("trans", k, None)
                R = maths.quat_to_mat(quat)
                for k in range(3):
                    # angular velocity expressed in the body-local frame
                    dof_info[dadr + 3 + k] = ("rot", R[:, k], pos)
            elif t == BALL:
                q_j = qpos[qadr:qadr + 4]
                q_j = q_j / jnp.linalg.norm(q_j)
                anchor = pos + maths.quat_rotate(quat, model.jnt_pos[j])
                quat = maths.quat_mul(quat, q_j)
                pos = anchor - maths.quat_rotate(quat, model.jnt_pos[j])
                R = maths.quat_to_mat(quat)
                for k in range(3):
                    dof_info[dadr + k] = ("rot", R[:, k], anchor)
            elif t == HINGE:
                angle = qpos[qadr]
                axis = model.jnt_axis[j]
                axis_w = maths.quat_rotate(quat, axis)  # invariant to own rot
                anchor = pos + maths.quat_rotate(quat, model.jnt_pos[j])
                q_j = maths.axis_angle_to_quat(axis, angle)
                quat = maths.quat_mul(quat, q_j)
                pos = anchor - maths.quat_rotate(quat, model.jnt_pos[j])
                dof_info[dadr] = ("rot", axis_w, anchor)
            else:  # SLIDE
                axis_w = maths.quat_rotate(quat, model.jnt_axis[j])
                pos = pos + axis_w * qpos[qadr]
                dof_info[dadr] = ("slide", axis_w, None)
        # materialization point per body: without it XLA's fusion
        # duplication recomputes the whole ancestor chain inside every
        # consumer fusion — exponential in tree depth (measured: fk at
        # depth 9 ran 3000x slower than depth 5 on CPU; same pathology in
        # kind on TPU). The barrier is semantically the identity.
        pos, quat = jax.lax.optimization_barrier((pos, quat))
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = maths.quat_to_mat(xquat)
    xipos = xpos + _einsum("bij,bj->bi", xmat, model.body_ipos)

    # spatial reference: each tree's quantities are referenced at its root
    # body position so lever arms stay O(body size) in float32 (see model.py
    # body_treeroot). Origin shifts cancel in all J^T I J / J^T f products.
    origin = xpos[model.body_treeroot]  # (nbody, 3)

    # assemble dof motion subspaces in tree-root-relative coordinates
    zeros3 = jnp.zeros(3, dtype=qpos.dtype)
    dof_origin = origin[
        jnp.asarray(
            [model.jnt_bodyid_t[j] for j in range(model.njnt)], dtype=jnp.int32
        )[model.dof_jntid]
    ]  # (nv, 3)
    S_rows = []
    for d in range(nv):
        kind, axis, anchor = dof_info[d]
        if kind == "trans":
            e = jnp.zeros(3, dtype=qpos.dtype).at[axis].set(1.0)
            S_rows.append(jnp.concatenate([zeros3, e]))
        elif kind == "slide":
            S_rows.append(jnp.concatenate([zeros3, axis]))
        else:  # rot about absolute anchor -> relative to the tree origin
            p_rel = anchor - dof_origin[d]
            S_rows.append(jnp.concatenate([axis, jnp.cross(p_rel, axis)]))
    S = jnp.stack(S_rows)  # (nv, 6)
    return xpos, xquat, xmat, xipos, S, origin


def integrate_qpos(model: Model, qpos, qvel, xquat, h):
    """Integrate qpos by qvel over h (quaternion exponential for free/ball).

    Matches MuJoCo mj_integratePos semantics: free-joint angular velocity is
    expressed in the *body-local* frame.
    """
    out = qpos
    for j in range(model.njnt):
        t = model.jnt_type_t[j]
        qadr = model.jnt_qposadr_t[j]
        dadr = model.jnt_dofadr_t[j]
        i = model.jnt_bodyid_t[j]
        if t == FREE:
            out = out.at[qadr:qadr + 3].add(h * qvel[dadr:dadr + 3])
            q = out[qadr + 3:qadr + 7]
            w_local = qvel[dadr + 3:dadr + 6]
            # local angular velocity: q_new = q * exp(w_local * h / 2)
            angle = jnp.linalg.norm(w_local)
            safe = jnp.where(angle > 1e-9, angle, 1.0)
            axis = w_local / safe
            dq = jnp.concatenate(
                [jnp.cos(0.5 * angle * h)[None], axis * jnp.sin(0.5 * angle * h)]
            )
            q_new = maths.quat_mul(q, dq)
            q_new = q_new / jnp.linalg.norm(q_new)
            out = out.at[qadr + 3:qadr + 7].set(q_new)
        elif t == BALL:
            q = out[qadr:qadr + 4]
            w_local = qvel[dadr:dadr + 3]
            angle = jnp.linalg.norm(w_local)
            safe = jnp.where(angle > 1e-9, angle, 1.0)
            axis = w_local / safe
            dq = jnp.concatenate(
                [jnp.cos(0.5 * angle * h)[None], axis * jnp.sin(0.5 * angle * h)]
            )
            q_new = maths.quat_mul(q, dq)
            q_new = q_new / jnp.linalg.norm(q_new)
            out = out.at[qadr:qadr + 4].set(q_new)
        else:
            out = out.at[qadr].add(h * qvel[dadr])
    return out
