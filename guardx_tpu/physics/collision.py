"""Floor-plane contact forces via a smooth penalty model.

The GUARD robots only ever contact the floor plane (all task geoms are
contype=0/conaffinity=0 — reference engine.py:366-381, world.py:316-323 —
and robot geoms enable contact only against the floor), so the contact set
is a STATIC list of candidate points built at model-load time
(model.py: con_bodyid/con_point/con_radius). Each candidate is a sphere
point (capsule caps contribute two); a contact is active when the sphere
penetrates z=0.

Force model: critically-damped spring in the contact normal scaled by the
effective inertia m_eff = 1/(J M^-1 J^T) of the contact normal, which gives
mass-independent error dynamics like MuJoCo's soft constraints (solref
[timeconst, dampratio]), plus regularized Coulomb friction in the tangent
plane. Branch-free: inactive contacts contribute exactly zero force.
"""

from __future__ import annotations

import jax.numpy as jnp

import functools
import jax

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from guardx_tpu.physics.model import Model


def contact_force(model: Model, qvel, xpos, xmat, S, origin, chol, h):
    """Generalized contact force (nv,).

    Args:
      qvel: (nv,) generalized velocity
      xpos/xmat: body frames from FK
      S: (nv, 6) dof motion subspaces (tree-root-origin spatial coords)
      origin: (nbody, 3) per-body tree-root reference position
      chol: (factor, solve_fn) for (M + h*D) from pipeline._spd_factor
      h: substep timestep (used only for scaling stability clamp)
    """
    chol, solve = chol
    if model.ncontact == 0:
        return jnp.zeros(model.nv, dtype=qvel.dtype)

    bid = model.con_bodyid  # (nc,)
    # world contact sphere centers (absolute, for depth) and tree-root-
    # relative (for Jacobians, consistent with S)
    pw = xpos[bid] + _einsum("cij,cj->ci", xmat[bid], model.con_point)
    pw_rel = pw - origin[bid]
    depth = model.con_radius - pw[:, 2]  # >0 means penetrating
    active = (depth > 0.0).astype(qvel.dtype)

    # contact point Jacobians: Jc[c,:,j] = anc[b,j] * (S_v[j] + S_w[j] x p_rel)
    anc_c = model.anc_mask[bid]  # (nc, nv)
    Sw, Sv = S[:, :3], S[:, 3:]  # (nv, 3)
    lin = Sv[None, :, :] + jnp.cross(
        jnp.broadcast_to(Sw[None, :, :], (bid.shape[0],) + Sw.shape),
        pw_rel[:, None, :],
    )  # (nc, nv, 3)
    Jc = anc_c[:, :, None] * lin  # (nc, nv, 3)

    # point velocities
    vpt = _einsum("cvk,v->ck", Jc, qvel)  # (nc, 3)

    # effective inertia of the normal direction per contact
    Jn = Jc[:, :, 2]  # (nc, nv)
    MinvJn = solve(chol, Jn.T)  # (nv, nc)
    w = _einsum("cv,vc->c", Jn, MinvJn)  # J M^-1 J^T diagonal
    # regularize by the inverse total mass: when the normal direction is
    # kinematically locked (w -> 0, e.g. the point robot has no vertical
    # dof), the effective inertia saturates instead of diverging
    w_floor = 0.01 / jnp.maximum(model.total_mass, 1e-6)
    m_eff = 1.0 / (w + w_floor)

    tc, damp_ratio = model.con_solref[0], model.con_solref[1]
    k = 1.0 / (tc * tc)
    c = 2.0 * damp_ratio / tc
    ddot = -vpt[:, 2]
    fn = m_eff * (k * depth + c * ddot)
    fn = jnp.maximum(fn, 0.0) * active

    # regularized Coulomb friction
    vt = vpt[:, :2]
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    eps_v = 1e-3
    ft = -model.con_friction[:, None] * fn[:, None] * vt / (vt_norm + eps_v)

    f = jnp.concatenate([ft, fn[:, None]], axis=-1)  # (nc, 3)
    qfrc = _einsum("cvk,ck->v", Jc, f)
    return qfrc
