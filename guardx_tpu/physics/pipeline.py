"""Physics pipeline: forward() and step(), the public single-env API.

These mirror the role of mjx.forward / mjx.step in the reference
(safe_rl_envs/safe_rl_envs/envs/engine.py:655,668-670). They operate on ONE
environment; the env layer wraps them in jax.vmap over the batch axis and
jit/shard_map over the device mesh.

Integration: semi-implicit Euler with implicit joint damping —
  (M + h*diag(damping)) * qacc = tau - bias - damping*qvel
  qvel' = qvel + h*qacc ; qpos' = integrate(qpos, qvel', h)
— the same scheme as MuJoCo's default Euler integrator. `model.substeps`
internal substeps per step() keep stiff robots (ant: timestep 0.09) stable
under the penalty contact model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from guardx_tpu.ops import tiny_chol
from guardx_tpu.physics import collision, dynamics, kinematics
from guardx_tpu.physics.model import Model, Data


def _spd_factor(model: Model, Mh):
    """Factor (M + hD). For GUARD-sized nv the unrolled Cholesky
    (guardx_tpu.ops.tiny_chol) turns the batched solve into fused VPU
    elementwise code; XLA's blocked cho_factor only wins at large nv."""
    if model.nv <= tiny_chol.MAX_UNROLL_N:
        return tiny_chol.chol_tiny(Mh), tiny_chol.chol_solve_tiny
    return cho_factor(Mh), cho_solve


def _smooth_dynamics(model: Model, qpos, qvel, ctrl, h):
    """One dynamics evaluation: returns (qacc, fk results)."""
    xpos, xquat, xmat, xipos, S, origin = kinematics.fk(model, qpos)
    M, bias = dynamics.mass_bias(model, qvel, xmat, xipos, xquat, S, origin)
    # implicit joint damping: fold h*D into the LHS
    Mh = M + h * jnp.diag(model.dof_damping)
    chol, solve = _spd_factor(model, Mh)

    tau = dynamics.actuator_force(model, ctrl)
    tau = tau + dynamics.passive_force(model, qpos, qvel)

    rhs = tau - bias - model.dof_damping * qvel
    qacc_free = solve(chol, rhs)
    if model.ncontact == 0 and model.nlimit == 0 and model.npair == 0:
        return qacc_free, (xpos, xquat, xmat, xipos)

    # unilateral constraints (floor contacts + joint limits): explicit
    # impedance forces from the coupled projected-Jacobi solve + implicit
    # friction slopes as a damping matrix in the LHS; the smooth factor
    # above supplies the Delassus products and the free acceleration
    qfrc_c, Hc = collision.constraint_terms(
        model, qpos, qvel, qacc_free, xpos, xmat, S, origin, (chol, solve), h
    )
    chol_c, solve_c = _spd_factor(model, Mh + h * Hc)
    qacc = solve_c(chol_c, rhs + qfrc_c - Hc @ qvel)
    return qacc, (xpos, xquat, xmat, xipos)


def forward(model: Model, data: Data) -> Data:
    """Recompute derived quantities (FK, qacc) without integrating.

    Mirrors mjx.forward as used at reference engine.py:655 (after reset).
    """
    h = model.timestep / model.substeps
    qacc, (xpos, xquat, xmat, xipos) = _smooth_dynamics(
        model, data.qpos, data.qvel, data.ctrl, h
    )
    return data.replace(qacc=qacc, xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos)


def step(model: Model, data: Data) -> Data:
    """Advance one control timestep (model.substeps internal substeps).

    Mirrors mjx.step as used at reference engine.py:668-670 — including
    MuJoCo's evaluation order: FK runs on the PRE-integration state, so
    the returned xpos/xmat lag qpos by one substep. The reference's
    obs/reward/cost consume exactly that lagged frame (verified
    element-for-element by tests/test_golden_parity.py), and skipping the
    post-integration FK refresh saves one FK per control step.
    """
    h = model.timestep / model.substeps

    def substep(carry, _):
        qpos, qvel, _fk, _qacc = carry
        qacc, fk = _smooth_dynamics(model, qpos, qvel, data.ctrl, h)
        _, xquat, _, _ = fk
        qvel_new = qvel + h * qacc
        qpos_new = kinematics.integrate_qpos(model, qpos, qvel_new, xquat, h)
        return (qpos_new, qvel_new, fk, qacc), None

    init_fk = (data.xpos, data.xquat, data.xmat, data.xipos)
    (qpos, qvel, (xpos, xquat, xmat, xipos), qacc), _ = jax.lax.scan(
        substep, (data.qpos, data.qvel, init_fk, data.qacc), (),
        length=model.substeps,
    )
    return data.replace(
        qpos=qpos,
        qvel=qvel,
        qacc=qacc,
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
    )
