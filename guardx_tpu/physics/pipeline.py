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
    elementwise code; XLA's blocked cho_factor wins beyond ~2 dozen dofs.

    The cutover is empirical and platform-dependent (GUARDX_CHOL_UNROLL_MAX
    overrides): on CPU the unrolled form wins up to nv~21 and loses at
    nv=34; on TPU an xprof trace of the walker rollout showed the
    unrolled solve lowering to per-row `slice_reduce` loop fusions
    (tiny_chol.py:37) that consumed ~55% of the whole rollout — the
    O(nv^3) scalar graph also dominates compile time (32k HLO lines at
    nv=34). See PERF.md round 4."""
    import os

    import jax as _jax

    mode = os.environ.get('GUARDX_CHOL', 'auto')
    on_tpu = _jax.devices()[0].platform in ('tpu', 'axon')
    if mode == 'auto':
        # measured (PERF.md r4): on TPU the batch-on-lanes Pallas kernel
        # composes at ~zero marginal cost where the XLA-unrolled solve
        # costs +2.4 ms/substep in context; off-TPU the unrolled form
        # wins up to nv~21 and blocked beyond ~24
        mode = 'pallas' if on_tpu and model.nv <= tiny_chol.MAX_UNROLL_N \
            else 'unrolled'
    if mode == 'pallas':
        from guardx_tpu.ops.pallas_chol import solve_spd_env

        # 'factor' is the matrix itself; each solve re-factors in-kernel
        # (the n^3/6 lane ops are noise next to one HBM round trip)
        return Mh, solve_spd_env
    cap = int(os.environ.get('GUARDX_CHOL_UNROLL_MAX', '24'))
    if mode == 'unrolled' and model.nv <= min(cap, tiny_chol.MAX_UNROLL_N):
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


def _planar3_step(model: Model, data: Data) -> Data:
    """Closed-form step for the planar 3-dof fast path (point robot:
    slide-x, slide-y, hinge-z — model.fastpath_planar3).

    Lagrangian dynamics of one rigid body pivoting about its sliding
    origin: with c(th) = Rz(th) @ com,

        M = [[m, 0, -m cy], [0, m, m cx], [-m cy, m cx, Izz + m |c|^2]]
        bias = (-m w^2 cx, -m w^2 cy, 0)        (gravity is || z, axis z)

    plus armature on the diagonal and implicit joint damping (h*D on the
    LHS), integrated semi-implicitly — exactly the general pipeline's
    scheme, just with the FK/CRBA machinery folded away. Validated
    element-for-element against the general path (tests/test_physics.py::
    test_planar3_fastpath_matches_general) and against host MuJoCo
    (test_point_robot_trajectory_matches_mujoco)."""
    h = model.timestep / model.substeps
    mss, izz = model.fp_mass, model.fp_izz
    c0x, c0y, c0z = model.fp_com
    r2 = c0x * c0x + c0y * c0y
    arm = model.dof_armature
    dmp = model.dof_damping

    def substep(carry, _):
        qpos, qvel = carry
        x, y, th = qpos[0], qpos[1], qpos[2]
        w = qvel[2]
        ct, st = jnp.cos(th), jnp.sin(th)
        cx = ct * c0x - st * c0y
        cy = st * c0x + ct * c0y

        p = mss + arm[0] + h * dmp[0]
        r = mss + arm[1] + h * dmp[1]
        t = izz + mss * r2 + arm[2] + h * dmp[2]
        q = -mss * cy
        s = mss * cx

        tau = dynamics.actuator_force(model, data.ctrl)
        w2 = w * w
        rhs = jnp.stack([
            tau[0] + mss * w2 * cx - dmp[0] * qvel[0],
            tau[1] + mss * w2 * cy - dmp[1] * qvel[1],
            tau[2] - dmp[2] * qvel[2],
        ])

        # symmetric 3x3 solve, A = [[p,0,q],[0,r,s],[q,s,t]], by adjugate
        det = p * (r * t - s * s) - q * q * r
        inv_det = 1.0 / det
        qacc = jnp.stack([
            ((r * t - s * s) * rhs[0] + q * s * rhs[1] - q * r * rhs[2])
            * inv_det,
            (q * s * rhs[0] + (p * t - q * q) * rhs[1] - p * s * rhs[2])
            * inv_det,
            (-q * r * rhs[0] - p * s * rhs[1] + p * r * rhs[2]) * inv_det,
        ])
        qvel_new = qvel + h * qacc
        qpos_new = qpos + h * qvel_new
        return (qpos_new, qvel_new), qacc

    (qpos, qvel), qaccs = jax.lax.scan(
        substep, (data.qpos, data.qvel), (), length=model.substeps
    )
    qacc = qaccs[-1]

    # pre-integration body frame (MuJoCo step order; see step() docstring):
    # the LAST substep's input state — exactly data.qpos when substeps == 1
    # (bit-parity with the general path), else reconstructed
    if model.substeps == 1:
        qpos_fk = data.qpos
    else:
        qpos_fk = qpos - h * qvel
    x, y, th = qpos_fk[0], qpos_fk[1], qpos_fk[2]
    ct, st = jnp.cos(th), jnp.sin(th)
    z = jnp.zeros((), dtype=qpos.dtype)
    one = jnp.ones((), dtype=qpos.dtype)
    xpos = jnp.stack([
        jnp.stack([z, z, z]),
        jnp.stack([x, y, jnp.full((), model.fp_z0, qpos.dtype)]),
    ])
    half = 0.5 * th
    xquat = jnp.stack([
        jnp.stack([one, z, z, z]),
        jnp.stack([jnp.cos(half), z, z, jnp.sin(half)]),
    ])
    R = jnp.stack([
        jnp.stack([ct, -st, z]),
        jnp.stack([st, ct, z]),
        jnp.stack([z, z, one]),
    ])
    xmat = jnp.stack([jnp.eye(3, dtype=qpos.dtype), R])
    com_w = jnp.stack([
        x + ct * c0x - st * c0y,
        y + st * c0x + ct * c0y,
        model.fp_z0 + c0z,
    ])
    xipos = jnp.stack([jnp.zeros(3, dtype=qpos.dtype), com_w])
    return data.replace(
        qpos=qpos, qvel=qvel, qacc=qacc,
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
    )


def _step_general(model: Model, data: Data) -> Data:
    """The XLA scan-of-substeps path (vmapped by the env layer)."""
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


def step(model: Model, data: Data) -> Data:
    """Advance one control timestep (model.substeps internal substeps).

    Mirrors mjx.step as used at reference engine.py:668-670 — including
    MuJoCo's evaluation order: FK runs on the PRE-integration state, so
    the returned xpos/xmat lag qpos by one substep. The reference's
    obs/reward/cost consume exactly that lagged frame (verified
    element-for-element by tests/test_golden_parity.py), and skipping the
    post-integration FK refresh saves one FK per control step.

    On TPU, eligible articulated models route through the lane-major
    whole-substep Pallas kernel (physics/lane_step.py) under vmap —
    measured 3-6.6x over the XLA composition at B=4000 (PERF.md r5);
    unbatched calls and ineligible models take the XLA scan path.
    """
    if model.fastpath_planar3:
        return _planar3_step(model, data)
    from guardx_tpu.physics import lane_step

    if lane_step.enabled(model):
        def general_env(qpos, qvel, ctrl):
            d = Data(
                qpos=qpos, qvel=qvel, ctrl=ctrl,
                qacc=jnp.zeros(model.nv, qpos.dtype),
                xpos=jnp.zeros((model.nbody, 3), qpos.dtype),
                xquat=jnp.zeros((model.nbody, 4), qpos.dtype),
                xmat=jnp.zeros((model.nbody, 3, 3), qpos.dtype),
                xipos=jnp.zeros((model.nbody, 3), qpos.dtype),
            )
            o = _step_general(model, d)
            return o.qpos, o.qvel, o.qacc, o.xpos, o.xquat, o.xmat, o.xipos

        fn = lane_step.step_env_arrays(model, general_env)
        qpos, qvel, qacc, xpos, xquat, xmat, xipos = fn(
            data.qpos, data.qvel, data.ctrl
        )
        return data.replace(
            qpos=qpos, qvel=qvel, qacc=qacc,
            xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
        )
    return _step_general(model, data)
