"""Parity tests for the lane-major whole-substep Pallas kernel
(physics/lane_step.py) against the XLA general path (pipeline._step_general).

The CPU tier validates the MATH: the lane substep functions are pure jnp
over (B,) lane vectors, so they run eagerly (no XLA compile of the large
unrolled graph, which is prohibitively slow on CPU) and are compared
element-wise against the single-env general path. The TPU tier (skipped
elsewhere) compiles the real pallas_call and compares the full multi-
substep step at batch scale — the configuration production uses.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guardx_tpu.physics import lane_step, pipeline
from guardx_tpu.physics.model import Data


def _make_model(robot):
    if robot == 'franka':
        # geom-pair contact coverage (sphere-sphere + sphere-box rows)
        from guardx_tpu.envs.bench_tasks import NativeBenchEngine

        return NativeBenchEngine(
            'FrankaCubeStack', env_num=2, num_steps=8, seed=0
        ).model
    from guardx_tpu.envs import Engine

    env = Engine({
        'env_num': 2, 'num_steps': 8, 'task': 'goal',
        'robot_base': f'xmls/{robot}.xml', 'goal_size': 0.5,
        'hazards_num': 8, 'hazards_size': 0.3, 'constrain_hazards': True,
        'constrain_indicator': False, '_seed': 0,
    })
    return env.model


def _rand_state(m, B, seed=0):
    rng = np.random.RandomState(seed)
    qpos = rng.uniform(-0.1, 0.1, (B, m.nq)).astype(np.float32)
    # keep free/ball quats non-degenerate
    from guardx_tpu.physics.model import FREE, BALL

    for j in range(m.njnt):
        if m.jnt_type_t[j] == FREE:
            qpos[:, m.jnt_qposadr_t[j] + 3] += 1.0
        elif m.jnt_type_t[j] == BALL:
            qpos[:, m.jnt_qposadr_t[j]] += 1.0
    qvel = rng.uniform(-0.5, 0.5, (B, m.nv)).astype(np.float32)
    ctrl = rng.uniform(-1, 1, (B, m.nu)).astype(np.float32)
    return jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)


def _general_step_env(m, qp, qv, ct):
    d = Data(
        qpos=qp, qvel=qv, ctrl=ct, qacc=jnp.zeros(m.nv),
        xpos=jnp.zeros((m.nbody, 3)), xquat=jnp.zeros((m.nbody, 4)),
        xmat=jnp.zeros((m.nbody, 3, 3)), xipos=jnp.zeros((m.nbody, 3)),
    )
    o = pipeline._step_general(m, d)
    return o.qpos, o.qvel, o.qacc, o.xpos, o.xquat, o.xmat, o.xipos


@pytest.mark.parametrize('robot', ['walker', 'ant', 'franka'])
def test_lane_substep_math_matches_general(robot):
    """One lane substep (eager, B lanes) == the general path at substeps=1."""
    m = _make_model(robot).replace(substeps=1)
    B = 4
    qpos, qvel, ctrl = _rand_state(m, B)
    sn = lane_step.snapshot(m)

    qp_l = [qpos[:, i] for i in range(m.nq)]
    qv_l = [qvel[:, i] for i in range(m.nv)]
    ct_l = [ctrl[:, i] for i in range(m.nu)]
    qp2, qv2, qacc, fk = lane_step._substep(sn, qp_l, qv_l, ct_l, sn.h)
    lane_qpos = np.stack(
        [np.broadcast_to(np.asarray(x, np.float32), (B,)) for x in qp2], 1)
    lane_qvel = np.stack(
        [np.broadcast_to(np.asarray(x, np.float32), (B,)) for x in qv2], 1)
    lane_qacc = np.stack(
        [np.broadcast_to(np.asarray(x, np.float32), (B,)) for x in qacc], 1)

    for b in range(B):
        rq, rv, ra, *_ = _general_step_env(m, qpos[b], qvel[b], ctrl[b])
        scale = float(jnp.max(jnp.abs(ra))) + 1e-6
        np.testing.assert_allclose(lane_qpos[b], np.asarray(rq), atol=1e-5)
        np.testing.assert_allclose(lane_qvel[b], np.asarray(rv), atol=1e-4)
        assert float(jnp.max(jnp.abs(lane_qacc[b] - ra))) / scale < 1e-3


@pytest.mark.skipif(
    jax.devices()[0].platform not in ('tpu', 'axon'),
    reason='compiled Pallas kernel parity needs a TPU',
)
@pytest.mark.parametrize('robot', ['walker', 'ant', 'doggo', 'franka'])
def test_lane_kernel_tpu_parity(robot):
    """Compiled kernel vs the XLA general path: full multi-substep step."""
    m = _make_model(robot)
    B = 256
    qpos, qvel, ctrl = _rand_state(m, B)
    lane = lane_step.get_step_batch(m)(qpos, qvel, ctrl)
    ref = jax.jit(jax.vmap(
        lambda qp, qv, ct: _general_step_env(m, qp, qv, ct)
    ))(qpos, qvel, ctrl)
    names = ['qpos', 'qvel', 'qacc', 'xpos', 'xquat', 'xmat', 'xipos']
    for n, r, l in zip(names, ref, lane):
        r, l = np.asarray(r), np.asarray(l)
        rel = np.max(np.abs(r - l)) / (np.max(np.abs(r)) + 1e-9)
        assert rel < 5e-4, f'{robot}.{n}: rel err {rel}'


def test_lane_enabled_gating():
    """Eligibility: planar fast path, tiny nv, and pair-contact models are
    excluded; articulated GUARD robots are eligible on TPU."""
    walker = _make_model('walker')
    swimmer = _make_model('swimmer')
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    assert lane_step.enabled(walker) == on_tpu
    assert not lane_step.enabled(swimmer)  # nv < 8: XLA path already fine
