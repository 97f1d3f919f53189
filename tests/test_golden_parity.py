"""Golden parity vs the ACTUAL reference engine (VERDICT.md missing #2),
for ALL FIVE reference robots: point, swimmer, ant, walker, doggo (their
distinct qpos layouts, z-heights and root-joint types, reference
engine.py:738-811 + xmls/).

tests/golden/ref_goal_<robot>_8hazards.npz was produced by
tools/record_reference_golden.py, which EXECUTES the reference's own
obs()/reward_done()/cost() code (engine.py:738-811) on host-MuJoCo
trajectories of the reference's own compiled world model. Here the exact
recorded states are replayed through guardx_tpu and every element is
compared:

- FK: guardx forward kinematics reproduce the recorded robot body frame
- obs: the 43-dim flattened observation matches element-for-element
- reward/done/cost: sequences match, including the goal-reach dones and
  the post-done last_done reward semantics (env 2 parks at the goal) and
  nonzero hinge costs (env 1 starts on a hazard boundary)
- synthetic poses: lidar binning/aliasing, compass rotation, hinge cost
  against the reference outputs on adversarial random states
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from guardx_tpu import physics
from guardx_tpu.envs.engine import Engine, EnvState

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

ROBOTS = ["point", "swimmer", "ant", "walker", "doggo"]

CONFIG = {
    # reference safe_rl_env_config.py:59-82 Goal_<Robot>_8Hazards
    "task": "goal",
    "goal_size": 0.5,
    "observe_goal_comp": True,
    "observe_hazards": True,
    "constrain_hazards": True,
    "constrain_indicator": False,
    "lidar_num_bins": 16,
    "hazards_num": 8,
    "hazards_size": 0.3,
    "env_num": 1,
    "num_steps": 200,
    "_seed": 7,
}

_CACHE = {}


def _load(robot):
    if robot not in _CACHE:
        g = np.load(os.path.join(GOLDEN_DIR,
                                 f"ref_goal_{robot}_8hazards.npz"))
        e = Engine(dict(CONFIG, robot_base=f"xmls/{robot}.xml"))
        _CACHE[robot] = (g, e)
    return _CACHE[robot]


@pytest.fixture(scope="module", params=ROBOTS)
def robot(request):
    # point stays in the quick tier; the four articulated robots jit a
    # much larger FK and run in the slow tier
    if request.param != "point" and request.config.getoption("-m") and             "slow" in request.config.getoption("-m") and             "not slow" in request.config.getoption("-m"):
        pytest.skip("articulated-robot goldens run in the slow tier")
    return request.param


@pytest.fixture(scope="module")
def golden(robot):
    return _load(robot)[0]


@pytest.fixture(scope="module")
def env(robot):
    return _load(robot)[1]


# float32 replay tolerance: doggo's free-root states carry much larger
# velocity magnitudes (dt 0.01, stiff gains), so its f32 rounding noise
# is one decade above the planar robots'
# doggo: residual tolerance floor set by the reference's own slide-joint
# object drift BETWEEN consecutive steps (the golden pins positions per
# step, but reward/lidar mix step-t and step-t-1 quantities whose goal/
# hazard positions differ by the per-step drift, ~1e-5 m)
OBS_ATOL = {}
OBS_RTOL = {}
REW_ATOL = {"doggo": 6e-5}


def _state_at(env_, g, e, t, data):
    """guardx EnvState mirroring the reference host bookkeeping at
    post-step time t (t=0 is the reset state; steps are 1..T).

    The reference history chain starts as None after reset
    (engine.py:479-481); guardx encodes None as last_done=1.0 (see
    reset_single). For t >= 2 last_done is the recorded done of step t-1.
    """
    done = g[f"env{e}_done"]
    xpos_r = g[f"env{e}_xpos_robot"]
    last_done = 1.0 if t < 2 else float(done[t - 2])
    last_last_done = 1.0 if t < 3 else float(done[t - 3])
    # per-step object positions: the reference's slide-jointed task geoms
    # drift under solver noise for free-root robots (doggo ~0.07 mm/step);
    # guardx hazards are static state fields by design, so the golden
    # supplies the positions the reference's obs/cost actually consumed
    goal_t = g[f"env{e}_goal_xy_t"][t]
    hazards_t = g[f"env{e}_hazards_xy_t"][t]
    return EnvState(
        data=data,
        goal_pos=jnp.asarray(goal_t, jnp.float32),
        hazards_pos=jnp.asarray(hazards_t, jnp.float32),
        ghosts_pos=jnp.zeros((1, 2), jnp.float32),
        ghosts_origin=jnp.zeros((1, 2), jnp.float32),
        robbers_pos=jnp.zeros((1, 2), jnp.float32),
        box_pos=jnp.zeros(2, jnp.float32),
        box_vel=jnp.zeros(2, jnp.float32),
        robot_pos_last=jnp.asarray(xpos_r[max(t - 1, 0)], jnp.float32),
        robot_pos_last_last=jnp.asarray(xpos_r[max(t - 2, 0)], jnp.float32),
        last_done=jnp.float32(last_done),
        last_last_done=jnp.float32(last_last_done),
        steps=jnp.int32(t),
        rng=jnp.zeros(2, jnp.uint32),
    )


def _data_at(env_, g, e, t):
    """Recorded post-step state t as a guardx physics.Data.

    qpos/qvel/ctrl are the robot slice of the recorded full-model state;
    xpos/xmat carry the recorded (lagged — see physics.step docstring)
    robot body frame the reference obs/reward/cost actually consumed.
    """
    nq = int(g["meta_robot_nq"])
    nv = int(g["meta_robot_nv"])
    nu = int(g["meta_robot_nu"])
    data = physics.make_data(env_.model)
    data = data.replace(
        qpos=jnp.asarray(g[f"env{e}_qpos"][t][:nq], jnp.float32),
        qvel=jnp.asarray(g[f"env{e}_qvel"][t][:nv], jnp.float32),
        ctrl=jnp.asarray(g[f"env{e}_ctrl"][t][:nu], jnp.float32),
    )
    data = physics.forward(env_.model, data)
    b = env_.body_robot
    return data.replace(
        xpos=data.xpos.at[b].set(
            jnp.asarray(g[f"env{e}_xpos_robot"][t], jnp.float32)
        ),
        xmat=data.xmat.at[b].set(
            jnp.asarray(g[f"env{e}_xmat_robot"][t], jnp.float32)
        ),
    )


def test_obs_layout_matches_reference(golden, env):
    assert sorted(env.obs_space_dict.keys()) == \
        list(golden["meta_obs_keys"])
    assert env.obs_flat_size == int(golden["meta_obs_flat_size"])


@pytest.mark.parametrize("e", [0, 1, 2])
def test_fk_parity(golden, env, e):
    """guardx FK reproduces the reference robot body frame from qpos.

    MuJoCo's step leaves xpos = FK(pre-integration qpos), so the recorded
    xpos at step t+1 is the FK of recorded qpos at t (verified exactly on
    the recording)."""
    T = int(golden["meta_T"])
    nq = int(golden["meta_robot_nq"])
    for t in range(0, T, 7):
        data = physics.make_data(env.model).replace(
            qpos=jnp.asarray(golden[f"env{e}_qpos"][t][:nq], jnp.float32)
        )
        data = physics.forward(env.model, data)
        np.testing.assert_allclose(
            np.asarray(data.xpos[env.body_robot]),
            golden[f"env{e}_xpos_robot"][t + 1], atol=2e-5,
            err_msg=f"env{e} t={t} xpos",
        )
        np.testing.assert_allclose(
            np.asarray(data.xmat[env.body_robot]),
            golden[f"env{e}_xmat_robot"][t + 1], atol=2e-5,
            err_msg=f"env{e} t={t} xmat",
        )


@pytest.mark.parametrize("e", [0, 1, 2])
def test_obs_parity(golden, env, robot, e):
    """Element-for-element flattened observation equality on recorded
    states (reference obs(), engine.py:738-778)."""
    T = int(golden["meta_T"])
    for t in range(T + 1):
        data = _data_at(env, golden, e, t)
        state = _state_at(env, golden, e, t, data)
        flat, _ = env.obs(state, data)
        np.testing.assert_allclose(
            np.asarray(flat), golden[f"env{e}_obs"][t],
            atol=OBS_ATOL.get(robot, 3e-5),
            err_msg=f"env{e} t={t}",
        )


@pytest.mark.parametrize("e", [0, 1, 2])
def test_reward_done_cost_parity(golden, env, robot, e):
    """reward/done/cost sequences (reference engine.py:787-811), incl.
    goal-reach dones and post-done reward masking."""
    T = int(golden["meta_T"])
    for t in range(1, T + 1):
        data = _data_at(env, golden, e, t)
        state = _state_at(env, golden, e, t, data)
        reward, done, _ = env.reward_done(state, data)
        cost = env.cost(state, data)
        assert float(done) == golden[f"env{e}_done"][t - 1], \
            f"env{e} t={t} done"
        np.testing.assert_allclose(
            float(reward), golden[f"env{e}_reward"][t - 1],
            atol=REW_ATOL.get(robot, 3e-6),
            err_msg=f"env{e} t={t} reward",
        )
        np.testing.assert_allclose(
            float(cost), golden[f"env{e}_cost"][t - 1], atol=3e-6,
            err_msg=f"env{e} t={t} cost",
        )


def test_golden_costs_nontrivial(golden):
    assert golden["env1_cost"].sum() > 1.0
    # env 2 exercises the goal-reach done path (doggo reaches it 4 times
    # in 80 random steps; the others far more)
    assert golden["env2_done"].sum() >= 3


def test_synthetic_lidar_compass_cost_parity(golden, env, robot):
    """Lidar/compass/cost on adversarial random poses vs the reference's
    own obs_lidar/obs_compass/cost outputs (engine.py:804-900)."""
    from guardx_tpu.envs import obs as obs_mod

    if robot != "point":
        pytest.skip("robot-agnostic math; recorded once (point)")
    n = golden["syn_robot_xy"].shape[0]
    for i in range(n):
        rxy = golden["syn_robot_xy"][i]
        th = float(golden["syn_robot_theta"][i])
        objs = jnp.asarray(golden["syn_objects_xy"][i], jnp.float32)
        gxy = jnp.asarray(golden["syn_goal_xy"][i], jnp.float32)
        c, s = np.cos(th), np.sin(th)
        rmat = jnp.asarray(
            [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32
        )
        rpos = jnp.asarray([rxy[0], rxy[1], 0.0], jnp.float32)

        lid = obs_mod.obs_lidar_pseudo(
            objs, rpos, rmat, env.lidar_num_bins, env.lidar_exp_gain,
            env.lidar_max_dist, env.lidar_alias,
        )
        np.testing.assert_allclose(
            np.asarray(lid), golden["syn_lidar"][i], atol=2e-6,
            err_msg=f"syn lidar {i}",
        )
        comp = obs_mod.obs_compass(gxy, rpos, rmat)
        np.testing.assert_allclose(
            np.asarray(comp), golden["syn_compass"][i], atol=2e-6,
            err_msg=f"syn compass {i}",
        )
        d = jnp.linalg.norm(objs - rpos[None, :2], axis=-1)
        cost = jnp.sum(env.hazards_size - jnp.minimum(d, env.hazards_size))
        np.testing.assert_allclose(
            float(cost), golden["syn_cost"][i], atol=2e-6,
            err_msg=f"syn cost {i}",
        )
