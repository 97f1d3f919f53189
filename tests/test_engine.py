"""Engine tests: construction, spaces, reset/step/reset_done semantics,
lidar/compass kernels, reward/cost, auto-reset, batching.

Mirrors the behavioral spec extracted from the reference engine
(SURVEY.md §2.1); the reference itself ships no tests (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guardx_tpu.envs import Engine
from guardx_tpu.envs import obs as obs_mod


def make_env(env_num=4, **over):
    cfg = {
        'robot_base': 'xmls/point.xml',
        'task': 'goal',
        'goal_size': 0.5,
        'observe_goal_comp': True,
        'observe_hazards': True,
        'constrain_hazards': True,
        'constrain_indicator': False,
        'lidar_num_bins': 16,
        'hazards_num': 8,
        'hazards_size': 0.3,
        'env_num': env_num,
        'num_steps': 60,
        '_seed': 0,
    }
    cfg.update(over)
    return Engine(cfg)


@pytest.fixture(scope="module")
def env():
    return make_env()


def test_spaces(env):
    # obs layout (sorted keys): ctrl(3) goal_compass(2) goal_lidar(16)
    # hazards_lidar(16) qpos(3) qvel(3) = 43 (qacc dropped — reference quirk)
    assert env.observation_space.shape == (43,)
    assert env.action_space.shape == (2,)  # point: 2-dim action


def test_reset_shapes_and_layout(env):
    obs = env.reset()
    assert obs.shape == (4, 43)
    assert bool(jnp.isfinite(obs).all())
    s = env._state
    # robot-goal separation >= 3 is enforced by the layout sampler
    robot_xy = s.data.qpos[:, :2]
    d = jnp.linalg.norm(s.goal_pos - robot_xy, axis=-1)
    assert bool((d >= 3.0 - 1e-5).all())
    # hazards respect extents
    assert bool((jnp.abs(s.hazards_pos) <= 2.0).all())


def test_step_moves_robot(env):
    env.reset()
    a = jnp.tile(jnp.array([1.0, 0.0]), (4, 1))
    x0 = np.asarray(env._state.data.qpos[:, 0]).copy()
    for _ in range(20):
        obs, r, d, info = env.step(a)
    assert 'cost' in info
    moved = np.abs(np.asarray(env._state.data.qpos[:, 0]) - x0)
    assert (moved > 1e-3).any()


def test_reward_is_distance_delta(env):
    """Reference semantics (pinned by tests/test_golden_parity.py): the
    first step after a full reset earns reward 0 (the None last-done chain,
    reference engine.py:790-792); later steps earn the distance delta on
    the step-lagged body frame (MuJoCo step order, physics.step)."""
    env.reset()
    a = jnp.tile(jnp.array([1.0, 0.0]), (4, 1))
    obs, r1, d, info = env.step(a)
    np.testing.assert_allclose(np.asarray(r1), 0.0, atol=1e-6)

    s1 = env._state
    x1 = s1.data.xpos[:, env.body_robot, :2]
    d1 = jnp.linalg.norm(s1.goal_pos - x1, axis=-1)
    obs, r2, d, info = env.step(a)
    s2 = env._state
    x2 = s2.data.xpos[:, env.body_robot, :2]
    d2 = jnp.linalg.norm(s2.goal_pos - x2, axis=-1)
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(d1 - d2), atol=1e-5
    )


def test_cost_hinge():
    env = make_env(env_num=2)
    env.reset()
    s = env._state
    # teleport robot onto hazard 0 of env 0
    haz = s.hazards_pos[0, 0]
    qpos = s.data.qpos.at[0, 0].set(haz[0]).at[0, 1].set(haz[1])
    env._state = s.replace(data=s.data.replace(qpos=qpos))
    obs, r, d, info = env.step(jnp.zeros((2, 2)))
    cost = np.asarray(info['cost'])
    assert cost[0] > 0.2  # robot is inside hazard 0: hinge ~ hazards_size
    assert cost[0] <= 0.3 * 8 + 1e-5


def test_time_limit_and_reset_done(env):
    obs = env.reset()
    a = jnp.zeros((4, 2))
    done_seen = False
    for t in range(70):
        obs, r, d, info = env.step(a)
        if bool((np.asarray(d) > 0).any()):
            done_seen = True
            obs2 = env.reset_done()
            assert obs2.shape == obs.shape
            assert bool(jnp.isfinite(obs2).all())
            # steps counter zeroed for done envs
            assert bool((np.asarray(env._state.steps)[np.asarray(d) > 0] == 0).all())
            break
    assert done_seen, "time limit (num_steps=60) should fire within 70 steps"


def test_lidar_kernel_semantics():
    """Bin geometry: object straight ahead lands in bin 0 with closeness
    exp(-dist); aliasing spills into the neighbors."""
    robot_pos = jnp.zeros(3)
    robot_mat = jnp.eye(3)
    pos = jnp.array([[2.0, 0.0]])
    lid = obs_mod.obs_lidar_pseudo(pos, robot_pos, robot_mat, 16, 1.0, None, True)
    assert lid.shape == (16,)
    np.testing.assert_allclose(float(lid[0]), np.exp(-2.0), rtol=1e-5)
    # angle exactly on the bin edge: alias weight 0 -> minus neighbor gets full
    assert float(lid[15]) > 0.0
    # occlusion: nearer object dominates the same bin
    pos2 = jnp.array([[2.0, 0.0], [1.0, 0.0]])
    lid2 = obs_mod.obs_lidar_pseudo(pos2, robot_pos, robot_mat, 16, 1.0, None, True)
    np.testing.assert_allclose(float(lid2[0]), np.exp(-1.0), rtol=1e-5)


def test_compass_is_egocentric():
    robot_pos = jnp.array([1.0, 1.0, 0.1])
    # robot rotated 90deg about z: world x becomes robot -y
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    robot_mat = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    comp = obs_mod.obs_compass(jnp.array([2.0, 1.0]), robot_pos, robot_mat)
    np.testing.assert_allclose(np.asarray(comp), [0.0, -1.0], atol=1e-6)


def test_goal_reach_gives_done():
    env = make_env(env_num=2)
    env.reset()
    s = env._state
    # place robot 0.4 from goal (inside goal_size=0.5): done expected
    tgt = s.goal_pos[0] - jnp.array([0.4, 0.0])
    qpos = s.data.qpos.at[0, 0].set(tgt[0]).at[0, 1].set(tgt[1])
    env._state = s.replace(
        data=s.data.replace(qpos=qpos),
        # suppress the teleport filter by matching history
        robot_pos_last=s.robot_pos_last.at[0].set(
            jnp.array([tgt[0], tgt[1], 0.1])
        ),
    )
    obs, r, d, info = env.step(jnp.zeros((2, 2)))
    assert float(d[0]) == 1.0


def test_nan_guard():
    env = make_env(env_num=2)
    env.reset()
    s = env._state
    env._state = s.replace(data=s.data.replace(qpos=s.data.qpos.at[0, 0].set(jnp.nan)))
    obs, r, d, info = env.step(jnp.zeros((2, 2)))
    assert float(d[0]) == 1.0 and float(r[0]) == 0.0
    assert float(d[1]) == 0.0 or float(d[1]) == 1.0  # env 1 unaffected path


def test_chunked_pool_matches_single_chunk_semantics():
    """Large pools generate candidates in chunks (engine.POOL_CHUNK); the
    compacted table must hold only valid layouts with the same acceptance
    semantics as the single-chunk path, and auto-sizing must keep
    n_valid >= env_num (the reference's layout-pool invariant,
    reference engine.py:444 — round-2 verdict weak #1/#2)."""
    env = make_env(env_num=4, gx_layout_pool=8192)
    key = jax.random.PRNGKey(7)

    single = jax.jit(env.make_layout_pool)(key)
    # force the chunked path at the same total candidate count
    old_chunk = Engine.POOL_CHUNK
    Engine.POOL_CHUNK = 2048
    try:
        chunked = jax.jit(env.make_layout_pool)(key)
    finally:
        Engine.POOL_CHUNK = old_chunk

    # same candidate count, different RNG streams: acceptance counts agree
    # statistically (Binomial(8192, ~0.02) — 6 sigma window)
    assert abs(int(single.n_valid) - int(chunked.n_valid)) < 80
    assert int(chunked.n_valid) > 60
    # every compacted layout in both satisfies the acceptance predicate:
    # robot-goal separation >= 3 and pairwise keepouts
    for pool in (single, chunked):
        n = int(pool.n_valid)
        placed = np.asarray(pool.placed[:n])  # (n, n_obj, 2)
        d_rg = np.linalg.norm(placed[:, 0] - placed[:, -1], axis=-1)
        assert (d_rg >= 3.0 - 1e-5).all()
        assert np.isfinite(placed).all()
    # chunked-path means should match single-path means (same distribution)
    n = int(single.n_valid)
    m_s = np.asarray(single.placed[:n]).mean(axis=(0, 1))
    m_c = np.asarray(chunked.placed[: int(chunked.n_valid)]).mean(axis=(0, 1))
    assert np.allclose(m_s, m_c, atol=0.25)


def test_auto_pool_strict_invariant():
    """Auto-sized pools must produce n_valid >= env_num; an explicitly
    undersized pool with gx_strict_pool raises in the Trainer."""
    env = make_env(env_num=4)  # auto sizing
    pool = jax.jit(env.make_layout_pool)(jax.random.PRNGKey(0))
    assert int(pool.n_valid) >= env.env_num
    assert env._pool_auto

    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    bad = make_env(env_num=64, num_steps=8, gx_layout_pool=64,
                   gx_strict_pool=True)
    with pytest.raises(ValueError, match="valid layouts"):
        Trainer(bad, REGISTRY['ppo'](), seed=0)
