"""Extended GUARD task families (gx extension): ghosts, push, chase,
defense, continue_goal. The reference carries these configs but implements
none of them (SURVEY.md §1 L4); these tests pin the gx semantics."""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from guardx_tpu.envs import Engine
from guardx_tpu.envs.registry import create_env


def _env(task, env_num=4, steps=16):
    ns = argparse.Namespace(task=task, env_num=env_num, seed=0,
                            max_ep_len=steps)
    return create_env(ns)


def _random_rollout(env, steps, seed=0):
    rs = np.random.RandomState(seed)
    obs = env.reset()
    B = env.env_num
    tot_r, tot_c = np.zeros(B), np.zeros(B)
    for t in range(steps):
        a = jnp.asarray(
            rs.uniform(-1, 1, (B, env.action_space.shape[0])).astype('f4')
        )
        obs, rew, done, info = env.step(a)
        assert np.all(np.isfinite(np.asarray(obs)))
        tot_r += np.asarray(rew)
        tot_c += np.asarray(info['cost'])
    return obs, tot_r, tot_c


@pytest.mark.parametrize('task', [
    'Goal_Point_8Ghosts', 'Push_Point_8Hazards', 'Chase_Point_8Hazards',
    'Defense_Point_8Ghosts',
])
def test_family_constructs_and_steps(task):
    env = _env(task)
    obs, tot_r, tot_c = _random_rollout(env, 8)
    assert obs.shape[0] == 4


def test_ghosts_approach_robot():
    """Ghosts outside safe_dist must close distance to a stationary robot."""
    env = Engine({'env_num': 2, 'num_steps': 64, 'task': 'goal',
                  'hazards_num': 0, 'ghosts_num': 4, 'observe_ghosts': True,
                  'constrain_ghosts': True, 'ghosts_velocity': 0.02,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    d0 = None
    zero = jnp.zeros((2, env.action_space.shape[0]), jnp.float32)
    for t in range(40):
        obs, rew, done, info = env.step(zero)
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    ghosts = np.asarray(st.ghosts_pos)
    d_final = np.linalg.norm(ghosts - robot[:, None, :], axis=-1)
    # fresh reset distances for comparison
    env2 = Engine({'env_num': 2, 'num_steps': 64, 'task': 'goal',
                   'hazards_num': 0, 'ghosts_num': 4, 'observe_ghosts': True,
                   'constrain_ghosts': True, 'ghosts_velocity': 0.02,
                   '_seed': 0, 'gx_layout_pool': 4096})
    env2.reset()
    st0 = env2._state
    d_init = np.linalg.norm(
        np.asarray(st0.ghosts_pos)
        - np.asarray(st0.data.xpos[:, env2.body_robot, :2])[:, None, :],
        axis=-1,
    )
    # ghosts that started outside safe_dist moved closer (or hit safe_dist)
    far0 = d_init > env.ghosts_safe_dist
    assert np.mean(d_final[far0]) < np.mean(d_init[far0])


def test_ghost_cost_active():
    """A ghost sitting on the robot produces positive cost."""
    env = Engine({'env_num': 1, 'num_steps': 8, 'task': 'goal',
                  'hazards_num': 0, 'ghosts_num': 1, 'observe_ghosts': True,
                  'constrain_ghosts': True, '_seed': 0,
                  'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = st.data.xpos[:, env.body_robot, :2]
    st = st.replace(ghosts_pos=robot[:, None, :],
                    ghosts_origin=robot[:, None, :])
    env._state = st
    obs, rew, done, info = env.step(
        jnp.zeros((1, env.action_space.shape[0]), jnp.float32)
    )
    assert float(info['cost'][0]) > 0


def test_push_box_moves_when_hit():
    """Driving the robot into the box displaces it toward the push normal."""
    env = _env('Push_Point_8Hazards', env_num=2, steps=64)
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    # teleport the box right in front of the robot's +x world direction
    box = jnp.asarray(robot + np.array([0.5, 0.0]), jnp.float32)
    env._state = st.replace(box_pos=box)
    box0 = np.asarray(env._state.box_pos)
    # full forward thrust (point robot action 0 = body-frame x thrust)
    act = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (2, 1))
    for t in range(40):
        obs, rew, done, info = env.step(act)
    box1 = np.asarray(env._state.box_pos)
    assert np.linalg.norm(box1 - box0, axis=-1).max() > 0.05


def test_chase_reward_sign():
    """Moving toward the nearest robber yields positive chase reward."""
    env = Engine({'env_num': 1, 'num_steps': 32, 'task': 'chase',
                  'hazards_num': 0, 'robbers_num': 2,
                  'observe_robbers': True, 'robbers_velocity': 0.0,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    # put a static robber straight ahead in world frame
    robbers = np.stack([robot + np.array([1.5, 0.0]),
                        robot + np.array([-3.0, 0.0])], axis=1)
    env._state = st.replace(robbers_pos=jnp.asarray(robbers, jnp.float32))
    # point robot spawns with rot=0 (robot frame == world frame): thrust +x
    act = jnp.asarray([[1.0, 0.0]], jnp.float32)
    total = 0.0
    for t in range(20):
        obs, rew, done, info = env.step(act)
        total += float(rew[0])
        if float(done[0]):
            break
    assert total > 0.0


def test_defense_done_on_breach():
    """A robber reaching the goal ends the episode."""
    env = Engine({'env_num': 1, 'num_steps': 32, 'task': 'defense',
                  'hazards_num': 0, 'robbers_num': 1,
                  'observe_robbers': True, 'robbers_velocity': 0.3,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    zero = jnp.zeros((1, env.action_space.shape[0]), jnp.float32)
    done_seen = False
    for t in range(32):
        obs, rew, done, info = env.step(zero)
        if float(done[0]) > 0:
            done_seen = True
            break
    assert done_seen  # fast robber walks into the goal unopposed


def test_continue_goal_respawns():
    """continue_goal=True: reaching the goal respawns it (no done) and pays
    reward_goal."""
    env = Engine({'env_num': 1, 'num_steps': 64, 'task': 'goal',
                  'hazards_num': 0, 'continue_goal': True,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    # teleport the goal onto the robot: next step must respawn it
    goal0 = jnp.asarray(robot[0] + np.array([0.05, 0.0]), jnp.float32)
    env._state = st.replace(goal_pos=goal0[None, :])
    obs, rew, done, info = env.step(
        jnp.zeros((1, env.action_space.shape[0]), jnp.float32)
    )
    assert float(done[0]) == 0.0
    assert float(rew[0]) >= env.reward_goal - 1e-5  # includes the bonus
    goal1 = np.asarray(env._state.goal_pos[0])
    assert np.linalg.norm(goal1 - np.asarray(goal0)) > env.goal_size


def test_obs_dims_no_phantom_readings():
    """Empty object families and goal-less tasks read zero lidar."""
    env = Engine({'env_num': 1, 'num_steps': 8, 'task': 'chase',
                  'hazards_num': 0, 'robbers_num': 2,
                  'observe_robbers': True, '_seed': 0,
                  'gx_layout_pool': 4096})
    obs = env.reset()
    keys = sorted(env.obs_space_dict.keys())
    # flatten order is sorted; locate goal_lidar + hazards_lidar slices
    off = 0
    slices = {}
    for k in keys:
        n = int(np.prod(env.obs_space_dict[k].shape))
        slices[k] = (off, off + n)
        off += n
    o = np.asarray(obs[0])
    lo, hi = slices['goal_lidar']
    assert np.all(o[lo:hi] == 0)
    lo, hi = slices['hazards_lidar']
    assert np.all(o[lo:hi] == 0)
    lo, hi = slices['robbers_lidar']
    assert np.any(o[lo:hi] > 0)


# ---------------------------------------------------------------------------
# contract-pinning property tests (PARITY.md "gx task-family semantics"):
# each pins one clause of the documented motion/reward law so the families
# stay auditable (VERDICT r3 weak #6)
# ---------------------------------------------------------------------------

def test_ghost_travel_radius_clamp():
    """Ghosts never roam farther than ghosts_travel from their spawn
    anchor, no matter how long they chase."""
    env = Engine({'env_num': 2, 'num_steps': 128, 'task': 'goal',
                  'hazards_num': 0, 'ghosts_num': 4, 'observe_ghosts': True,
                  'constrain_ghosts': True, 'ghosts_velocity': 0.2,
                  'ghosts_travel': 1.0, '_seed': 3, 'gx_layout_pool': 4096})
    env.reset()
    zero = jnp.zeros((2, env.action_space.shape[0]), jnp.float32)
    for t in range(60):
        env.step(zero)
        st = env._state
        r = np.linalg.norm(
            np.asarray(st.ghosts_pos) - np.asarray(st.ghosts_origin),
            axis=-1,
        )
        assert r.max() <= env.ghosts_travel + 1e-5


def test_ghost_safe_dist_retreat():
    """A ghost inside ghosts_safe_dist backs AWAY from the robot."""
    env = Engine({'env_num': 1, 'num_steps': 16, 'task': 'goal',
                  'hazards_num': 0, 'ghosts_num': 1, 'observe_ghosts': True,
                  'constrain_ghosts': True, 'ghosts_velocity': 0.05,
                  'ghosts_safe_dist': 1.5, '_seed': 0,
                  'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    near = jnp.asarray(robot + np.array([0.4, 0.0]), jnp.float32)[:, None, :]
    # anchor the origin at the robot so the travel clamp cannot bind
    env._state = st.replace(ghosts_pos=near, ghosts_origin=near)
    d_prev = 0.4
    zero = jnp.zeros((1, env.action_space.shape[0]), jnp.float32)
    for t in range(5):
        env.step(zero)
        st = env._state
        d = float(np.linalg.norm(
            np.asarray(st.ghosts_pos[0, 0])
            - np.asarray(st.data.xpos[0, env.body_robot, :2])
        ))
        assert d > d_prev - 1e-4  # monotone retreat (robot nearly static)
        d_prev = d
    assert d_prev > 0.5  # net retreat after 5 steps at 0.05/step


def test_robbers_stay_in_arena():
    """Fleeing robbers are clamped to the placements extents."""
    env = Engine({'env_num': 2, 'num_steps': 128, 'task': 'chase',
                  'hazards_num': 0, 'robbers_num': 2,
                  'observe_robbers': True, 'robbers_velocity': 0.3,
                  '_seed': 1, 'gx_layout_pool': 4096})
    env.reset()
    xmin, ymin, xmax, ymax = env.placements_extents
    zero = jnp.zeros((2, env.action_space.shape[0]), jnp.float32)
    for t in range(50):
        env.step(zero)
        p = np.asarray(env._state.robbers_pos)
        assert (p[..., 0] >= xmin - 1e-5).all() and \
            (p[..., 0] <= xmax + 1e-5).all()
        assert (p[..., 1] >= ymin - 1e-5).all() and \
            (p[..., 1] <= ymax + 1e-5).all()


def test_defense_robbers_flee_near_attack_far():
    """Defense motion law: a robber within 1.0 of the robot moves away
    from it; a distant robber moves toward the goal."""
    env = Engine({'env_num': 1, 'num_steps': 16, 'task': 'defense',
                  'hazards_num': 0, 'robbers_num': 2,
                  'observe_robbers': True, 'robbers_velocity': 0.05,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])[0]
    goal = np.asarray(st.goal_pos[0])
    # both robbers must start INSIDE the placements extents (the motion
    # law clamps to the arena — test_robbers_stay_in_arena): robber 0
    # near the robot, toward the arena center; robber 1 at the in-arena
    # corner farthest from the robot
    to_center = -robot / (np.linalg.norm(robot) + 1e-8)
    r0 = robot + 0.5 * to_center
    corners = np.array([[1.8, 1.8], [1.8, -1.8], [-1.8, 1.8], [-1.8, -1.8]])
    r1 = corners[np.argmax(np.linalg.norm(corners - robot, axis=-1))]
    assert np.linalg.norm(r1 - robot) > 1.0
    robbers = jnp.asarray(np.stack([r0, r1])[None], jnp.float32)
    env._state = st.replace(robbers_pos=robbers)
    env.step(jnp.zeros((1, env.action_space.shape[0]), jnp.float32))
    p = np.asarray(env._state.robbers_pos[0])
    new_robot = np.asarray(env._state.data.xpos[0, env.body_robot, :2])
    # near robber: farther from the robot than before
    assert np.linalg.norm(p[0] - new_robot) > np.linalg.norm(r0 - robot) - 1e-3
    # far robber: closer to the goal than before
    assert np.linalg.norm(p[1] - goal) < np.linalg.norm(r1 - goal)


def test_push_box_depenetration_invariant():
    """The kinematic box never interpenetrates the robot disc: after every
    step, dist(box, robot) >= box_size + 0.2 (the contact radius), up to
    one-step numerical slack."""
    env = _env('Push_Point_8Hazards', env_num=2, steps=64)
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    env._state = st.replace(
        box_pos=jnp.asarray(robot + np.array([0.3, 0.0]), jnp.float32)
    )
    contact_r = env.box_size + 0.2
    act = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (2, 1))
    for t in range(30):
        env.step(act)
        st = env._state
        d = np.linalg.norm(
            np.asarray(st.box_pos)
            - np.asarray(st.data.xpos[:, env.body_robot, :2]),
            axis=-1,
        )
        assert (d >= contact_r - 0.05).all()


def test_push_approach_shaping_rewards_robot_motion():
    """The robot's OWN approach toward a stationary box earns the
    reward_box_dist * delta(robot->box) term (r5 fix: prev distances are
    captured from the PRE-step robot position; computing them post-step
    cancelled the robot's motion and zeroed push/chase shaping — CPO on
    Push_Point learned hazard avoidance but flat-zero task reward)."""
    env = _env('Push_Point_8Hazards', env_num=2, steps=64)
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    # stationary box far ahead (beyond contact range the whole test)
    box = jnp.asarray(robot + np.array([2.5, 0.0]), jnp.float32)
    env._state = st.replace(box_pos=box)
    act = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (2, 1))
    total = 0.0
    for t in range(12):
        obs, rew, done, info = env.step(act)
        total += float(np.asarray(rew)[0])
    box1 = np.asarray(env._state.box_pos)
    assert np.linalg.norm(box1 - np.asarray(box), axis=-1).max() < 1e-6, \
        "box should not have moved (no contact)"
    assert total > 0.02, f"approach shaping should be positive, got {total}"


def test_chase_closing_reward_without_catch():
    """Closing on a static robber earns positive reward BEFORE any catch
    bonus (the old post-step prev made the delta identically zero and the
    catch bonus masked it in test_chase_reward_sign)."""
    env = Engine({'env_num': 1, 'num_steps': 32, 'task': 'chase',
                  'hazards_num': 0, 'robbers_num': 2,
                  'observe_robbers': True, 'robbers_velocity': 0.0,
                  '_seed': 0, 'gx_layout_pool': 4096})
    env.reset()
    st = env._state
    robot = np.asarray(st.data.xpos[:, env.body_robot, :2])
    robbers = np.stack([robot + np.array([4.0, 0.0]),
                        robot + np.array([-5.0, 0.0])], axis=1)
    env._state = st.replace(robbers_pos=jnp.asarray(robbers, jnp.float32))
    act = jnp.asarray([[1.0, 0.0]], jnp.float32)
    total = 0.0
    for t in range(5):
        obs, rew, done, info = env.step(act)
        assert not float(done[0]), "must not catch in this test"
        total += float(rew[0])
    assert total > 0.01, f"closing reward should be positive, got {total}"
