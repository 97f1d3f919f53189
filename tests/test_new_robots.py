"""Beyond-parity robots: hopper / humanoid / drone.

The reference registry names Goal_{Hopper,Humanoid,Drone}_* tasks but ships
no XMLs for them, so those tasks cannot construct there (SURVEY.md §1 L4 —
guard_utils/safe_rl_env_config.py names them; safe_rl_envs/.../xmls/ lacks
them). guardx_tpu ships the models; these tests pin that the full task
pipeline (registry -> Engine -> rollout) works and stays finite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guardx_tpu.envs import Engine
from guardx_tpu.envs.registry import configuration


# big-morphology robots (humanoid nv=23+, arm6 nv=9 with deep chains) cost
# minutes of CPU jit each; they run under -m slow, the small ones by default
ROBOTS = [
    "hopper",
    pytest.param("drone", marks=pytest.mark.slow),
    pytest.param("humanoid", marks=pytest.mark.slow),
    pytest.param("arm3", marks=pytest.mark.slow),
    pytest.param("arm6", marks=pytest.mark.slow),
]


@pytest.fixture(scope="module", params=ROBOTS)
def env(request):
    return Engine({
        "env_num": 4, "num_steps": 30, "task": "goal",
        "robot_base": f"xmls/{request.param}.xml",
        "hazards_num": 8, "constrain_hazards": True,
        "gx_layout_pool": 4096, "_seed": 0,
    })


def test_registry_names_resolve():
    for name in ["Goal_Hopper_8Hazards", "Goal_Humanoid_8Hazards",
                 "Goal_Drone_8Hazards", "Goal_Arm3_8Hazards",
                 "Goal_Arm6_8Hazards"]:
        cfg = configuration(name)
        assert cfg["robot_base"].endswith(
            name.split("_")[1].lower() + ".xml"
        )


def test_construct_and_spaces(env):
    assert env.obs_flat_size > 0
    assert env.action_space.shape[0] == (
        2 if env.is_point else env.model.nu
    )


def test_rollout_finite_and_steps(env):
    obs = env.reset()
    assert bool(jnp.all(jnp.isfinite(obs)))
    key = jax.random.PRNGKey(0)
    act_dim = env.action_space.shape[0]
    for _ in range(30):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, act_dim), minval=-1.0, maxval=1.0)
        obs, rew, done, info = env.step(a)
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(info["cost"])))
    # the robot must actually move under random thrust
    qvel = np.asarray(env._state.data.qvel)
    assert np.isfinite(qvel).all()
    assert np.abs(qvel).max() < 100.0  # no blow-up
