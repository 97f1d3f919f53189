"""External-environment adapters.

Rebuild of the reference's Isaac adapters (IsaacGymWrapper at
safe_rl_env_config.py:2616-2644, IsaacLabWrapper at guard_utils/
wrapper.py:6-161): non-safety benchmark environments presented through the
GUARD env interface — ``reset() -> obs``, ``step(a) -> (obs, reward, done,
info)`` with ``info['cost']`` zero-padded, plus ``reset_done()``.

The IsaacGym/Isaac Lab backends are NVIDIA-GPU-only external binaries and
cannot exist on a TPU host; the adapters import them lazily and raise a
clear error if absent. ``ExternalEnvWrapper`` is the TPU-native addition:
it adapts ANY batched gym-style env (including torch-tensor envs, converted
through dlpack — guardx_tpu.utils.interop) into the same surface, which is
what the trainers actually require.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class ExternalEnvWrapper:
    """Adapt a batched gym-style env (numpy or torch tensors in/out) to the
    GUARD surface: jax arrays + info['cost'] zero-padding.

    This is the generic core of the reference's two Isaac wrappers: both
    reduce to "forward reset/step, pad cost with zeros" (the external tasks
    have no safety constraints — safe_rl_env_config.py:2640-2644,
    wrapper.py step())."""

    def __init__(self, env, env_num: int | None = None):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.env_num = env_num if env_num is not None else getattr(
            env, 'num_envs', getattr(env, 'env_num', 1)
        )

    @staticmethod
    def _to_jax(x):
        from guardx_tpu.utils.interop import to_jax

        return to_jax(x)

    def reset(self):
        out = self.env.reset()
        if isinstance(out, tuple):  # gymnasium (obs, info)
            out = out[0]
        if isinstance(out, dict):
            out = out.get('obs', out.get('policy'))
        return self._to_jax(out)

    def reset_done(self):
        if hasattr(self.env, 'reset_done'):
            out = self.env.reset_done()
            if isinstance(out, tuple):
                out = out[0]
            if isinstance(out, dict):
                out = out.get('obs', out.get('policy'))
            return self._to_jax(out)
        return self.reset()

    def step(self, action):
        action = np.asarray(action)
        out = self.env.step(action)
        if len(out) == 5:  # gymnasium: (obs, rew, terminated, truncated, info)
            obs, rew, term, trunc, info = out
            done = np.logical_or(np.asarray(term), np.asarray(trunc))
        else:
            obs, rew, done, info = out
        if isinstance(obs, dict):
            obs = obs.get('obs', obs.get('policy'))
        obs = self._to_jax(obs)
        rew = self._to_jax(rew).astype(jnp.float32)
        done = self._to_jax(done).astype(jnp.float32)
        info = dict(info) if isinstance(info, dict) else {}
        if 'cost' not in info:
            info['cost'] = jnp.zeros_like(rew)
        else:
            info['cost'] = self._to_jax(info['cost']).astype(jnp.float32)
        return obs, rew, done, info


class IsaacGymWrapper(ExternalEnvWrapper):
    """IsaacGym adapter (reference safe_rl_env_config.py:2616-2644):
    builds the env via isaacgymenvs.make and pads info['cost']=0."""

    def __init__(self, config: dict):
        try:
            import isaacgym  # noqa: F401
            import isaacgymenvs
        except ImportError as e:
            raise ImportError(
                "IsaacGym tasks require NVIDIA's isaacgym + isaacgymenvs "
                "(CUDA-only external packages; unavailable on TPU hosts). "
                "GUARD tasks run natively — use a Goal_* task instead."
            ) from e
        env = isaacgymenvs.make(
            seed=config['_seed'],
            task=config['task_name'],
            num_envs=config['env_num'],
            sim_device=config['device'],
            graphics_device_id=0,
            rl_device=config['device'],
            headless=config['headless'],
        )
        super().__init__(env, env_num=config['env_num'])


class IsaacLabWrapper(ExternalEnvWrapper):
    """Isaac Lab adapter (reference guard_utils/wrapper.py:6-161): policy-
    group observation extraction, done = terminated | truncated, cost=0."""

    def __init__(self, env):
        try:
            from omni.isaac.lab.envs import (  # noqa: F401
                DirectRLEnv, ManagerBasedRLEnv,
            )
        except ImportError as e:
            raise ImportError(
                "Isaac Lab tasks require omni.isaac.lab (unavailable on "
                "TPU hosts)."
            ) from e
        super().__init__(env)
        self.env.reset()

    @property
    def observation_space(self):
        return self.env.single_observation_space['policy']

    @observation_space.setter
    def observation_space(self, v):
        pass  # derived from the wrapped env

    @property
    def action_space(self):
        return self.env.single_action_space

    @action_space.setter
    def action_space(self, v):
        pass
