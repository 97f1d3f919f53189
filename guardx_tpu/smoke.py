"""Interactive smoke test: random-action rollout with timing.

Rebuild of the reference's myTest scripts
(reference: safe_rl_libX/trpo/myTest.py:1-80: build a 1-env Engine, drive
random actions, print state and per-step timing, optionally render) —
without the ipdb breakpoints and the total_reward NameError.

Usage:
    python -m guardx_tpu.smoke --task Goal_Point_8Hazards --steps 200
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--task', type=str, default='Goal_Point_8Hazards')
    parser.add_argument('--env_num', type=int, default=1)
    parser.add_argument('--steps', type=int, default=200)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--render', action='store_true',
                        help='save the last frame to smoke_frame.png')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from guardx_tpu.envs.registry import create_env

    class _A:
        pass

    a = _A()
    a.task, a.env_num, a.seed, a.max_ep_len = (
        args.task, args.env_num, args.seed, args.steps
    )
    env = create_env(a)
    print(f'task={args.task} env_num={args.env_num} '
          f'obs_dim={env.obs_flat_size} act_dim={env.action_space.shape[0]}')

    rng = np.random.RandomState(args.seed)
    lo = np.where(np.isfinite(env.action_space.low), env.action_space.low, -1)
    hi = np.where(np.isfinite(env.action_space.high), env.action_space.high, 1)

    obs = env.reset()
    jax.block_until_ready(obs)
    total_reward = np.zeros(args.env_num)
    total_cost = np.zeros(args.env_num)
    t0 = time.time()
    for t in range(args.steps):
        act = jnp.asarray(
            rng.uniform(lo, hi, size=(args.env_num, len(lo))).astype('f4')
        )
        obs, rew, done, info = env.step(act)
        total_reward += np.asarray(rew)
        total_cost += np.asarray(info['cost'])
        if t == 0:
            jax.block_until_ready(obs)
            t_compile = time.time() - t0
            t0 = time.time()
    jax.block_until_ready(obs)
    dt = time.time() - t0
    steps_done = max(args.steps - 1, 1)
    print(f'first step (incl. compile): {t_compile:.3f}s')
    print(f'{steps_done} steps in {dt:.3f}s -> '
          f'{steps_done * args.env_num / dt:.0f} env-steps/s')
    print(f'total_reward={total_reward.round(3)} '
          f'total_cost={total_cost.round(3)}')
    if args.render:
        frame = env.render(env_idx=0)
        try:
            import imageio

            imageio.imwrite('smoke_frame.png', frame)
            print('wrote smoke_frame.png')
        except Exception as e:
            print(f'render save failed: {e}')


if __name__ == '__main__':
    main()
