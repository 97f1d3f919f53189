"""Policy replay + video export.

Rebuild of the reference's per-algo ``*_video.py`` scripts (e.g.
safe_rl_libX/cpo/cpo_video.py:1-40: load model.pt, run the env, render each
frame, write mp4 with cv2). One script covers every algorithm: it loads the
``jax_save/model.pkl`` pytree the trainer saved, replays the deterministic
policy (the mean action) on a 1-env Engine, renders through the host
mujoco Renderer (engine.render), and writes an mp4.

Usage:
    python -m guardx_tpu.video --model_path logs/<exp>/<exp>_s0 \
        --task Goal_Point_8Hazards --video_name out --max_ep_len 200
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def replay(model_dir: str, task: str, max_ep_len: int = 200, episodes: int = 1,
           video_name: str = 'video', out_dir: str = './video',
           fps: int = 30, seed: int = 0, deterministic: bool = True,
           hid: int = 64, layers: int = 2, recurrent: bool = False,
           lstm: int = 64):
    """Run the saved policy and write <out_dir>/<video_name>.mp4. Returns
    (frames_written, total_reward, total_cost)."""
    import joblib
    import jax
    import jax.numpy as jnp

    from guardx_tpu.algos.base import Networks, RecurrentNetworks
    from guardx_tpu.algos import core
    from guardx_tpu.envs.registry import create_env

    class _Args:
        pass

    a = _Args()
    a.task, a.env_num, a.seed, a.max_ep_len = task, 1, seed, max_ep_len
    env = create_env(a)

    model = joblib.load(os.path.join(model_dir, 'jax_save', 'model.pkl'))
    obs_rms = None
    if isinstance(model, dict) and 'obs_rms' in model:
        # obs_norm run: {'algo': AlgoState, 'obs_rms': {mu, var, count}}
        obs_rms = model['obs_rms']
        model = model['algo']
    pi_params = model.pi if hasattr(model, 'pi') else model['pi']
    recurrent = recurrent or 'LSTM' in task
    if recurrent:
        nets = RecurrentNetworks(
            env.obs_flat_size, env.action_space.shape[0],
            tuple([hid] * max(layers - 1, 1)), lstm_size=lstm,
        )

        @jax.jit
        def act_r(params, obs, rng, h):
            (mu, log_std), h = nets.pi_apply(params, obs, h)
            a = mu if deterministic else core.gaussian_sample(
                rng, mu, log_std
            )
            return a, h
    else:
        nets = Networks(env.obs_flat_size, env.action_space.shape[0],
                        tuple([hid] * layers))

        @jax.jit
        def act(params, obs, rng):
            mu, log_std = nets.pi_apply(params, obs)
            if deterministic:
                return mu
            return core.gaussian_sample(rng, mu, log_std)

    def norm(o):
        if obs_rms is None:
            return o
        return jnp.clip(
            (o - obs_rms['mu']) / jnp.sqrt(obs_rms['var'] + 1e-8),
            -10.0, 10.0,
        )

    frames = []
    total_r, total_c = 0.0, 0.0
    rng = jax.random.PRNGKey(seed)
    for _ in range(episodes):
        obs = env.reset()
        if recurrent:
            h = core.zero_carry((1,), lstm)
        for t in range(max_ep_len):
            rng, sub = jax.random.split(rng)
            if recurrent:
                action, h = act_r(pi_params, norm(obs), sub, h)
            else:
                action = act(pi_params, norm(obs), sub)
            obs, rew, done, info = env.step(jnp.asarray(action))
            total_r += float(rew[0])
            total_c += float(info['cost'][0])
            frames.append(env.render(env_idx=0))
            if float(done[0]) > 0:
                break

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'{video_name}.mp4')
    _write_mp4(path, frames, fps)
    print(f'wrote {path}: {len(frames)} frames, '
          f'return {total_r:.3f}, cost {total_c:.3f}')
    return len(frames), total_r, total_c


def _write_mp4(path: str, frames, fps: int):
    """cv2 VideoWriter, as in the reference video scripts; imageio
    fallback."""
    h, w = frames[0].shape[:2]
    try:
        import cv2

        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h)
        )
        for f in frames:
            writer.write(cv2.cvtColor(np.asarray(f), cv2.COLOR_RGB2BGR))
        writer.release()
    except Exception:
        import imageio

        imageio.mimwrite(path, [np.asarray(f) for f in frames], fps=fps)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', type=str, required=True,
                        help='run dir containing jax_save/model.pkl')
    parser.add_argument('--task', type=str, default='Goal_Point_8Hazards')
    parser.add_argument('--max_ep_len', type=int, default=200)
    parser.add_argument('--episodes', type=int, default=1)
    parser.add_argument('--video_name', type=str, default='video')
    parser.add_argument('--out_dir', type=str, default='./video')
    parser.add_argument('--fps', type=int, default=30)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--stochastic', action='store_true')
    parser.add_argument('--hid', type=int, default=64)
    parser.add_argument('--l', type=int, default=2)
    parser.add_argument('--recurrent', action='store_true')
    parser.add_argument('--lstm', type=int, default=64)
    args = parser.parse_args(argv)
    replay(args.model_path, args.task, args.max_ep_len, args.episodes,
           args.video_name, args.out_dir, args.fps, args.seed,
           deterministic=not args.stochastic, hid=args.hid, layers=args.l,
           recurrent=args.recurrent, lstm=args.lstm)


if __name__ == '__main__':
    main()
