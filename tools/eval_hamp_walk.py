"""Walking evidence for the HumanoidAMP run (VERDICT r4 #3): episode
length and forward root displacement of the trained policy.

Loads the orbax checkpoint (full RunnerState incl. obs_rms), runs a
deterministic batch rollout, and reports EpLen stats + mean root XY
displacement over survived steps — "walking, not standing".

Usage: python tools/eval_hamp_walk.py <run_dir_with_checkpoint> [B] [T]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rundir = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 300

    from guardx_tpu.envs.bench_tasks import NativeBenchEngine
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.utils import checkpoint as ckpt

    env = NativeBenchEngine("HumanoidAMP", env_num=B, num_steps=T, seed=321)
    algo = REGISTRY['amp'](target_cost=0.0, target_kl=0.05,
                           demos=env.demo_amp_pairs(),
                           task_reward_w=0.0, disc_reward_w=1.0)
    tr = Trainer(env, algo, seed=321, epochs=1, obs_norm=True,
                 hidden_sizes=(512, 512))
    state, epoch, steps = ckpt.restore_checkpoint(rundir, tr.state)
    print(f"checkpoint: epoch {epoch}, total steps {steps}")
    nets, rms, pi = tr.nets, state.obs_rms, state.algo.pi

    @jax.jit
    def act(obs):
        o = jnp.clip((obs - rms['mu']) / jnp.sqrt(rms['var'] + 1e-8),
                     -10.0, 10.0)
        mu, _ = nets.pi_apply(pi, o)
        return mu

    obs = env.reset()
    # free-joint root position = qpos[0:3] (amp_humanoid, FREE joint first)
    root0 = np.asarray(env._state.data.qpos[:, :2])
    alive = np.ones(B, bool)
    ep_len = np.zeros(B, np.int32)
    last_xy = root0.copy()
    for t in range(T):
        obs, rew, done, info = env.step(act(obs))
        d = np.asarray(done) > 0
        xy = np.asarray(env._state.data.qpos[:, :2])
        last_xy[alive] = xy[alive]
        ep_len[alive] += 1
        alive &= ~d
        if not alive.any():
            break
    disp = np.linalg.norm(last_xy - root0, axis=-1)
    print(f"EpLen: mean {ep_len.mean():.1f} median {np.median(ep_len):.0f} "
          f"p90 {np.percentile(ep_len, 90):.0f} max {ep_len.max()} / {T}")
    print(f"root displacement over episode: mean {disp.mean():.2f} m, "
          f"median {np.median(disp):.2f} m, p90 {np.percentile(disp, 90):.2f} m")
    surv = ep_len >= int(0.8 * T)
    print(f"episodes reaching 0.8*T: {surv.mean()*100:.1f}%")
    if surv.any():
        print(f"  their mean displacement: {disp[surv].mean():.2f} m "
              f"({disp[surv].mean() / (T * env.dt):.2f} m/s)")


if __name__ == '__main__':
    main()
