"""Component-level timing of the hot epoch on the real chip.

Times (1) the batched env step alone, (2) policy act alone, (3) the full
trainer epoch, to locate where the 15 ms/step goes before optimizing.
Run: python tools/profile_step.py [env_num]
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    env_num = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from guardx_tpu.envs import Engine
    from guardx_tpu.algos import core
    from guardx_tpu.algos.base import Networks

    env = Engine({
        'env_num': env_num, 'num_steps': 200,
        'task': 'goal', 'goal_size': 0.5,
        'hazards_num': 8, 'hazards_size': 0.3,
        'constrain_hazards': True, 'constrain_indicator': False,
        '_seed': 0,
    })
    nets = Networks(env.obs_flat_size, env.action_space.shape[0])
    params = nets.init(jax.random.PRNGKey(0))[0]

    pool = jax.jit(env.make_layout_pool)(jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), env_num)
    obs, state = jax.jit(jax.vmap(env.reset_single, in_axes=(0, None)))(keys, pool)

    step = jax.jit(jax.vmap(env.step_single))
    act = jnp.zeros((env_num, env.action_space.shape[0]))

    def env_only(state, act):
        return step(state, act)

    t_env = timeit(env_only, state, act)
    print(f"env step           : {t_env*1e3:8.3f} ms  "
          f"({env_num/t_env/1e6:6.2f}M env-steps/s)")

    @jax.jit
    def pol(params, obs, rng):
        mu, log_std = nets.pi_apply(params, obs)
        return core.gaussian_sample(rng, mu, log_std)

    t_pol = timeit(pol, params, obs, jax.random.PRNGKey(3))
    print(f"policy act         : {t_pol*1e3:8.3f} ms")

    # physics alone (no obs/reward/cost/task bookkeeping)
    from guardx_tpu.physics import pipeline
    phys = jax.jit(jax.vmap(lambda d: pipeline.step(env.model, d)))
    t_phys = timeit(phys, state.data)
    print(f"physics step alone : {t_phys*1e3:8.3f} ms")

    # obs alone
    obs_fn = jax.jit(jax.vmap(lambda s: env.obs(s, s.data)))
    t_obs = timeit(obs_fn, state)
    print(f"obs alone          : {t_obs*1e3:8.3f} ms")

    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY
    algo = REGISTRY['cpo'](target_cost=0.0, target_kl=0.02)
    trainer = Trainer(env, algo, seed=0, epochs=3)
    trainer.run_epoch(0)
    t0 = time.perf_counter()
    trainer.run_epoch(1)
    t_ep = time.perf_counter() - t0
    print(f"full epoch         : {t_ep:8.3f} s   "
          f"({env_num*200/t_ep/1e3:7.1f}k env-steps/s)")
    print(f"  rollout steps ≈ 200*(env+pol) = {200*(t_env+t_pol):6.3f} s")


if __name__ == "__main__":
    main()
