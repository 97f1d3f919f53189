import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY
from guardx_tpu.algos import core

env_num = 8192
env = Engine({'env_num': env_num, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
trn = Trainer(env, REGISTRY['cpo'](target_cost=0.0, target_kl=0.02), seed=0, epochs=3)

def timeit(fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

rs = trn.state

# (a) env-only scan: 200 steps of vmapped step_single with fixed zero action
az = jnp.zeros((env_num, env.action_space.shape[0]))
def env_scan(env_state):
    def f(es, _):
        obs, rew, done, info, es = jax.vmap(env.step_single)(es, az)
        return es, rew.sum()
    es, out = jax.lax.scan(f, env_state, (), length=200)
    return out.sum()
t_env, _ = timeit(jax.jit(env_scan), rs.env_state)
print(f"env-only scan (200) : {t_env:6.3f} s")

# (b) env + policy
def envpol_scan(env_state, pi, rng):
    def f(carry, _):
        es, rng = carry
        rng, k = jax.random.split(rng)
        obs, rew, done, info, es2 = jax.vmap(env.step_single)(es, az)
        mu, log_std = trn.nets.pi_apply(pi, obs)
        a = core.gaussian_sample(k, mu, log_std)
        return (es2, rng), a.sum()
    (es, _), out = jax.lax.scan(f, (env_state, rng), (), length=200)
    return out.sum()
t_ep, _ = timeit(jax.jit(envpol_scan), rs.env_state, rs.algo.pi, jax.random.PRNGKey(0))
print(f"env+policy scan     : {t_ep:6.3f} s")

# (c) full rollout
frac = jnp.float32(0.0)
roll = jax.jit(trn._rollout)
t_roll, _ = timeit(roll, rs, frac)
print(f"full rollout        : {t_roll:6.3f} s")

# (d) physics-only scan
def phys_scan(data):
    from guardx_tpu import physics
    def f(d, _):
        d = jax.vmap(lambda dd: physics.step(env.model, dd))(d)
        return d, ()
    d, _ = jax.lax.scan(f, data, (), length=200)
    return d.qpos.sum()
t_phys, _ = timeit(jax.jit(phys_scan), rs.env_state.data)
print(f"physics-only scan   : {t_phys:6.3f} s")
