import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY

env_num = 8192
env = Engine({'env_num': env_num, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
algo = REGISTRY['cpo'](target_cost=0.0, target_kl=0.02)
tr = Trainer(env, algo, seed=0, epochs=3)

def timeit(fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

frac = jnp.float32(0.0)
roll = jax.jit(lambda rs: tr._rollout(rs, frac))
t_roll, (rs2, batch, acc) = timeit(roll, tr.state)
print(f"rollout scan      : {t_roll:7.3f} s ({env_num*200/t_roll/1e3:7.0f}k steps/s)")

bd = jax.jit(tr._build_data)
t_bd, (data, aux) = timeit(bd, batch, acc)
print(f"build_data (GAE)  : {t_bd:7.3f} s")

opts = {'v': tr.v_optim, 'vc': tr.vc_optim}
upd = jax.jit(lambda ast, data, aux: tr.algo.update(tr.nets, ast, data, aux, opts))
t_upd, _ = timeit(upd, tr.state.algo, data, aux)
print(f"algo update (CPO) : {t_upd:7.3f} s")

rst = jax.jit(lambda rng: jax.vmap(env.reset_single, in_axes=(0, None))(
    jax.random.split(rng, env_num), tr.state.pool))
t_rst, _ = timeit(rst, jax.random.PRNGKey(0))
pool = jax.jit(env.make_layout_pool)
t_pool, _ = timeit(pool, jax.random.PRNGKey(1))
print(f"epoch-end reset   : {t_rst:7.3f} s   pool: {t_pool:7.3f} s")
