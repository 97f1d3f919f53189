import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
env = Engine({'env_num': 8192, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
print("pool_size:", env._pool_size, "n_obj:", len(env._sample_order), "tries:", env.N_PLACE_TRIES)

def timeit(fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

n = len(env._sample_order)
draw = jax.jit(lambda k: jax.random.uniform(k, (env._pool_size, n, env.N_PLACE_TRIES, 2)).sum())
t_draw, _ = timeit(draw, jax.random.PRNGKey(0))
print(f"uniform draw (sum-reduced): {t_draw*1e3:7.1f} ms")

pool_f = jax.jit(env.make_layout_pool)
t_pool, pool = timeit(pool_f, jax.random.PRNGKey(1))
print(f"full pool    : {t_pool*1e3:7.1f} ms   n_valid={int(pool.n_valid)} (K={env._pool_compact_size()})")
