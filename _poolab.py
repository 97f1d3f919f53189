import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY

env_num = 16384
env = Engine({'env_num': env_num, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
def run(reuse_pool):
    if reuse_pool:
        env.make_layout_pool_orig = env.make_layout_pool
    tr = Trainer(env, REGISTRY['cpo'](target_cost=0.0, target_kl=0.02), seed=0, epochs=5)
    if reuse_pool:
        pool0 = tr.state.pool
        orig_epoch = tr._epoch
        import guardx_tpu.algos.runner as R
        # monkeypatch: freeze the pool by replacing make_layout_pool
        env.make_layout_pool = lambda k: pool0
        tr._epoch_jit = jax.jit(tr._epoch, donate_argnums=(0,))
    tr.run_epoch(0)
    t0 = time.perf_counter()
    for e in range(1, 5):
        tr.run_epoch(e)
    dt = (time.perf_counter() - t0) / 4
    if reuse_pool:
        env.make_layout_pool = env.make_layout_pool_orig
    return dt

d_fresh = run(False)
d_reuse = run(True)
print(f"epoch fresh-pool: {d_fresh:.3f}s  frozen-pool: {d_reuse:.3f}s  pool cost: {d_fresh-d_reuse:.3f}s")
