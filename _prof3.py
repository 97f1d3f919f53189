import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos import base as B
from guardx_tpu.algos.algorithms import REGISTRY

env_num = 8192
env = Engine({'env_num': env_num, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
algo = REGISTRY['cpo'](target_cost=0.0, target_kl=0.02)
trn = Trainer(env, algo, seed=0, epochs=3)

def timeit(fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

frac = jnp.float32(0.0)
roll = jax.jit(trn._rollout)
_, (rs2, batch, acc) = timeit(roll, trn.state, frac, n=1)
data, aux = jax.jit(trn._build_data)(batch, acc)
s = trn.state.algo
opts = {'v': trn.v_optim, 'vc': trn.vc_optim}

fitv = jax.jit(lambda s, d: algo.fit_critics(trn.nets, s, d, opts['v'], opts['vc']))
t_fit, _ = timeit(fitv, s, data)
print(f"critic fits (2x80): {t_fit:7.3f} s")

g_fn = jax.jit(lambda p, d: jax.grad(B.make_pi_closures(trn.nets, d)[0])(p))
t_g, g = timeit(g_fn, s.pi, data)
print(f"grad loss_pi      : {t_g*1e3:7.1f} ms")

full_upd = jax.jit(lambda s, d, a: algo.update(trn.nets, s, d, a, opts))
t_upd, _ = timeit(full_upd, s, data, aux)
print(f"full update       : {t_upd:7.3f} s   (non-critic part: {t_upd - t_fit:7.3f} s)")
