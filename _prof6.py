import time, jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY

env_num = 8192
env = Engine({'env_num': env_num, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
trn = Trainer(env, REGISTRY['cpo'](target_cost=0.0, target_kl=0.02), seed=0, epochs=6)
import numpy as np
trn.run_epoch(0)
ts = []
for e in range(1, 6):
    t0 = time.perf_counter(); trn.run_epoch(e); ts.append(time.perf_counter()-t0)
print("epoch times:", [round(t,3) for t in ts])
