import jax, jax.numpy as jnp
from guardx_tpu.envs import Engine
from guardx_tpu import physics

env = Engine({'env_num': 8192, 'num_steps': 200, 'task': 'goal',
              'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
              'constrain_hazards': True, 'constrain_indicator': False, '_seed': 0})
data = jax.vmap(lambda i: physics.make_data(env.model))(jnp.arange(8192))
f = jax.jit(jax.vmap(lambda dd: physics.step(env.model, dd)))
comp = f.lower(data).compile()
hlo = comp.as_text()
import re
fus = hlo.count(' fusion(')
print("fusions:", fus)
# count top-level instructions in entry computation
ops = {}
for line in hlo.splitlines():
    m = re.match(r'\s+\S+ = \S+ (\w+)\(', line)
    if m:
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
print(sorted(ops.items(), key=lambda kv: -kv[1])[:15])
print("total instr:", sum(ops.values()))
