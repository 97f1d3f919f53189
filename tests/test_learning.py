"""Learning regression: CPO must actually improve return on Goal_Point.

The full milestone evidence (env_num=4000, 200 epochs on TPU: EpRet
0.13 -> 1.82, EpCost 0.86 -> 0.05) lives in logs/ + LEARNING.md; this is
the cheap CI version of it — 30 epochs at 64 envs on the CPU backend shows
an unambiguous return rise (calibrated: first-10 mean ~0.33, last-10 mean
~0.69). A broken update rule, GAE, or advantage normalization fails the
margin immediately.

(The reference has no such test; its de-facto check is eyeballing
plot.py curves — SURVEY.md §4.)
"""

import pytest

from guardx_tpu.algos.algorithms import REGISTRY
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.envs import Engine


@pytest.mark.slow
def test_cpo_learns_goal_point():
    env = Engine({'env_num': 64, 'num_steps': 100, 'hazards_num': 8,
                  '_seed': 0, 'gx_layout_pool': 8192})
    tr = Trainer(env, REGISTRY['cpo'](target_cost=0.0, target_kl=0.02),
                 seed=0, epochs=30)
    rets = [tr.run_epoch(ep)['EpRet'] for ep in range(30)]
    first, last = sum(rets[:10]) / 10, sum(rets[-10:]) / 10
    assert last > first + 0.2, (
        f"no learning: first-10 mean EpRet {first:.3f}, "
        f"last-10 mean {last:.3f}"
    )
