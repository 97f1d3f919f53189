"""Mesh-sharded training must match single-device training.

A Trainer over the 8-virtual-device CPU mesh vs mesh=None at the same seed.
(TPU-native replacement for the reference's untested mpi4py data-parallel
layer — safe_rl_libX/guard_utils/mpi_pytorch.py:20-35.)

Tolerances by metric class:
- epoch-0 rollout metrics (EpRet/EpCost/...): identical params + identical
  RNG => identical trajectories; only the final float32 reductions differ in
  order. Tight tolerance. A sharding bug (stats over 1/8 of the batch,
  missed psum) shows up here at 8x magnitude.
- update metrics (KL/Loss*/Delta*): conjugate gradient + backtracking line
  search amplify reduction-order noise; loose relative tolerance.
- epoch-1 rollout metrics: the physics is chaotic, so the slightly different
  accepted step diverges trajectories; sanity band only.
"""

import numpy as np
import pytest

from guardx_tpu.algos.algorithms import REGISTRY
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.envs import Engine
from guardx_tpu.parallel import make_mesh

CFG = {'env_num': 16, 'num_steps': 16, 'hazards_num': 8, '_seed': 0,
       'gx_layout_pool': 4096}

ROLLOUT_KEYS = ('EpRet', 'EpCost', 'EpCostRet', 'EpLen', 'CumulativeCost',
                'CostRate', 'VVals', 'Episodes', 'TotalEnvInteracts',
                'MaxEpLenRet')
TIMING_KEYS = ('TEpoch', 'StepsPerSec', 'Time', 'LayoutPoolValid')


def _metrics(mesh, algo_name, epochs=2):
    algo = REGISTRY[algo_name](
        target_cost=0.0, target_kl=0.02,
        train_v_iters=5, train_vc_iters=5, backtrack_iters=10,
    )
    tr = Trainer(Engine(CFG), algo, seed=0, epochs=epochs, mesh=mesh)
    return [tr.run_epoch(ep) for ep in range(epochs)]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["trpo", "cpo"])
def test_mesh_matches_single_device(name):
    single = _metrics(None, name)
    sharded = _metrics(make_mesh(8), name)
    assert set(single[0]) == set(sharded[0])

    m1, m2 = single[0], sharded[0]
    for k in m1:
        if k in TIMING_KEYS:
            continue
        if k in ROLLOUT_KEYS:
            np.testing.assert_allclose(
                m1[k], m2[k], rtol=1e-4, atol=1e-5,
                err_msg=f"epoch 0 rollout metric {k}",
            )
        else:
            np.testing.assert_allclose(
                m1[k], m2[k], rtol=0.15, atol=5e-3,
                err_msg=f"epoch 0 update metric {k}",
            )

    # epoch 1: chaotic divergence allowed, gross disagreement is a bug
    m1, m2 = single[1], sharded[1]
    for k in ROLLOUT_KEYS:
        np.testing.assert_allclose(
            m1[k], m2[k], rtol=0.3, atol=0.1,
            err_msg=f"epoch 1 rollout metric {k}",
        )
