"""Continuous (fragmented) rollout mode: env state persists across
epochs, fragment ends are value-bootstrapped, episodes are logged only at
real dones (rl_games horizon_length semantics — runner.py continuous).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY


def _env(B=64, limit=48):
    return Engine({
        'env_num': B, 'num_steps': limit, 'task': 'goal',
        'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
        'constrain_hazards': True, 'constrain_indicator': False,
        '_seed': 0, 'gx_layout_pool': 4096, 'gx_pool_refresh_every': 4,
    })


def test_continuous_episodes_cross_fragments():
    """With rollout_T=12 against a 48-step time limit, episodes span
    multiple fragments: env state persists (step counters nonzero after
    an epoch) and logged EpLen exceeds the fragment length."""
    env = _env()
    tr = Trainer(env, REGISTRY['ppo'](target_cost=0.0, target_kl=0.02),
                 seed=0, epochs=8, continuous=True, rollout_T=12)
    assert tr.T == 12
    lens = []
    for e in range(6):
        m = tr.run_epoch(e)
        lens.append(m['EpLen'])
        assert np.isfinite(m['EpRet'])
    # after epoch 1 the env was NOT reset: some envs mid-episode
    steps = np.asarray(tr.state.env_state.steps)
    assert (steps > 0).any(), "continuous mode must not reset at epoch end"
    # episodes (time-limited at 48) are far longer than the fragment
    assert max(lens) > 12, f"EpLen should exceed the fragment length: {lens}"


def test_continuous_vs_default_same_api():
    """Default mode still resets every epoch (reference semantics)."""
    env = _env()
    tr = Trainer(env, REGISTRY['ppo'](target_cost=0.0, target_kl=0.02),
                 seed=0, epochs=2)
    m = tr.run_epoch(0)
    assert np.isfinite(m['EpRet'])
    steps = np.asarray(tr.state.env_state.steps)
    assert (steps == 0).all(), "default mode resets all envs at epoch end"


def test_continuous_guards():
    env = _env()
    with pytest.raises(ValueError):
        Trainer(env, REGISTRY['scpo'](target_cost=0.0, target_kl=0.02),
                seed=0, continuous=True, rollout_T=8)


def test_timeout_flag_and_value_bootstrap():
    """A max_ep_len cut inside a fragment is a truncation: the bench envs
    report info['timeout'] distinctly from natural dones, and continuous
    mode folds gamma*V(s_t) into the truncated step's reward (rl_games
    a2c_common.py value_bootstrap)."""
    import jax
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine

    env = NativeBenchEngine("Cartpole", env_num=8, num_steps=5, seed=0)
    tr = Trainer(env, REGISTRY['ppo'](target_kl=0.02), seed=0,
                 continuous=True, rollout_T=16)
    # run the rollout alone and inspect the stored batch
    rs, batch, acc = tr._rollout(tr.state, jnp.float32(0.0))
    to = np.asarray(batch['timeout'])
    done = np.asarray(batch['done'])
    assert to.shape == done.shape
    assert to.sum() > 0, "5-step limit inside a 16-step fragment must truncate"
    assert np.all(done[to > 0] == 1.0), "every timeout is also a done"
    # the GAE rewards at truncated steps carry the gamma*V bootstrap
    data, aux = tr._build_data(batch, acc, None)
    gamma = tr.algo.hp['gamma']
    rew_boot = np.asarray(batch['rew']) + gamma * np.asarray(batch['val']) * to
    T, B = done.shape
    ret = np.asarray(data['ret']).reshape(T, B)
    # at a truncated step the return equals the bootstrapped reward exactly
    # (done cuts the tail)
    idx = np.argwhere(to > 0)
    t0, b0 = idx[0]
    assert np.allclose(ret[t0, b0], rew_boot[t0, b0], rtol=1e-5, atol=1e-5)
