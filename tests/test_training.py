"""End-to-end training smoke tests: every algorithm runs 2 jitted epochs on
a tiny Goal_Point env and produces finite metrics (SURVEY.md §4: the
reference has no tests; learning-curve level checks live in the bench)."""

import numpy as np
import pytest

import jax

from guardx_tpu.envs import Engine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY


@pytest.fixture(scope="module")
def env():
    return Engine({
        'env_num': 4, 'num_steps': 16, 'hazards_num': 8, '_seed': 0,
        'gx_layout_pool': 4096,
    })


ALL_ALGOS = sorted(REGISTRY.keys())
# representative fast subset — one per family (PG, TR, constrained-TR,
# statewise, Qc, one-episode, safe-set, adversarial); the full 22-algo
# matrix runs under -m nightly
FAST_ALGOS = ['ppo', 'trpo', 'cpo', 'scpo', 'usl', 'espo', 'issa', 'amp']


def _algo_extra_kwargs(name, env):
    """Required constructor inputs for the rl_games-suite algorithms."""
    if name == 'amp':
        rs = np.random.RandomState(0)
        return {'demos': rs.randn(32, 2, env.obs_flat_size).astype(np.float32),
                'disc_iters': 2, 'disc_batch': 16}
    if name == 'hrl':
        import jax.numpy as jnp

        act_dim = env.action_space.shape[0]
        rs = np.random.RandomState(0)
        W_o = jnp.asarray(rs.randn(env.obs_flat_size, act_dim) * 0.1,
                          jnp.float32)
        W_z = jnp.asarray(rs.randn(4, act_dim) * 0.3, jnp.float32)
        return {'llc_apply': lambda p, o, z: jnp.tanh(o @ p[0] + z @ p[1]),
                'llc_params': (W_o, W_z), 'latent_dim': 4}
    return {}


@pytest.mark.parametrize(
    "name",
    [pytest.param(a, marks=[] if a in FAST_ALGOS else [pytest.mark.nightly])
     for a in ALL_ALGOS],
)
def test_algorithm_trains(env, name):
    algo = REGISTRY[name](target_cost=0.0, target_kl=0.02,
                          train_v_iters=5, train_vc_iters=5,
                          backtrack_iters=10, **_algo_extra_kwargs(name, env))
    if 'train_pi_iters' in algo.hp:
        algo.hp['train_pi_iters'] = 5
    if 'train_ccritic_iters' in algo.hp:
        algo.hp['train_ccritic_iters'] = 5
    tr = Trainer(env, algo, seed=0, epochs=2)
    for ep in range(2):
        m = tr.run_epoch(ep)
        for k, v in m.items():
            assert np.isfinite(v), f"{name}: metric {k} = {v}"
    assert m['EpLen'] > 0
    assert 'KL' in m and 'LossPi' in m


def test_ppo_improves_value_loss(env):
    """The value critic should fit better over a few epochs."""
    tr = Trainer(env, REGISTRY['ppo'](train_v_iters=20), seed=0, epochs=5)
    losses = [tr.run_epoch(ep)['LossV'] for ep in range(5)]
    assert losses[-1] < losses[0] * 2  # not diverging


def test_deterministic_given_seed():
    cfg = {'env_num': 4, 'num_steps': 8, 'hazards_num': 8, '_seed': 3,
           'gx_layout_pool': 4096}
    m1 = Trainer(Engine(cfg), REGISTRY['trpo'](), seed=1, epochs=1).run_epoch(0)
    m2 = Trainer(Engine(cfg), REGISTRY['trpo'](), seed=1, epochs=1).run_epoch(0)
    for k in ('EpRet', 'EpCost', 'LossPi', 'KL'):
        assert m1[k] == m2[k], f"{k}: {m1[k]} != {m2[k]}"


@pytest.mark.parametrize("name", ["trpo", "cpo", "ppo"])
def test_one_episode_mode(env, name):
    """The reference forks *_one_episode dirs; here it's a flag: rewards
    after the first done are masked out of the update (SURVEY.md §3.4)."""
    algo = REGISTRY[name](target_cost=0.0, target_kl=0.02,
                          train_v_iters=3, train_vc_iters=3,
                          backtrack_iters=5)
    algo.one_episode = True
    if 'train_pi_iters' in algo.hp:
        algo.hp['train_pi_iters'] = 3
    tr = Trainer(env, algo, seed=0, epochs=1)
    m = tr.run_epoch(0)
    for k, v in m.items():
        assert np.isfinite(v), f"{name} one-episode: {k} = {v}"
