"""Recurrent (LSTM) policy tests.

The reference's flagship workloads are rl_games LSTM policies
(AllegroKukaTwoArmsLSTM / ShadowHandOpenAI_LSTM — reference train.py:7-14,
safe_rl_libX/guard_utils/safe_rl_env_config.py:2455-2566). The TPU-native
design replays the whole (T, B) sequence at update time from the
epoch-start zero carry with done-masked resets (guardx_tpu.algos.base.
RecurrentNetworks) — these tests pin that the replay reproduces rollout
distributions exactly and that the hidden state resets at episode ends.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guardx_tpu.algos import core
from guardx_tpu.algos.base import RecurrentNetworks


@pytest.fixture(scope="module")
def nets():
    return RecurrentNetworks(obs_dim=5, act_dim=2, hidden_sizes=(8,),
                             lstm_size=8)


@pytest.fixture(scope="module")
def params(nets):
    return nets.init(jax.random.PRNGKey(0))[0]


def _rollout_pattern(T=9, B=4, seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    obs = jax.random.normal(k1, (T, B, 5))
    done = jax.random.bernoulli(k2, 0.3, (T, B)).astype(jnp.float32)
    done_prev = jnp.concatenate([jnp.zeros((1, B)), done[:-1]], axis=0)
    return obs, done, done_prev


def test_seq_replay_matches_stepwise_rollout(nets, params):
    """pi_seq from zero carry with done_prev masking must reproduce the
    stepwise rollout's (mu, log_std) — this is what makes trust-region
    closures valid for recurrent policies. (Tolerance 1e-6: XLA fuses the
    scan differently from the unrolled stepwise path, so the match is
    numerically exact only up to op reassociation.)"""
    obs, done, done_prev = _rollout_pattern()
    T, B = done.shape

    # stepwise, exactly as the runner does it (mask AFTER the step)
    h = core.zero_carry((B,), nets.lstm_size)
    mus, lss = [], []
    for t in range(T):
        (mu, ls), h = nets.pi_apply(params, obs[t], h)
        mus.append(mu)
        lss.append(ls)
        h = core.mask_carry(h, done[t])
    mu_roll = jnp.stack(mus)

    mu_seq, ls_seq = nets.pi_seq(params, obs, done_prev)
    np.testing.assert_allclose(np.asarray(mu_seq), np.asarray(mu_roll),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ls_seq), np.asarray(jnp.stack(lss)),
                               atol=1e-6)


def test_hidden_resets_at_done(nets, params):
    """After a done, the policy's output must equal a fresh-memory output
    (and differ from the carry-through output when history differed)."""
    obs, _, _ = _rollout_pattern(T=6, B=2, seed=3)
    T, B = 6, 2

    # env 0 done at t=2, env 1 never done
    done = jnp.zeros((T, B)).at[2, 0].set(1.0)
    done_prev = jnp.concatenate([jnp.zeros((1, B)), done[:-1]], axis=0)
    mu_seq, _ = nets.pi_seq(params, obs, done_prev)

    # fresh memory from t=3 for env 0: replaying only obs[3:] from zeros
    mu_fresh, _ = nets.pi_seq(params, obs[3:], jnp.zeros((T - 3, B)))
    np.testing.assert_allclose(np.asarray(mu_seq[3, 0]),
                               np.asarray(mu_fresh[0, 0]), atol=1e-6)

    # without the reset, history makes t=3 differ
    mu_nodone, _ = nets.pi_seq(params, obs, jnp.zeros((T, B)))
    assert not np.allclose(np.asarray(mu_nodone[3, 0]),
                           np.asarray(mu_fresh[0, 0]), atol=1e-6)
    # env 1 (no done) is unaffected by env 0's reset
    np.testing.assert_allclose(np.asarray(mu_seq[:, 1]),
                               np.asarray(mu_nodone[:, 1]), atol=1e-6)


def test_memory_actually_flows(nets, params):
    """The LSTM must use its memory: identical obs at t with different
    histories must map to different outputs."""
    T, B = 4, 1
    k = jax.random.PRNGKey(5)
    last = jax.random.normal(k, (1, B, 5))
    hist_a = jnp.concatenate([jnp.ones((T - 1, B, 5)), last], axis=0)
    hist_b = jnp.concatenate([-jnp.ones((T - 1, B, 5)), last], axis=0)
    zeros = jnp.zeros((T, B))
    mu_a, _ = nets.pi_seq(params, hist_a, zeros)
    mu_b, _ = nets.pi_seq(params, hist_b, zeros)
    assert not np.allclose(np.asarray(mu_a[-1]), np.asarray(mu_b[-1]),
                           atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("algo_name", ["ppo", "cpo"])
def test_recurrent_trainer_epoch(algo_name):
    """A recurrent Trainer runs PPO and CPO epochs end-to-end with finite
    metrics and param movement (exercises rollout carry threading, seq
    closures, env-subsampled FVPs, and recurrent critic fits)."""
    from guardx_tpu.envs import Engine
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    env = Engine({'env_num': 8, 'num_steps': 16, 'task': 'goal',
                  'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
                  'constrain_hazards': True, 'constrain_indicator': False,
                  '_seed': 0, 'gx_layout_pool': 2048})
    tr = Trainer(env, REGISTRY[algo_name](target_cost=0.0, target_kl=0.02),
                 seed=0, recurrent=True, hidden_sizes=(32,), lstm_size=16)
    p0 = jax.tree_util.tree_leaves(tr.state.algo.pi)[0].copy()
    m = tr.run_epoch(0)
    m = tr.run_epoch(1)
    for k, v in m.items():
        assert np.isfinite(v), f"{algo_name} metric {k} not finite: {v}"
    p1 = jax.tree_util.tree_leaves(tr.state.algo.pi)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_recurrent_checkpoint_roundtrip(tmp_path):
    """Orbax checkpoint/resume round-trips the recurrent RunnerState
    (LSTM params + opt states) exactly."""
    from guardx_tpu.envs import Engine
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.utils import checkpoint as ckpt

    env = Engine({'env_num': 4, 'num_steps': 8, 'task': 'goal',
                  'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
                  'constrain_hazards': True, 'constrain_indicator': False,
                  '_seed': 0, 'gx_layout_pool': 2048})
    tr = Trainer(env, REGISTRY['ppo'](), seed=0, recurrent=True,
                 hidden_sizes=(16,), lstm_size=8)
    tr.run_epoch(0)
    ckpt.save_checkpoint(str(tmp_path), tr.state, 1, tr.T * tr.B)

    tr2 = Trainer(env, REGISTRY['ppo'](), seed=1, recurrent=True,
                  hidden_sizes=(16,), lstm_size=8)
    restored, epoch, steps = ckpt.restore_checkpoint(str(tmp_path), tr2.state)
    assert epoch == 1 and steps == tr.T * tr.B
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.algo.pi),
                    jax.tree_util.tree_leaves(restored.algo.pi)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
