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
                'disc_iters': 2, 'disc_batch': 16,
                'amp_replay_size': 256, 'amp_replay_store': 32}
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


class _ScriptedPool(tuple):
    pass


def _make_scripted_env():
    """A minimal env with the Trainer surface whose done pattern is fully
    scripted: env i's episode ends when its step counter reaches state
    'thr'[i]. In one-episode mode nothing resets, so done RE-FIRES on
    every later step — exactly the bb9d566 bug pattern (post-done
    re-fires were being counted as extra zero-length episodes)."""
    import jax.numpy as jnp
    from typing import NamedTuple

    class Pool(NamedTuple):
        n_valid: jnp.ndarray

    class Box:
        shape = (2,)

    class ScriptedEnv:
        env_num = 4
        num_steps = 16
        obs_flat_size = 3
        action_space = Box()
        uses_layout_pool = False

        def make_layout_pool(self, key):
            return Pool(n_valid=jnp.int32(8))

        def reset_single(self, key, pool):
            state = {'t': jnp.int32(0), 'thr': jnp.int32(10_000)}
            return jnp.zeros(3, jnp.float32), state

        def step_single(self, state, action):
            t2 = state['t'] + 1
            done = (t2 >= state['thr']).astype(jnp.float32)
            rew = jnp.float32(1.0)
            cost = jnp.float32(0.25)
            obs = jnp.zeros(3, jnp.float32)
            return obs, rew, done, {'cost': cost}, dict(state, t=t2)

        def reset_done_single(self, state, done, flat_obs, pool):
            t = jnp.where(done > 0, jnp.int32(0), state['t'])
            return flat_obs, dict(state, t=t)

    return ScriptedEnv()


def _scripted_trainer(one_episode):
    import jax.numpy as jnp

    env = _make_scripted_env()
    algo = REGISTRY['trpo'](train_v_iters=1, train_vc_iters=1,
                            backtrack_iters=2)
    algo.one_episode = one_episode
    tr = Trainer(env, algo, seed=0, epochs=1)
    # script the per-env done thresholds: done first fires at step 2/5/16;
    # env 3 never finishes (runs the full 16-step epoch)
    st = tr.state
    es = dict(st.env_state, thr=jnp.array([2, 5, 16, 100], jnp.int32))
    tr.state = st.replace(env_state=es)
    return tr


def test_one_episode_accounting_exact():
    """Numeric regression for the bb9d566 one-episode accounting bug:
    post-done re-fires must NOT count as episodes. With thresholds
    [2, 5, 16, never] over a 16-step epoch each env is exactly one
    episode: EpRet = mean(2,5,16,16) = 9.75, EpLen likewise, EpCost =
    0.25*EpLen, Episodes = 4."""
    m = _scripted_trainer(one_episode=True).run_epoch(0)
    assert float(m['Episodes']) == 4.0
    np.testing.assert_allclose(float(m['EpRet']), 9.75, rtol=1e-6)
    np.testing.assert_allclose(float(m['EpLen']), 9.75, rtol=1e-6)
    np.testing.assert_allclose(float(m['EpCost']), 0.25 * 9.75, rtol=1e-6)


def test_continuous_reset_accounting_exact():
    """Same scripted pattern with mid-epoch auto-reset: env 0 completes
    8 length-2 episodes, env 1 three length-5 ones (its trailing 1-step
    fragment doesn't count), envs 2/3 one length-16 each →
    13 episodes, EpRet = (8*2 + 3*5 + 16 + 16)/13."""
    m = _scripted_trainer(one_episode=False).run_epoch(0)
    assert float(m['Episodes']) == 13.0
    np.testing.assert_allclose(float(m['EpRet']), 63.0 / 13.0, rtol=1e-6)
    np.testing.assert_allclose(float(m['EpLen']), 63.0 / 13.0, rtol=1e-6)
    np.testing.assert_allclose(float(m['EpCost']), 0.25 * 63.0 / 13.0,
                               rtol=1e-6)


def test_obs_norm_runner():
    """Trainer obs_norm: running obs statistics converge toward the batch
    statistics, metrics stay finite, and the default-off path is
    untouched (rl_games normalize_input counterpart)."""
    import jax.numpy as jnp
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.envs import Engine

    cfg = {'env_num': 8, 'num_steps': 12, 'hazards_num': 8, '_seed': 0,
           'gx_layout_pool': 2048}
    tr = Trainer(Engine(cfg), REGISTRY['ppo'](target_cost=0.0,
                                              target_kl=0.02),
                 seed=0, epochs=2, obs_norm=True)
    m0 = tr.run_epoch(0)
    m1 = tr.run_epoch(1)  # runs with epoch-0 statistics active
    for k in ('EpRet', 'KL', 'LossPi'):
        assert np.isfinite(m1[k])
    rms = tr.state.obs_rms
    assert float(rms['count']) > 180  # 2 epochs x 8*12 samples merged
    assert bool(jnp.isfinite(rms['mu']).all())
    assert float(jnp.max(rms['var'])) > 1e-6
    # normalized inputs: re-normalizing the current obs gives O(1) scale
    n = tr._normalize_obs(rms, tr.state.obs)
    assert float(jnp.abs(n).max()) <= 10.0


def test_amp_obs_norm_features_stay_raw():
    """Under obs_norm, AMP discriminator features come from the RAW
    observation (matching raw demo transitions), while the policy input
    is normalized."""
    import jax.numpy as jnp
    import numpy as _np
    from guardx_tpu.algos.algorithms.amp import AMP
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.envs import Engine

    cfg = {'env_num': 4, 'num_steps': 8, 'hazards_num': 8, '_seed': 0,
           'gx_layout_pool': 2048}
    env = Engine(cfg)
    demos = _np.random.RandomState(0).randn(
        32, 2, env.obs_flat_size).astype('f4')
    algo = AMP(demos=demos, target_cost=0.0, target_kl=0.02,
               amp_replay_size=256, amp_replay_store=32)
    assert algo.wants_raw_obs
    tr = Trainer(env, algo, seed=0, epochs=1, obs_norm=True)
    m = tr.run_epoch(0)
    assert np.isfinite(m['LossDisc'])
    assert np.isfinite(m['StyleReward'])


def test_ppo_minibatched_update_learns_and_respects_kl():
    """rl_games-style minibatched PPO (minibatch_size>0): the policy
    improves on the clipped surrogate and the per-minibatch KL early stop
    engages like the full-batch path's."""
    from guardx_tpu.algos.algorithms.pg_family import PPO

    cfg = {'env_num': 16, 'num_steps': 24, 'task': 'goal',
           'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
           'constrain_hazards': True, 'constrain_indicator': False,
           '_seed': 0, 'gx_layout_pool': 2048}
    env = Engine(cfg)
    algo = PPO(target_kl=0.02, minibatch_size=64, mini_epochs=3,
               train_v_iters=2, train_vc_iters=2)
    tr = Trainer(env, algo, seed=0, epochs=2)
    assert 'pi_rng' in tr.state.algo.extra
    m = tr.run_epoch(0)
    assert np.isfinite(m['KL']) and np.isfinite(m['LossPi'])
    # minibatched path takes at most mini_epochs * (N // mbs) steps
    assert 0 < m['StopIter'] <= 3 * (16 * 24 // 64)
    m2 = tr.run_epoch(1)
    assert np.isfinite(m2['DeltaLossPi'])


def test_ppo_minibatched_rlgames_schedules():
    """'constant' takes every minibatch step (no early stop); 'adaptive'
    additionally moves the persistent lr by 1.5x around kl_threshold
    (rl_games schedulers.py semantics)."""
    from guardx_tpu.algos.algorithms.pg_family import PPO

    cfg = {'env_num': 16, 'num_steps': 24, 'task': 'goal',
           'goal_size': 0.5, 'hazards_num': 8, 'hazards_size': 0.3,
           'constrain_hazards': True, 'constrain_indicator': False,
           '_seed': 0, 'gx_layout_pool': 2048}
    total = 3 * (16 * 24 // 64)
    env = Engine(cfg)
    algo = PPO(target_kl=1e-9, minibatch_size=64, mini_epochs=3,
               lr_schedule='constant', train_v_iters=2, train_vc_iters=2)
    tr = Trainer(env, algo, seed=0, epochs=1)
    m = tr.run_epoch(0)
    # an impossible target_kl would stop the 'fixed' path at iter 1;
    # 'constant' must take every step
    assert m['StopIter'] == total

    env = Engine(cfg)
    algo = PPO(target_kl=1e-9, minibatch_size=64, mini_epochs=3,
               lr_schedule='adaptive', kl_threshold=1e-7, pi_lr=3e-4,
               train_v_iters=2, train_vc_iters=2)
    tr = Trainer(env, algo, seed=0, epochs=1)
    m = tr.run_epoch(0)
    assert m['StopIter'] == total
    # kl >> 2*threshold on every step: lr must have decayed from pi_lr
    assert 'LrNow' in m and m['LrNow'] < 3e-4
    assert float(tr.state.algo.extra['pi_lr_now']) == pytest.approx(
        float(m['LrNow']))
