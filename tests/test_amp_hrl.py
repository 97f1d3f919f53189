"""AMP + HRL — the rl_games learning-suite counterparts
(reference: IsaacGymEnvs/isaacgymenvs/learning/{amp_continuous,
hrl_continuous}.py; SURVEY.md §2.5 'rl_games AMP/HRL')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guardx_tpu.envs.bench_tasks import NativeBenchEngine
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.algos.algorithms import REGISTRY
from guardx_tpu.algos.algorithms.amp import AMP, HRL, record_demo_transitions


def _make_env(n=4, steps=8, seed=0):
    return NativeBenchEngine("Cartpole", env_num=n, num_steps=steps, seed=seed)


def _demos(env, n_steps=6):
    rng = np.random.RandomState(0)

    def policy(obs):
        return 0.3 * rng.uniform(-1, 1, (obs.shape[0], 1)).astype(np.float32)

    return record_demo_transitions(env, policy, n_steps)


def test_amp_requires_demos():
    with pytest.raises(ValueError):
        AMP()


def test_amp_epoch_trains_policy_and_discriminator():
    env = _make_env()
    demos = _demos(_make_env(seed=7))
    assert demos.ndim == 3 and demos.shape[1] == 2

    algo = AMP(demos=demos, disc_iters=2, disc_batch=64,
               amp_replay_size=256, amp_replay_store=32)
    tr = Trainer(env, algo, seed=0, epochs=2)
    m1 = tr.run_epoch(0)
    assert np.isfinite(m1["EpRet"])
    assert "LossDisc" in m1 and np.isfinite(m1["LossDisc"])
    assert "StyleReward" in m1 and 0.0 <= m1["StyleReward"] <= 1.0
    # discriminator actually moves
    m2 = tr.run_epoch(1)
    assert m2["LossDisc"] != m1["LossDisc"]


@pytest.mark.slow
def test_amp_style_reward_prefers_demo_like_transitions():
    """After training, D scores demo pairs above random-policy pairs."""
    env = _make_env(n=8, steps=12)
    demos = _demos(_make_env(n=8, steps=12, seed=7), n_steps=10)
    algo = AMP(demos=demos, disc_iters=16, disc_batch=128,
               amp_replay_size=256, amp_replay_store=32)
    tr = Trainer(env, algo, seed=0, epochs=4)
    for e in range(4):
        tr.run_epoch(e)
    disc = tr.state.algo.extra["disc"]
    r_demo = float(jnp.mean(algo.style_reward(disc, algo.demos[:128])))
    # far-off-distribution pairs should score lower than demos
    fake = jnp.asarray(
        np.random.RandomState(3).uniform(-50, 50, (128,) + algo.demos.shape[1:]),
        jnp.float32,
    )
    r_fake = float(jnp.mean(algo.style_reward(disc, fake)))
    assert r_demo > r_fake, (r_demo, r_fake)


def test_hrl_latent_steering():
    env = _make_env()
    latent_dim = 4
    act_dim = env.action_space.shape[0]

    # conditional LLC: a fixed random linear map (obs, z) -> action
    rs = np.random.RandomState(0)
    W_o = jnp.asarray(rs.randn(env.obs_flat_size, act_dim) * 0.1, jnp.float32)
    W_z = jnp.asarray(rs.randn(latent_dim, act_dim) * 0.3, jnp.float32)

    def llc_apply(params, obs, z):
        return jnp.tanh(obs @ params[0] + z @ params[1])

    algo = HRL(llc_apply=llc_apply, llc_params=(W_o, W_z),
               latent_dim=latent_dim)
    tr = Trainer(env, algo, seed=0, epochs=1)
    # the high-level policy acts in latent space
    assert tr.nets.act_dim == latent_dim
    m = tr.run_epoch(0)
    assert np.isfinite(m["EpRet"])


def test_registry_has_amp_hrl():
    assert "amp" in REGISTRY and "hrl" in REGISTRY


def test_amp_replay_buffer_fills_and_feeds_disc():
    """The disc replay ring (amp_continuous.py:185-191,513-521) stores raw
    policy pairs each update and feeds the agent side of the loss."""
    env = _make_env()
    demos = _demos(_make_env(seed=7))
    algo = AMP(demos=demos, disc_iters=2, disc_batch=32,
               amp_replay_size=128, amp_replay_store=16)
    tr = Trainer(env, algo, seed=0, epochs=3)
    m = tr.run_epoch(0)
    ex = tr.state.algo.extra
    assert int(ex["amp_replay_count"]) == 16
    assert "DiscReplayLogit" in m and np.isfinite(m["DiscReplayLogit"])
    for e in range(1, 3):
        tr.run_epoch(e)
    ex = tr.state.algo.extra
    assert int(ex["amp_replay_count"]) == 48
    buf = np.asarray(ex["amp_replay_buf"])
    # stored rows are raw pairs (nonzero), unfilled tail still zero
    assert np.abs(buf[:48]).sum() > 0.0
    assert np.abs(buf[64:]).sum() == 0.0


def test_amp_replay_disabled_matches_legacy_state():
    env = _make_env()
    demos = _demos(_make_env(seed=7))
    algo = AMP(demos=demos, disc_iters=2, disc_batch=32, amp_replay=0)
    tr = Trainer(env, algo, seed=0, epochs=1)
    m = tr.run_epoch(0)
    assert "amp_replay_buf" not in tr.state.algo.extra
    assert "DiscReplayLogit" not in m
