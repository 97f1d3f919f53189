"""Motion-clip pipeline tests (guardx_tpu.utils.motion + the AMP
joint-feature path; reference MotionLib/poselib contract —
IsaacGymEnvs/isaacgymenvs/tasks/amp/utils_amp/motion_lib.py:41)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from guardx_tpu.utils import motion


@pytest.fixture(scope="module")
def trot(tmp_path_factory):
    from tools.make_demo_clip import make_trot_clip

    m, qpos, dt = make_trot_clip(T=60, dt=0.01)
    return m, qpos, dt


def test_clip_roundtrip(trot, tmp_path):
    m, qpos, dt = trot
    p = str(tmp_path / "clip.npz")
    motion.save_clip(p, qpos, dt)
    clip = motion.load_clip(p)
    np.testing.assert_allclose(clip["qpos"], qpos.astype(np.float32))
    assert clip["dt"] == np.float32(dt)


def test_clip_features_are_joint_space(trot):
    m, qpos, dt = trot
    feats = motion.clip_features(qpos, dt, m)
    qadrs, dadrs = motion._joint_addrs(m)
    assert feats.shape == (qpos.shape[0] - 1, 2 * len(qadrs))
    # angles reproduce the clip's joint channels
    np.testing.assert_allclose(
        feats[:, :len(qadrs)], qpos[:-1, qadrs], atol=1e-6
    )
    # velocities are the finite differences
    np.testing.assert_allclose(
        feats[0, len(qadrs):], (qpos[1, qadrs] - qpos[0, qadrs]) / dt,
        rtol=1e-4,
    )
    # the root's translation does NOT leak into the features
    q2 = qpos.copy()
    q2[:, 0] += 5.0
    np.testing.assert_allclose(
        motion.clip_features(q2, dt, m), feats, atol=1e-5
    )


@pytest.mark.slow
def test_feature_indices_align_env_obs_with_clip(trot):
    """The obs-side joint slices and the clip-side features must be the
    SAME quantities: stepping the bench env and reading obs[idx] gives
    the env's joint angles/velocities in clip feature order."""
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine

    m, qpos, dt = trot
    env = NativeBenchEngine("Anymal", env_num=2, num_steps=10, seed=0)
    idx = motion.feature_indices(env)
    obs = env.reset()
    qadrs, dadrs = motion._joint_addrs(env.mj_model)
    st = env._state
    expect = np.concatenate([
        np.asarray(st.data.qpos[:, qadrs]),
        np.asarray(st.data.qvel[:, dadrs]),
    ], axis=1)
    np.testing.assert_allclose(np.asarray(obs)[:, idx], expect, atol=1e-5)


@pytest.mark.slow
def test_amp_trains_on_clip_demos(trot):
    """AMP end-to-end with joint-feature clip demos: the discriminator
    separates demo from policy pairs (LossDisc falls) and StyleReward is
    produced — demo data in, stylized objective out."""
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    m, qpos, dt = trot
    clip = {"qpos": qpos, "dt": dt}
    pairs = motion.clip_to_amp_pairs(clip, m)
    env = NativeBenchEngine("Anymal", env_num=8, num_steps=16, seed=0)
    idx = motion.feature_indices(env)
    algo = REGISTRY["amp"](demos=pairs, feature_idx=idx, disc_batch=256,
                           disc_iters=4)
    tr = Trainer(env, algo, seed=0)
    m0 = tr.run_epoch(0)
    for e in range(1, 4):
        m1 = tr.run_epoch(e)
    assert np.isfinite(m1["StyleReward"])
    assert m1["LossDisc"] < m0["LossDisc"], (m0["LossDisc"], m1["LossDisc"])
