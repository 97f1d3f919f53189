"""Mocap ingestion (utils/poselib.py) + HumanoidAMP env (envs/humanoid_amp
.py, envs/bench_tasks.py kind 'humanoid_amp').

The load-bearing property is the LAST test: a simulation state initialized
exactly at a mocap frame must produce (through the physics engine's own
forward kinematics) the same 105-dim AMP observation the motion library
computed from the clip (through poselib skeleton FK) — demo and policy
features provably live in one space, which is what AMP training needs
(reference: humanoid_amp.py build_amp_observations serving both
fetch_amp_obs_demo and the simulation amp-obs buffer).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guardx_tpu.utils import poselib

HAVE_CLIPS = len(poselib.default_motion_files(["walk"])) > 0 and \
    __import__("os").path.exists(poselib.default_motion_files(["walk"])[0])

pytestmark = pytest.mark.skipif(
    not HAVE_CLIPS, reason="reference mocap clips not present"
)


@pytest.fixture(scope="module")
def walk():
    return poselib.load_skeleton_motion(
        poselib.default_motion_files(["walk"])[0]
    )


def test_all_six_clips_load():
    """Every reference-shipped clip parses: local WXYZ quats normalized,
    15-node skeleton with the amp_humanoid tree, per-clip fps."""
    for name in poselib.CLIP_NAMES:
        m = poselib.load_skeleton_motion(
            poselib.default_motion_files([name])[0]
        )
        T, J, four = m["local_rot"].shape
        assert J == 15 and four == 4 and T > 20
        assert np.allclose(
            np.linalg.norm(m["local_rot"], axis=-1), 1.0, atol=1e-5
        )
        assert m["fps"] > 0
        assert m["node_names"][0] == "pelvis"
        assert m["parent_indices"][0] == -1
        for k in poselib.KEY_BODIES:
            assert k in m["node_names"]
        g_pos, g_rot = poselib.skeleton_fk(m)
        assert np.isfinite(g_pos).all()
        dof = poselib.motion_to_dof_pos(m["local_rot"])
        assert dof.shape == (T, poselib.NUM_DOF)
        assert np.abs(dof).max() <= np.pi + 1e-6


def test_walk_fk_feet_near_ground(walk):
    """Skeleton FK sanity: in the walk clip the feet stay near the floor
    and below the pelvis; the head stays above it."""
    g_pos, _ = poselib.skeleton_fk(walk)
    names = walk["node_names"]
    rf, head = names.index("right_foot"), names.index("head")
    assert -0.05 < g_pos[:, rf, 2].min() and g_pos[:, rf, 2].mean() < 0.25
    assert (g_pos[:, head, 2] > walk["root_pos"][:, 2]).all()


def test_dof_vel_matches_finite_difference(walk):
    """Mid-clip dof velocities integrate the dof positions (the exp-map
    relative-rotation rate agrees with dof finite differences for the
    1-dof joints, where both are exact)."""
    dof = poselib.motion_to_dof_pos(walk["local_rot"])
    vel = poselib.motion_to_dof_vel(walk["local_rot"], walk["fps"])
    fd = np.diff(dof, axis=0) * walk["fps"]
    # 1-dof joints: offsets of elbow/knee entries in the dof vector
    offs, off = [], 0
    for _, n in poselib.DOF_BODIES:
        if n == 1:
            offs.append(off)
        off += n
    assert np.allclose(vel[:-1, offs], fd[:, offs], atol=1e-4)


def test_motionlib_shapes():
    lib = poselib.MotionLib(poselib.default_motion_files(["walk", "run"]))
    assert lib.qpos.shape == (lib.num_frames(), 35)
    assert lib.qvel.shape == (lib.num_frames(), 34)
    # root quats normalized in qpos
    assert np.allclose(
        np.linalg.norm(lib.qpos[:, 3:7], axis=-1), 1.0, atol=1e-5
    )


@pytest.fixture(scope="module")
def env():
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine

    return NativeBenchEngine(
        "HumanoidAMP", env_num=4, num_steps=100, seed=0,
        motion_files=poselib.default_motion_files(["walk"]),
    )


def test_env_reset_is_reference_state_init(env):
    """Reset obs comes from mocap frames: root height within the clip's
    root-z range, observation finite, 105-dim."""
    obs = np.asarray(env.reset())
    assert obs.shape == (4, 105)
    assert np.isfinite(obs).all()
    lo = env.motion_lib.qpos[:, 2].min() - 1e-4
    hi = env.motion_lib.qpos[:, 2].max() + 1e-4
    assert ((obs[:, 0] >= lo) & (obs[:, 0] <= hi)).all()


def test_env_pd_steps_stable(env):
    """40 zero-action control steps (1.3 s of 120 Hz physics under PD):
    state stays finite, humanoid does not launch or tunnel."""
    env.reset()
    a = jnp.zeros((4, 28), jnp.float32)
    for _ in range(40):
        obs, rew, done, info = env.step(a)
        env.reset_done()
    assert bool(jnp.isfinite(obs).all())
    root_z = np.asarray(env._state.data.qpos[:, 2])
    assert (root_z > -0.2).all() and (root_z < 2.0).all()
    assert float(rew.min()) == 1.0  # constant task reward


def test_env_fall_terminates(env):
    """Forcing the root below terminationHeight flags done (after the
    first-step grace), and reset_done restores a valid mocap state."""
    env.reset()
    st = env._state
    qpos = st.data.qpos.at[:, 2].set(0.3)
    env._state = st.replace(
        data=st.data.replace(qpos=qpos), steps=jnp.full((4,), 5, jnp.int32)
    )
    obs, rew, done, info = env.step(jnp.zeros((4, 28), jnp.float32))
    assert float(done.min()) == 1.0
    obs2 = np.asarray(env.reset_done())
    assert np.isfinite(obs2).all()
    assert (np.asarray(env._state.data.qpos[:, 2]) > 0.5).all()


def test_demo_and_simulation_features_agree(env):
    """THE pipeline property: placing the simulator exactly at clip frame
    k reproduces the demo AMP observation for frame k elementwise —
    demo features go through the env's own FK/observation path, so demo
    and policy manifolds are identical by construction (the reference's
    poselib-FK demos vs PhysX-hinge sim leave a ~0.15 systematic gap;
    see utils/poselib.MotionLib.demo_pairs)."""
    from guardx_tpu import physics

    lib = env.motion_lib
    for k in (3, 40, 100):
        data = physics.make_data(env.model)
        data = data.replace(
            qpos=jnp.asarray(lib.qpos[k]), qvel=jnp.asarray(lib.qvel[k])
        )
        data = physics.forward(env.model, data)
        obs_sim = np.asarray(env._humanoid_amp_obs(data))
        np.testing.assert_allclose(
            obs_sim, env._motion_amp_obs[k], atol=1e-4
        )


def test_demo_pairs_and_poselib_fk_bound(env):
    """Demo pairs have the documented shape, and the env-FK demo features
    stay within a bounded distance of poselib's quaternion-FK features
    (the hinge-triple exp-map approximation both this rebuild and the
    reference's simulator make; key-body block, indices 93:105)."""
    lib = env.motion_lib
    pairs = env.demo_amp_pairs()
    # 60 fps walk clip, 1/30 control dt -> stride 2: (T-2) pairs
    expect = sum(int(t) - 2 for t in lib.lengths)
    assert pairs.shape == (expect, 2, 105)
    assert np.isfinite(pairs).all()

    m = poselib.load_skeleton_motion(lib.files[0])
    g_pos, _ = poselib.skeleton_fk(m)
    key_ids = [m["node_names"].index(k) for k in poselib.KEY_BODIES]
    # compare raw world key-body positions: env FK vs poselib FK
    from guardx_tpu import physics

    for k in (3, 40, 100):
        data = physics.make_data(env.model)
        data = data.replace(
            qpos=jnp.asarray(lib.qpos[k]), qvel=jnp.asarray(lib.qvel[k])
        )
        data = physics.forward(env.model, data)
        sim_key = np.asarray(data.xpos)[np.asarray(env._key_body_ids)]
        clip_key = g_pos[k, key_ids]
        assert np.abs(sim_key - clip_key).max() < 0.25
