"""HumanoidAMP: the reference's canonical AMP environment, TPU-native.

Reference: IsaacGymEnvs/isaacgymenvs/tasks/humanoid_amp.py +
tasks/amp/humanoid_amp_base.py. A 28-dof humanoid
(envs/xmls/amp_humanoid.xml) under PD position control whose task reward
is constant 1 (humanoid_amp_base.py compute_humanoid_reward) — all
learning signal beyond staying alive comes from the AMP discriminator's
style reward over real mocap clips (utils/poselib.py loads the
reference-shipped .npy motions). Episodes start from random motion
frames (HumanoidAMP.yaml stateInit: Random) and terminate early when the
root falls below terminationHeight 0.5.

The observation is the reference's 105-dim humanoid feature vector
(humanoid_amp.py NUM_AMP_OBS_PER_STEP = 13 + 52 + 28 + 12):

    [root height (1),
     root rotation tan-norm (6),          # localRootObs False -> global
     heading-local root lin vel (3),
     heading-local root ang vel (3),
     dof_obs (52),                        # 3-dof clusters as quat tan-norm
     dof velocities (28),
     heading-local key-body offsets (12)] # hands + feet

used BOTH as the policy observation and as the AMP discriminator feature
(humanoid_amp.py build_amp_observations == compute_humanoid_observations
modulo the localRootObs flag); with numAMPObsSteps=2 the discriminator
sees consecutive-step pairs — exactly the (2, F) pair layout
algos/algorithms/amp.py trains on.

This module holds the observation math (jax, single frame — the env vmaps
it; a numpy batch wrapper serves utils/poselib.MotionLib so demo and
policy features come from ONE implementation). The env plumbing lives in
envs/bench_tasks.py (kind 'humanoid_amp').
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from guardx_tpu.physics import maths

# (skeleton node id, dof count) per joint cluster — utils/poselib.py
from guardx_tpu.utils import poselib as _pl

DOF_BODIES = _pl.DOF_BODIES
NUM_DOF = _pl.NUM_DOF
KEY_BODIES = _pl.KEY_BODIES
NUM_OBS = 13 + 52 + NUM_DOF + 3 * len(KEY_BODIES)  # 105

# PD gains per joint cluster, the reference MJCF's stiffness/damping
# values (assets/mjcf/amp_humanoid.xml; IsaacGym consumes them as PD
# gains under pdControl, not as passive springs): cluster order matches
# DOF_BODIES.
PD_GAINS = (
    (600.0, 60.0),   # abdomen
    (50.0, 5.0),     # neck
    (200.0, 20.0),   # right shoulder
    (150.0, 15.0),   # right elbow
    (200.0, 20.0),   # left shoulder
    (150.0, 15.0),   # left elbow
    (300.0, 30.0),   # right hip
    (300.0, 30.0),   # right knee
    (200.0, 20.0),   # right ankle
    (300.0, 30.0),   # left hip
    (300.0, 30.0),   # left knee
    (200.0, 20.0),   # left ankle
)

TERMINATION_HEIGHT = 0.5  # HumanoidAMP.yaml terminationHeight


def pd_tables(jnt_range_per_dof: np.ndarray):
    """(kp, kd, offset, scale) arrays (28,) for the PD action mapping.

    offset/scale follow humanoid_amp_base.py _build_pd_action_offset_scale:
    3-dof clusters get the full +-pi range; 1-dof joints get the limit
    midpoint +- 0.7 * FULL width (humanoid_amp_base.py:283
    `curr_scale = 0.7 * (curr_high - curr_low)` — a deliberate extension
    beyond the joint limits so motors keep authority near the stops)."""
    kp = np.zeros(NUM_DOF)
    kd = np.zeros(NUM_DOF)
    lo = jnt_range_per_dof[:, 0].copy()
    hi = jnt_range_per_dof[:, 1].copy()
    off = 0
    for (body, n), (p, d) in zip(DOF_BODIES, PD_GAINS):
        kp[off:off + n] = p
        kd[off:off + n] = d
        if n == 3:
            lo[off:off + 3] = -np.pi
            hi[off:off + 3] = np.pi
        else:
            mid = 0.5 * (hi[off] + lo[off])
            half = 0.7 * (hi[off] - lo[off])
            lo[off], hi[off] = mid - half, mid + half
        off += n
    offset = 0.5 * (hi + lo)
    scale = 0.5 * (hi - lo)
    return (kp.astype(np.float32), kd.astype(np.float32),
            offset.astype(np.float32), scale.astype(np.float32))


# ---------------------------------------------------------------------------
# observation math (single frame, jax — vmap over envs / frames)
# ---------------------------------------------------------------------------

def _heading_quat_inv(root_quat):
    """Inverse-heading quaternion (rotation about z by -yaw), where yaw is
    the direction of the rotated x axis (torch_jit_utils.calc_heading)."""
    fwd = maths.quat_rotate(root_quat, jnp.array([1.0, 0.0, 0.0]))
    heading = jnp.arctan2(fwd[1], fwd[0])
    return maths.axis_angle_to_quat(jnp.array([0.0, 0.0, 1.0]), -heading)


def _tan_norm(q):
    """6d tangent/normal rotation encoding (quat_to_tan_norm)."""
    tan = maths.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    nrm = maths.quat_rotate(q, jnp.array([0.0, 0.0, 1.0]))
    return jnp.concatenate([tan, nrm])


def _exp_map_to_quat(e):
    angle = jnp.linalg.norm(e)
    safe = jnp.where(angle > 1e-9, angle, 1.0)
    axis = jnp.where(angle > 1e-9, e / safe,
                     jnp.array([0.0, 0.0, 1.0], e.dtype))
    return maths.axis_angle_to_quat(axis, angle)


def dof_to_obs(dof_pos):
    """(28,) dof coordinates -> (52,) pose features: 3-dof clusters as the
    tan-norm of their exp-map rotation, 1-dof joints raw
    (humanoid_amp_base.py dof_to_obs)."""
    out = []
    off = 0
    for body, n in DOF_BODIES:
        if n == 3:
            out.append(_tan_norm(_exp_map_to_quat(dof_pos[off:off + 3])))
        else:
            out.append(dof_pos[off:off + 1])
        off += n
    return jnp.concatenate(out)


def build_amp_obs(root_pos, root_quat, root_vel, root_ang_vel,
                  dof_pos, dof_vel, key_pos):
    """105-dim humanoid observation (build_amp_observations /
    compute_humanoid_observations with localRootObs=False,
    humanoid_amp.py:300-333).

    root_quat WXYZ; root_vel / root_ang_vel in the WORLD frame;
    key_pos (4, 3) world positions of hands + feet."""
    hq = _heading_quat_inv(root_quat)
    root_h = root_pos[2:3]
    rot_obs = _tan_norm(root_quat)  # global: localRootObs False
    local_vel = maths.quat_rotate(hq, root_vel)
    local_ang = maths.quat_rotate(hq, root_ang_vel)
    rel = key_pos - root_pos[None, :]
    local_key = maths.quat_rotate(hq[None, :].repeat(rel.shape[0], 0), rel)
    return jnp.concatenate([
        root_h, rot_obs, local_vel, local_ang,
        dof_to_obs(dof_pos), dof_vel, local_key.reshape(-1),
    ])


# NOTE: demo-frame observations are intentionally NOT built from poselib's
# quaternion FK. The env computes them through its own physics FK +
# build_amp_obs (bench_tasks.py humanoid_amp init), so demo and policy
# features are the same manifold by construction — the reference's split
# (poselib FK for demos, PhysX hinge triples for the sim) leaves a
# systematic offset of up to ~0.15 in the key-body features that a
# discriminator could exploit.
