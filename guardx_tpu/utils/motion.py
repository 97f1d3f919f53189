"""Motion-clip pipeline for AMP: demo data in, stylized gait out.

TPU-native counterpart of the reference's poselib/MotionLib stack
(reference: IsaacGymEnvs/isaacgymenvs/tasks/amp/utils_amp/motion_lib.py:41
loads mocap clips and serves (s, s') AMP-observation pairs;
tasks/amp/poselib/ retargets skeletons). This rebuild keeps the same
contract with a minimal on-disk format:

    clip npz: {'qpos': (T, nq) float, 'dt': float}
      — a kinematic joint-trajectory clip (mocap-like; it need not be
        dynamically consistent, exactly like retargeted mocap)

The AMP feature space is JOINT space: joint angles + joint velocities of
every 1-dof joint that is not part of the robot's root (translation/
heading invariant — what style matching wants, and the same notion as the
reference's amp obs built from dof_pos/dof_vel,
amp/humanoid_amp_base.py build_amp_observations). The same features are
extracted
- from a clip: qpos[:, joint qpos addrs] + finite-difference velocities
- from the env's flat observation: the qpos/qvel slices at those joints
so demo pairs and policy pairs live in one space.
"""

from __future__ import annotations

import numpy as np

ROOT_JOINTS = {"robot", "robot_x", "robot_y", "robot_z"}


def _joint_addrs(mj_model):
    """(qpos addrs, dof addrs) of non-root 1-dof joints, in joint order."""
    import mujoco

    qadrs, dadrs = [], []
    for j in range(mj_model.njnt):
        name = mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_JOINT, j)
        t = int(mj_model.jnt_type[j])
        # 2 = slide, 3 = hinge (mjtJoint); skip free/ball roots
        if t not in (2, 3) or name in ROOT_JOINTS:
            continue
        qadrs.append(int(mj_model.jnt_qposadr[j]))
        dadrs.append(int(mj_model.jnt_dofadr[j]))
    return np.asarray(qadrs, np.int64), np.asarray(dadrs, np.int64)


def feature_indices(env) -> np.ndarray:
    """Indices into the env's FLAT observation selecting the AMP joint
    features [joint angles..., joint velocities...].

    Supports the GUARD Engine (obs carries full robot qpos/qvel slices at
    sorted-key offsets) and NativeBenchEngine locomotion tasks
    (obs = qpos[2:] ++ qvel)."""
    qadrs, dadrs = _joint_addrs(env.mj_model)

    from guardx_tpu.envs.engine import Engine

    if isinstance(env, Engine):
        offs = {}
        i = 0
        for k in sorted(env.obs_space_dict.keys()):
            offs[k] = i
            i += int(np.prod(env.obs_space_dict[k].shape))
        if 'qpos' not in offs or 'qvel' not in offs:
            raise ValueError(
                "AMP joint features need observe_qpos and observe_qvel"
            )
        return np.concatenate([offs['qpos'] + qadrs, offs['qvel'] + dadrs])

    # NativeBenchEngine layouts: locomotion = qpos[2:] ++ qvel;
    # command (AnymalTerrain) = qpos[2:] ++ qvel ++ commands(3) — the
    # joint slices sit at the same offsets in both
    if getattr(env, 'spec', None) is None or env.spec.kind not in (
        'locomotion', 'command',
    ):
        raise ValueError(
            "AMP joint features support GUARD Engine and locomotion/"
            f"command bench tasks (got "
            f"{getattr(env.spec, 'kind', type(env).__name__)})"
        )
    nq = env.model.nq
    return np.concatenate([qadrs - 2, (nq - 2) + dadrs])


def clip_features(qpos_seq: np.ndarray, dt: float, mj_model) -> np.ndarray:
    """(T, nq) clip -> (T-1, 2*n_joints) AMP features per frame.

    Velocities are finite differences of the joint angles (the standard
    mocap treatment; motion_lib.py:_compute_motion_dof_vels does the
    same)."""
    qadrs, _ = _joint_addrs(mj_model)
    q = np.asarray(qpos_seq, np.float64)[:, qadrs]
    v = np.diff(q, axis=0) / float(dt)
    # frame t's features use velocity (q[t+1]-q[t])/dt
    return np.concatenate([q[:-1], v], axis=1).astype(np.float32)


def clip_to_amp_pairs(clip: dict, mj_model) -> np.ndarray:
    """Clip dict -> (N, 2, F) consecutive-frame AMP demo pairs."""
    feats = clip_features(clip['qpos'], float(clip['dt']), mj_model)
    return np.stack([feats[:-1], feats[1:]], axis=1)


def load_clip(path: str) -> dict:
    z = np.load(path)
    return {'qpos': z['qpos'], 'dt': float(z['dt'])}


def save_clip(path: str, qpos_seq: np.ndarray, dt: float) -> None:
    np.savez_compressed(path, qpos=np.asarray(qpos_seq, np.float32),
                        dt=np.float32(dt))
