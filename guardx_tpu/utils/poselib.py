"""Loader for the reference's poselib SkeletonMotion mocap clips.

The reference ships six real motion-capture clips
(IsaacGymEnvs/assets/amp/motions/amp_humanoid_{walk,run,dance,backflip,
cartwheel,hop}.npy) serialized by poselib
(tasks/amp/poselib/poselib/skeleton/skeleton3d.py Serializable.to_file):
each file is an np.save'd dict with

    rotation.arr          (T, J, 4)  local joint quaternions, XYZW
    root_translation.arr  (T, 3)     pelvis world position
    global_velocity.arr   (T, J, 3)  world linear velocity per body
    global_angular_velocity.arr (T, J, 3)
    skeleton_tree: node_names, parent_indices.arr (J,),
                   local_translation.arr (J, 3)
    fps, is_local

and is consumed through MotionLib (tasks/amp/utils_amp/motion_lib.py:41):
local rotations -> per-dof coordinates via exp-map for 3-dof joint
clusters / y-axis angle for 1-dof joints (motion_lib.py
_local_rotation_to_dof), dof velocities from frame-to-frame relative
rotations (_local_rotation_to_dof_vel), key-body world positions from
skeleton forward kinematics.

This module re-implements that pipeline in plain numpy for the native
amp_humanoid model (envs/xmls/amp_humanoid.xml — the same skeleton the
clips are bound to), producing per-frame

    qpos (T, 35) = [root pos (3), root quat WXYZ (4), dof_pos (28)]
    qvel (T, 34) = [root world lin vel (3), root BODY-frame ang vel (3),
                    dof_vel (28)]

for reference-state initialization, plus the raw root/key-body arrays the
AMP observation builder (envs/humanoid_amp.py build_amp_obs) consumes.

Quaternions are converted to the repo-wide WXYZ convention at load.
No reference code is copied; the serialized files are read as data.
"""

from __future__ import annotations

import os

import numpy as np

# Default motion directory: overridable via GUARDX_AMP_MOTION_DIR for
# machines where the reference checkout lives elsewhere.
REF_MOTION_DIR = os.environ.get(
    "GUARDX_AMP_MOTION_DIR",
    "/root/reference/IsaacGymEnvs/assets/amp/motions",
)
CLIP_NAMES = ("walk", "run", "dance", "backflip", "cartwheel", "hop")

# dof layout of the amp_humanoid skeleton: (skeleton node index, n_dofs)
# per actuated joint cluster, in joint order — torso, head, arms, legs
# (reference humanoid_amp_base.py:41-42 DOF_BODY_IDS/DOF_OFFSETS)
DOF_BODIES = (
    (1, 3),   # torso      <- abdomen_x/y/z
    (2, 3),   # head       <- neck_x/y/z
    (3, 3),   # right_upper_arm <- right_shoulder_x/y/z
    (4, 1),   # right_lower_arm <- right_elbow (y)
    (6, 3),   # left_upper_arm  <- left_shoulder_x/y/z
    (7, 1),   # left_lower_arm  <- left_elbow (y)
    (9, 3),   # right_thigh <- right_hip_x/y/z
    (10, 1),  # right_shin  <- right_knee (y)
    (11, 3),  # right_foot  <- right_ankle_x/y/z
    (12, 3),  # left_thigh  <- left_hip_x/y/z
    (13, 1),  # left_shin   <- left_knee (y)
    (14, 3),  # left_foot   <- left_ankle_x/y/z
)
NUM_DOF = sum(n for _, n in DOF_BODIES)  # 28

# key bodies for AMP features (HumanoidAMP.yaml keyBodies defaults)
KEY_BODIES = ("right_hand", "left_hand", "right_foot", "left_foot")


# ---------------------------------------------------------------------------
# quaternion helpers (numpy, WXYZ)
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4) WXYZ."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def quat_to_exp_map(q):
    """Quaternion (..., 4) WXYZ -> exponential map (..., 3) = angle * axis,
    angle normalized to [-pi, pi] (motion_lib quat_to_angle_axis +
    angle_axis_to_exp_map semantics, incl. the sin(theta) ~ 0 guard)."""
    w = np.clip(q[..., 0], -1.0, 1.0)
    sin_half = np.sqrt(np.maximum(1.0 - w * w, 0.0))
    angle = 2.0 * np.arccos(w)
    angle = np.arctan2(np.sin(angle), np.cos(angle))  # normalize_angle
    safe = np.where(sin_half > 1e-5, sin_half, 1.0)[..., None]
    axis = q[..., 1:] / safe
    small = sin_half <= 1e-5
    angle = np.where(small, 0.0, angle)
    axis = np.where(small[..., None],
                    np.array([0.0, 0.0, 1.0]), axis)
    return angle[..., None] * axis


def quat_angle_about_y(q):
    """Signed rotation angle assuming the joint axis is +-y
    (motion_lib.py:294-300: theta * axis_y, normalized)."""
    angle = 2.0 * np.arccos(np.clip(q[..., 0], -1.0, 1.0))
    sin_half = np.sqrt(np.maximum(1.0 - q[..., 0] ** 2, 0.0))
    safe = np.where(sin_half > 1e-5, sin_half, 1.0)
    axis_y = q[..., 2] / safe
    theta = np.where(sin_half > 1e-5, angle * axis_y, 0.0)
    return np.arctan2(np.sin(theta), np.cos(theta))


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def _arr(node):
    return np.asarray(node["arr"])


def load_skeleton_motion(path: str) -> dict:
    """Parse one poselib SkeletonMotion .npy into plain arrays (WXYZ)."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"AMP motion clip not found: {path}. Point "
            f"GUARDX_AMP_MOTION_DIR at a directory holding the "
            f"amp_humanoid_*.npy poselib clips (current dir: "
            f"{REF_MOTION_DIR})."
        )
    raw = np.load(path, allow_pickle=True).item()
    if raw.get("__name__") != "SkeletonMotion":
        raise ValueError(f"{path}: not a poselib SkeletonMotion file")
    if not bool(raw["is_local"]):
        raise ValueError(f"{path}: expected local-rotation storage")
    rot_xyzw = _arr(raw["rotation"]).astype(np.float64)
    local_rot = np.concatenate(
        [rot_xyzw[..., 3:4], rot_xyzw[..., 0:3]], axis=-1
    )  # -> WXYZ
    local_rot /= np.linalg.norm(local_rot, axis=-1, keepdims=True)
    tree = raw["skeleton_tree"]
    return dict(
        local_rot=local_rot,                                   # (T, J, 4)
        root_pos=_arr(raw["root_translation"]).astype(np.float64),
        global_vel=_arr(raw["global_velocity"]).astype(np.float64),
        global_ang_vel=_arr(raw["global_angular_velocity"]).astype(
            np.float64),
        fps=float(np.asarray(raw["fps"])),
        node_names=list(tree["node_names"]),
        parent_indices=_arr(tree["parent_indices"]).astype(np.int64),
        local_translation=_arr(tree["local_translation"]).astype(
            np.float64),
    )


def skeleton_fk(motion: dict):
    """Global body positions/rotations from local rotations + root pos.

    Poselib convention (skeleton3d.py global transforms): node 0 carries
    the root; global_rot[j] = global_rot[parent] * local_rot[j],
    global_pos[j] = global_pos[parent] + rotate(global_rot[parent],
    local_translation[j])."""
    local_rot = motion["local_rot"]
    parents = motion["parent_indices"]
    offs = motion["local_translation"]
    T, J, _ = local_rot.shape
    g_rot = np.zeros((T, J, 4))
    g_pos = np.zeros((T, J, 3))
    g_rot[:, 0] = local_rot[:, 0]
    g_pos[:, 0] = motion["root_pos"]
    for j in range(1, J):
        p = parents[j]
        g_rot[:, j] = quat_mul(g_rot[:, p], local_rot[:, j])
        g_pos[:, j] = g_pos[:, p] + quat_rotate(g_rot[:, p], offs[j][None])
    g_rot /= np.linalg.norm(g_rot, axis=-1, keepdims=True)
    return g_pos, g_rot


def motion_to_dof_pos(local_rot) -> np.ndarray:
    """(T, J, 4) local rotations -> (T, 28) hinge coordinates
    (motion_lib.py _local_rotation_to_dof: exp map for 3-dof clusters,
    y-axis angle for 1-dof joints)."""
    T = local_rot.shape[0]
    out = np.zeros((T, NUM_DOF))
    off = 0
    for body, n in DOF_BODIES:
        q = local_rot[:, body]
        if n == 3:
            out[:, off:off + 3] = quat_to_exp_map(q)
        else:
            out[:, off] = quat_angle_about_y(q)
        off += n
    return out


def motion_to_dof_vel(local_rot, fps) -> np.ndarray:
    """Per-frame dof velocities from frame-to-frame local rotations
    (motion_lib.py _local_rotation_to_dof_vel / _compute_motion_dof_vels:
    exp map of the relative rotation / dt; the final frame repeats)."""
    dt = 1.0 / fps
    q0, q1 = local_rot[:-1], local_rot[1:]
    drot = quat_mul(quat_conj(q0), q1)  # (T-1, J, 4)
    T = local_rot.shape[0]
    out = np.zeros((T, NUM_DOF))
    off = 0
    for body, n in DOF_BODIES:
        dexp = quat_to_exp_map(drot[:, body]) / dt  # (T-1, 3)
        if n == 3:
            out[:-1, off:off + 3] = dexp
        else:
            out[:-1, off] = dexp[:, 1]  # y component
        off += n
    out[-1] = out[-2]
    return out


class MotionLib:
    """Device-friendly motion library over one or more clips.

    Mirrors the consumed surface of the reference MotionLib
    (motion_lib.py): per-frame simulation states for reference-state
    initialization, and AMP demo observation pairs one control step
    apart. All frames of all clips are concatenated; `starts[i]`/
    `lengths[i]` delimit clip i."""

    def __init__(self, files):
        if isinstance(files, str):
            files = [files]
        qpos, qvel, starts, lengths, fpss = [], [], [], [], []
        n = 0
        for f in files:
            m = load_skeleton_motion(f)
            fps = m["fps"]
            dof_pos = motion_to_dof_pos(m["local_rot"])
            dof_vel = motion_to_dof_vel(m["local_rot"], fps)
            root_pos = m["root_pos"]
            root_rot = m["local_rot"][:, 0]
            root_vel = m["global_vel"][:, 0]
            root_ang_vel = m["global_ang_vel"][:, 0]

            # simulation state: free joint = world pos + WXYZ quat; angular
            # velocity BODY-frame (physics/kinematics.py free-joint
            # convention, mirroring MuJoCo)
            ang_vel_body = quat_rotate(quat_conj(root_rot), root_ang_vel)
            T = root_pos.shape[0]
            qpos.append(np.concatenate(
                [root_pos, root_rot, dof_pos], axis=1))
            qvel.append(np.concatenate(
                [root_vel, ang_vel_body, dof_vel], axis=1))
            starts.append(n)
            lengths.append(T)
            fpss.append(fps)
            n += T
        self.files = list(files)
        self.qpos = np.concatenate(qpos, axis=0).astype(np.float32)
        self.qvel = np.concatenate(qvel, axis=0).astype(np.float32)
        self.starts = np.asarray(starts, np.int64)
        self.lengths = np.asarray(lengths, np.int64)
        self.fps = np.asarray(fpss)

    def demo_pairs(self, control_dt: float, amp_obs: np.ndarray):
        """(N, 2, F) AMP demo observation pairs, the two frames one
        control step apart within the same clip (reference
        fetch_amp_obs_demo samples states dt apart; here frame-aligned:
        stride = round(control_dt * fps), >= 1).

        `amp_obs` (num_frames, F) are the per-frame observations, computed
        by the ENV through its own FK/observation path (bench_tasks.py
        humanoid_amp init) — the reference instead builds demo features
        through poselib's quaternion FK while the simulator composes the
        hinge triples from exp-map coordinates, leaving a systematic
        demo-vs-sim offset of up to ~0.15 in the key-body features; one
        code path removes that gap entirely
        (tests/test_poselib.py::test_demo_and_simulation_features_agree)."""
        pairs = []
        for i in range(len(self.starts)):
            s, T = int(self.starts[i]), int(self.lengths[i])
            stride = max(1, int(round(control_dt * self.fps[i])))
            obs = amp_obs[s:s + T]
            if T > stride:
                pairs.append(np.stack(
                    [obs[:-stride], obs[stride:]], axis=1))
        return np.concatenate(pairs, axis=0)

    def num_frames(self) -> int:
        return int(self.qpos.shape[0])


def default_motion_files(names=("walk", "run")):
    """Paths of the reference-shipped clips (read as data at runtime)."""
    out = []
    for n in names:
        p = os.path.join(REF_MOTION_DIR, f"amp_humanoid_{n}.npy")
        out.append(p)
    return out
