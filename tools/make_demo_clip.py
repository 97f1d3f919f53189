"""Synthesize a kinematic trot clip for the doggo and derive AMP demo pairs.

Stands in for a retargeted mocap clip (the data the reference feeds
through poselib/MotionLib — IsaacGymEnvs/isaacgymenvs/tasks/amp/
utils_amp/motion_lib.py:41). The clip is a hand-authored central-pattern
trot: diagonal leg pairs (1,3) and (2,4) oscillate in antiphase around a
crouched stance, ankles flexing out of phase with the hips — kinematic
joint angles only, deliberately NOT rolled through any physics (mocap
clips aren't dynamically consistent either).

Writes:
  <out>_clip.npz   {'qpos': (T, nq), 'dt'}          — the motion clip
  <out>_pairs.npz  {'pairs': (T-2, 2, 2*n_joints)}  — AMP demo pairs in
                   joint-feature space (guardx_tpu.utils.motion)

Usage:  python tools/make_demo_clip.py [--out tests/golden/doggo_trot]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mujoco  # noqa: E402

from guardx_tpu.utils import motion  # noqa: E402
from guardx_tpu.envs.world import BASE_DIR  # noqa: E402


def make_trot_clip(T: int = 400, dt: float = 0.01):
    """Doggo trot: (T, nq) qpos frames at clip timestep dt."""
    m = mujoco.MjModel.from_xml_path(os.path.join(BASE_DIR, "doggo.xml"))
    nq = m.nq
    qpos = np.tile(np.asarray(m.qpos0, np.float64), (T, 1))

    def adr(name):
        j = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, name)
        return int(m.jnt_qposadr[j])

    t = np.arange(T) * dt
    freq = 2.0  # Hz — a brisk trot
    ph = 2 * np.pi * freq * t

    # diagonal pairs in antiphase: legs (1, 3) at phase 0, (2, 4) at pi.
    # hips_y swing around a crouch; ankles flex a quarter period later
    # (stance/swing asymmetry). Legs 2/3 have mirrored hip_y ranges
    # (0..2.36) vs legs 1/4 (-1.31..0.26): offset accordingly.
    for leg, phase in (("1", 0.0), ("3", 0.0), ("2", np.pi), ("4", np.pi)):
        mirrored = leg in ("2", "3")
        hip0 = 0.9 if mirrored else -0.5
        sgn = -1.0 if mirrored else 1.0
        qpos[:, adr(f"hip_{leg}_y")] = hip0 + sgn * 0.35 * np.sin(ph + phase)
        qpos[:, adr(f"ankle_{leg}")] = (
            -0.55 + 0.3 * np.sin(ph + phase + np.pi / 2)
        )
        qpos[:, adr(f"hip_{leg}_z")] = 0.08 * np.sin(ph + phase)
    qpos[:, adr("waist_x")] = 0.06 * np.sin(2 * ph)

    # root: steady forward translation at trot speed, level height
    root = adr("robot")
    qpos[:, root + 0] = 0.45 * t  # forward x
    qpos[:, root + 2] = float(m.qpos0[root + 2])
    qpos[:, root + 3:root + 7] = np.array([1.0, 0.0, 0.0, 0.0])
    return m, qpos, dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "doggo_trot",
    ))
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--dt", type=float, default=0.01)
    args = ap.parse_args(argv)

    m, qpos, dt = make_trot_clip(args.frames, args.dt)
    motion.save_clip(args.out + "_clip.npz", qpos, dt)
    clip = motion.load_clip(args.out + "_clip.npz")
    pairs = motion.clip_to_amp_pairs(clip, m)
    np.savez_compressed(args.out + "_pairs.npz", pairs=pairs)
    print(f"wrote {args.out}_clip.npz ({qpos.shape}) and "
          f"{args.out}_pairs.npz ({pairs.shape})")


if __name__ == "__main__":
    main()
