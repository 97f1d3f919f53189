"""Quantify contact-physics fidelity for the locomotion robots.

Runs every GUARD robot (reference xmls: point, swimmer, walker, ant, doggo
— safe_rl_envs/safe_rl_envs/envs/xmls/*.xml) WITH floor contact for
``--steps`` control steps under (a) host MuJoCo (the golden reference for
what MJX computes in reference engine.py:668-670) and (b) the guardx_tpu
device pipeline, driving both with the identical deterministic ctrl
sequence, and reports per-robot drift metrics:

  rmse_qpos   : RMSE over the full trajectory of all qpos entries
  xy_err      : final-step root xy distance error (meters)
  z_err_mean  : mean |root height error| over the trajectory
  upright     : our engine keeps the robot upright iff MuJoCo does

The penalty contact model is NOT MuJoCo's convex solver, so trajectories
diverge chaotically at contact events; the claim under test is that the
*behavior* matches — similar travel, similar posture, no blow-ups — which
is what the RL layer consumes. tests/test_physics.py pins the tolerances
recorded here.

Usage:  python tools/contact_fidelity.py [--steps 200] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import mujoco
import jax
import jax.numpy as jnp

from guardx_tpu import physics
from guardx_tpu.envs.engine import Engine
from guardx_tpu.envs.world import World


ROBOTS = ["point.xml", "swimmer.xml", "walker.xml", "ant.xml", "doggo.xml"]


def ctrl_sequence(nu: int, steps: int, seed: int = 0) -> np.ndarray:
    """Deterministic, exploring-but-smooth control sequence: sum of two
    incommensurate sinusoids per actuator, clipped to [-1, 1]."""
    rs = np.random.RandomState(seed)
    t = np.arange(steps)[:, None]
    f1 = rs.uniform(0.02, 0.08, nu)[None, :]
    f2 = rs.uniform(0.002, 0.01, nu)[None, :]
    ph = rs.uniform(0, 2 * np.pi, nu)[None, :]
    seq = 0.7 * np.sin(2 * np.pi * f1 * t + ph) + 0.5 * np.sin(2 * np.pi * f2 * t)
    return np.clip(seq, -1.0, 1.0).astype(np.float64)


def run_mujoco(mj_model, ctrl: np.ndarray):
    d = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, d)
    qpos = np.zeros((ctrl.shape[0], mj_model.nq))
    for t in range(ctrl.shape[0]):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj_model, d)
        qpos[t] = d.qpos
    return qpos


def run_guardx(mj_model, substeps: int, ctrl: np.ndarray):
    model, _ = physics.load_model(mj_model, substeps=substeps)
    data = physics.make_data(model, np.asarray(mj_model.qpos0, np.float32))
    data = physics.forward(model, data)
    step = jax.jit(lambda d, c: physics.step(model, d.replace(ctrl=c)))
    qpos = np.zeros((ctrl.shape[0], model.nq))
    cj = jnp.asarray(ctrl, jnp.float32)
    for t in range(ctrl.shape[0]):
        data = step(data, cj[t])
        qpos[t] = np.asarray(data.qpos)
    return qpos


def root_slices(mj_model):
    """(xy_idx, z_idx or None) for the robot root."""
    jid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY, "robot")
    # find first joint on robot body
    for j in range(mj_model.njnt):
        if mj_model.jnt_bodyid[j] == jid:
            adr = int(mj_model.jnt_qposadr[j])
            if mj_model.jnt_type[j] == 0:  # free
                return [adr, adr + 1], adr + 2
            return [adr, adr + 1], None  # slide-slide (point/swimmer)
    raise RuntimeError("no robot joint")


def measure(robot: str, steps: int, seed: int = 0) -> dict:
    world = World(robot, geoms={})
    mj_model = world.build()
    substeps = Engine.ROBOT_SUBSTEPS.get(robot, 4)
    ctrl = ctrl_sequence(mj_model.nu, steps, seed)

    q_mj = run_mujoco(mj_model, ctrl)
    q_gx = run_guardx(mj_model, substeps, ctrl)

    xy_idx, z_idx = root_slices(mj_model)
    rmse = float(np.sqrt(np.mean((q_mj - q_gx) ** 2)))
    xy_err = float(np.linalg.norm(q_mj[-1, xy_idx] - q_gx[-1, xy_idx]))
    travel = float(np.linalg.norm(q_mj[-1, xy_idx] - q_mj[0, xy_idx]))
    out = {
        "robot": robot,
        "steps": steps,
        "substeps": substeps,
        "rmse_qpos": rmse,
        "xy_err_final": xy_err,
        "mj_travel": travel,
        "finite": bool(np.isfinite(q_gx).all()),
    }
    if z_idx is not None:
        out["z_err_mean"] = float(np.mean(np.abs(q_mj[:, z_idx] - q_gx[:, z_idx])))
        out["z_mj_mean"] = float(np.mean(q_mj[:, z_idx]))
        out["z_gx_mean"] = float(np.mean(q_gx[:, z_idx]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for robot in ROBOTS:
        per_seed = [measure(robot, args.steps, s) for s in range(args.seeds)]
        agg = dict(per_seed[0])
        for k in ("rmse_qpos", "xy_err_final", "mj_travel", "z_err_mean",
                  "z_mj_mean", "z_gx_mean"):
            if k in agg:
                agg[k] = float(np.mean([r[k] for r in per_seed]))
        agg["finite"] = all(r["finite"] for r in per_seed)
        rows.append(agg)
        print(json.dumps(agg))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()


def mujoco_h_sensitivity(robot: str, steps: int, seed: int = 0) -> dict:
    """How much host MuJoCo disagrees with ITSELF when its timestep is
    halved (two mj_steps per control step) — the yardstick for what
    trajectory-level fidelity can mean on a given robot. A solver that is
    not bit-identical to MuJoCo's cannot stay closer to the h=dt
    trajectory than MuJoCo's own h-truncation error."""
    world = World(robot, geoms={})
    mj_model = world.build()
    ctrl = ctrl_sequence(mj_model.nu, steps, seed)
    q_a = run_mujoco(mj_model, ctrl)

    d = mujoco.MjData(mj_model)
    old = mj_model.opt.timestep
    mj_model.opt.timestep = old / 2
    mujoco.mj_forward(mj_model, d)
    q_b = np.zeros_like(q_a)
    for t in range(ctrl.shape[0]):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj_model, d)
        mujoco.mj_step(mj_model, d)
        q_b[t] = d.qpos
    mj_model.opt.timestep = old
    xy_idx, _ = root_slices(mj_model)
    return {
        "robot": robot,
        "rmse_qpos": float(np.sqrt(np.mean((q_a - q_b) ** 2))),
        "xy_err_final": float(np.linalg.norm(q_a[-1, xy_idx] - q_b[-1, xy_idx])),
    }
