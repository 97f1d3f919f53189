"""Record golden parity data by EXECUTING the actual reference engine code.

Builds the reference Engine (via tools/ref_shims.py) for
Goal_<Robot>_8Hazards — all five reference robots: point, swimmer, ant,
walker, doggo (the complete xmls/ inventory, reference SURVEY.md L4) —
drives host-MuJoCo physics (mujoco.mj_step) on the reference's own
compiled world model, and evaluates the reference's own
obs()/reward_done()/cost() JAX code at every step — exactly mirroring the
reference host loop (engine.py:469-495 update_data/step bookkeeping: the
None->real last_done chain, the post-step time limit, the step counter
reset).

Outputs tests/golden/ref_goal_<robot>_8hazards.npz with:
- the per-step physics states (qpos/qvel/qacc/ctrl, robot xpos/xmat)
- the layout (goal/hazard world positions from body xpos)
- reference obs/reward/done/cost sequences
- (point only) a batch of synthetic-pose lidar/compass goldens

Run:  python tools/record_reference_golden.py [robot ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
from types import SimpleNamespace

import numpy as np

# the axon sitecustomize pins JAX_PLATFORMS=axon; env vars alone cannot
# override it — force the CPU backend before any jax use (this script is
# all tiny eager host ops; running them over the TPU tunnel hangs)
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_shims import load_reference_engine, GOAL_POINT_8HAZARDS  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)
ROBOTS = ["point", "swimmer", "ant", "walker", "doggo"]

N_ENVS = 3        # independent single-env trajectories
T = 80            # control steps each
SEED = 7


def snapshot(mj_data):
    """Freeze an mj_data into the duck-typed `data` the reference obs/
    reward/cost methods index (xpos (nbody,3), xmat (nbody,3,3), qpos...)."""
    import jax.numpy as jp

    return SimpleNamespace(
        qpos=jp.array(np.array(mj_data.qpos, dtype=np.float64)),
        qvel=jp.array(np.array(mj_data.qvel, dtype=np.float64)),
        qacc=jp.array(np.array(mj_data.qacc, dtype=np.float64)),
        ctrl=jp.array(np.array(mj_data.ctrl, dtype=np.float64)),
        xpos=jp.array(np.array(mj_data.xpos, dtype=np.float64)),
        xmat=jp.array(
            np.array(mj_data.xmat, dtype=np.float64).reshape(-1, 3, 3)
        ),
    )


def sample_valid_layout(engine, key):
    """Rejection-sample one valid layout with the reference's own
    sample_layout (engine.py:546-572)."""
    import jax

    while True:
        key, sub = jax.random.split(key)
        layout, success = engine.sample_layout(sub)
        if float(success) > 0:
            return layout, key


def main(robot="point"):
    import jax
    import mujoco

    eng_mod = load_reference_engine()

    out_path = os.path.join(GOLDEN_DIR, f"ref_goal_{robot}_8hazards.npz")
    config = dict(GOAL_POINT_8HAZARDS)
    config["robot_base"] = f"xmls/{robot}.xml"
    config.update({"env_num": 1, "num_steps": 200, "_seed": SEED})

    # the reference World dumps result.xml into CWD (world.py:331-332)
    old_cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)
        try:
            engine = eng_mod.Engine(config)
        finally:
            os.chdir(old_cwd)

    mj_model = engine.mj_model
    robot_id = engine.body_name2xpos_id["robot"]
    goal_id = engine.body_name2xpos_id["goal"]
    hazard_ids = list(engine.body_name2xpos_id["hazards"])
    nq, nv, nu = mj_model.nq, mj_model.nv, mj_model.nu

    key = jax.random.PRNGKey(SEED)
    act_rng = np.random.RandomState(SEED + 1)

    envs = []
    for e in range(N_ENVS):
        layout, key = sample_valid_layout(engine, key)
        qpos0 = np.array(engine.layout2qpos(layout), dtype=np.float64)

        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[:] = qpos0
        mj_data.qvel[:] = 0.0
        mj_data.ctrl[:] = 0.0
        mujoco.mj_forward(mj_model, mj_data)

        # exercise the cost/done paths: env 1 starts ON a hazard boundary,
        # env 2 starts just outside the goal (reaches it within a few
        # steps). Pure state replay — any start state is a valid golden.
        if e >= 1:
            xpos = np.array(mj_data.xpos)
            # env 2: just outside the goal so random motion crosses the
            # boundary — except the swimmer, which can barely translate
            # under random actions; it starts just INSIDE so the done
            # (and post-done reward-masking) path is still exercised
            goal_off = 0.45 if robot == "swimmer" else 0.52
            target = (xpos[hazard_ids[0], :2] + np.array([0.15, 0.0])
                      if e == 1 else
                      xpos[goal_id, :2] + np.array([goal_off, 0.0]))
            # root xy indices: slide pair for point/swimmer/ant/walker,
            # free-joint head for doggo (reference layout2qpos,
            # engine.py:623-639)
            if "robot" in engine.joint_name2qpos_id:
                rx = engine.joint_name2qpos_id["robot"]
                ry = rx + 1
            else:
                rx = engine.joint_name2qpos_id["robot_x"]
                ry = engine.joint_name2qpos_id["robot_y"]
            mj_data.qpos[rx] = target[0]
            mj_data.qpos[ry] = target[1]
            mujoco.mj_forward(mj_model, mj_data)

        data = snapshot(mj_data)
        # reset observation: obs(data, None, None, None, None)
        # (reference mjx_reset, engine.py:644-657)
        obs0, _ = engine.obs(data, None, None, None, None)

        goal_xy = np.array(data.xpos)[goal_id, :2]
        hazards_xy = np.array(data.xpos)[hazard_ids, :2]

        # host-loop state (reference engine.py:426-431,469-495)
        last_data = None
        last_last_data = None
        done_arr = None          # self._done — None until the first step
        last_done = None
        last_last_done = None
        steps = 0.0

        rec = dict(
            qpos=[np.array(data.qpos)], qvel=[np.array(data.qvel)],
            qacc=[np.array(data.qacc)], ctrl=[np.array(data.ctrl)],
            xpos_robot=[np.array(data.xpos)[robot_id]],
            xmat_robot=[np.array(data.xmat)[robot_id]],
            obs=[np.array(obs0)],
            # per-step object positions: the reference's slide-jointed
            # task geoms DRIFT under solver noise for free-root robots
            # (~0.07 mm/step for doggo) — the golden feeds the positions
            # its obs/cost actually consumed
            hazards_xy_t=[np.array(data.xpos)[hazard_ids, :2]],
            goal_xy_t=[np.array(data.xpos)[goal_id, :2]],
            actions=[], reward=[], done=[], cost=[],
        )

        act_dim = 2 if robot == "point" else nu
        for t in range(T):
            action = act_rng.uniform(-1.0, 1.0, size=act_dim)

            # update_data(): rotate the history BEFORE stepping
            last_last_data = last_data
            last_data = data
            last_last_done = last_done
            last_done = done_arr

            # convert_action (reference engine.py:672-687): point rotates
            # its body-frame x thrust into the world on the PRE-step xmat;
            # every other robot passes ctrl straight through
            if robot == "point":
                robot_mat = np.array(data.xmat)[robot_id]
                world = robot_mat @ np.array([action[0], 0.0, 0.0])
                ctrl = np.array([world[0], world[1], action[1]])
            else:
                ctrl = action

            mj_data.ctrl[:] = ctrl
            for _ in range(engine.physics_steps_per_control_step):
                mujoco.mj_step(mj_model, mj_data)

            data = snapshot(mj_data)
            obs, _ = engine.obs(
                data, last_data, last_last_data, last_done, last_last_done
            )
            reward, done_dev = engine.reward_done(data, last_data, last_done)
            cost = engine.cost(data)

            import jax.numpy as jp

            reward = jp.where(jp.isnan(obs).any() > 0, 0, reward)
            done_dev = jp.where(jp.isnan(obs).any() > 0, 1, done_dev)
            reward = jp.where(jp.isinf(obs).any() > 0, 0, reward)
            done_dev = jp.where(jp.isinf(obs).any() > 0, 1, done_dev)

            # host-side time limit + counter (engine.py:492-493)
            done_host = float(done_dev) if steps <= engine.num_steps \
                else 1.0
            steps = 0.0 if done_host > 0 else steps + 1.0
            done_arr = jp.asarray(done_host)

            rec["actions"].append(action)
            rec["qpos"].append(np.array(data.qpos))
            rec["qvel"].append(np.array(data.qvel))
            rec["qacc"].append(np.array(data.qacc))
            rec["ctrl"].append(np.array(data.ctrl))
            rec["xpos_robot"].append(np.array(data.xpos)[robot_id])
            rec["xmat_robot"].append(np.array(data.xmat)[robot_id])
            rec["hazards_xy_t"].append(np.array(data.xpos)[hazard_ids, :2])
            rec["goal_xy_t"].append(np.array(data.xpos)[goal_id, :2])
            rec["obs"].append(np.array(obs))
            rec["reward"].append(float(reward))
            rec["done"].append(done_host)
            rec["cost"].append(float(cost))

        envs.append(dict(
            goal_xy=goal_xy, hazards_xy=hazards_xy,
            **{k: np.array(v) for k, v in rec.items()},
        ))
        print(f"env {e}: T={T} sum_r={envs[-1]['reward'].sum():.4f} "
              f"sum_c={envs[-1]['cost'].sum():.4f} "
              f"dones={envs[-1]['done'].sum():.0f}")

    # ---- synthetic lidar/compass goldens: random poses + objects --------
    # robot-agnostic math; recorded once (point)
    import jax.numpy as jp

    syn_rng = np.random.RandomState(SEED + 2)
    N_SYN_R = 48 if robot == "point" else 0
    N_SYN = N_SYN_R
    syn = dict(robot_xy=[], robot_theta=[], objects_xy=[],
               goal_xy=[], lidar=[], compass=[], cost=[])
    for i in range(N_SYN):
        rxy = syn_rng.uniform(-2, 2, size=2)
        th = syn_rng.uniform(0, 2 * np.pi)
        # half the samples cluster objects near the robot so the hinge
        # cost is exercised with 1-3 active hazards
        spread = 2.5 if i % 2 == 0 else 0.6
        objs = rxy + syn_rng.uniform(-spread, spread, size=(8, 2))
        gxy = syn_rng.uniform(-2, 2, size=2)
        c, s = np.cos(th), np.sin(th)
        xmat = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        xpos = np.zeros((mj_model.nbody, 3))
        xpos[robot_id, :2] = rxy
        xpos[np.array(hazard_ids), :2] = objs
        xpos[goal_id, :2] = gxy
        xmat_full = np.tile(np.eye(3), (mj_model.nbody, 1, 1))
        xmat_full[robot_id] = xmat
        data = SimpleNamespace(
            xpos=jp.array(xpos), xmat=jp.array(xmat_full),
            qpos=jp.zeros(nq), qvel=jp.zeros(nv), qacc=jp.zeros(nv),
            ctrl=jp.zeros(nu),
        )
        objs3 = np.concatenate([objs, np.zeros((8, 1))], axis=1)
        lid = engine.obs_lidar(data, jp.array(objs3))
        comp = engine.obs_compass(
            data, jp.array([gxy[0], gxy[1], 0.0])
        )
        syn_cost = engine.cost(data)
        syn["robot_xy"].append(rxy)
        syn["robot_theta"].append(th)
        syn["objects_xy"].append(objs)
        syn["goal_xy"].append(gxy)
        syn["lidar"].append(np.array(lid))
        syn["compass"].append(np.array(comp))
        syn["cost"].append(float(syn_cost))

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = dict(
        meta_nq=nq, meta_nv=nv, meta_nu=nu,
        meta_robot_nq=engine.robot.nq, meta_robot_nv=engine.robot.nv,
        meta_robot_nu=engine.robot.nu,
        meta_dt=engine.dt, meta_T=T, meta_n_envs=N_ENVS, meta_seed=SEED,
        meta_obs_keys=np.array(sorted(engine.obs_space_dict.keys())),
        meta_obs_flat_size=int(engine.obs_flat_size),
    )
    for e, rec in enumerate(envs):
        for k, v in rec.items():
            out[f"env{e}_{k}"] = v
    for k, v in syn.items():
        out[f"syn_{k}"] = np.array(v)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    for r in (sys.argv[1:] or ROBOTS):
        print(f"=== recording {r}")
        main(r)
