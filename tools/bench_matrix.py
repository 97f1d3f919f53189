"""Suite-scale throughput matrix across robots (VERDICT r3 #3).

The headline bench (bench.py) measures only Goal_Point — the one robot
with the closed-form planar-3dof physics bypass
(physics/pipeline._planar3_step). This matrix benches the GENERAL
FK/CRBA/contact path on every reference robot at the reference's
suite-scale workload (env_num=4000, max_ep_len=200 —
/root/reference/safe_rl_libX/run.py:80-90) with CPO, plus ShadowHand
(inhand reorientation, 24 dof + free cube) with PPO.

Per entry: full-epoch env-steps/s (rollout + GAE + update + reset, one
XLA program, median over epochs after a compile warmup) and
rollout-scan-only steps/s (the physics-bound inner loop, timed by
re-jitting the scan in isolation).

Usage:
    python tools/bench_matrix.py [--robots point,swimmer,ant,walker,doggo,shadow]
        [--env_num 4000] [--epochs 4] [--profile DIR] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GUARD_ROBOTS = ("point", "swimmer", "ant", "walker", "doggo")


def bench_one(robot: str, env_num: int, epochs: int, profile_dir=None):
    import jax
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    if robot == "shadow":
        from guardx_tpu.envs.bench_tasks import NativeBenchEngine

        env = NativeBenchEngine(
            "ShadowHand", env_num=env_num, num_steps=64, seed=0
        )
        algo = REGISTRY["ppo"](target_cost=0.0, target_kl=0.02)
        T = 64
    elif robot == "humanoid_amp":
        from guardx_tpu.envs.bench_tasks import NativeBenchEngine

        env = NativeBenchEngine(
            "HumanoidAMP", env_num=env_num, num_steps=64, seed=0
        )
        algo = REGISTRY["ppo"](target_cost=0.0, target_kl=0.02)
        T = 64
    else:
        from guardx_tpu.envs import Engine

        env = Engine({
            "env_num": env_num, "num_steps": 200,
            "task": "goal", "goal_size": 0.5,
            "robot_base": f"xmls/{robot}.xml",
            "hazards_num": 8, "hazards_size": 0.3,
            "constrain_hazards": True, "constrain_indicator": False,
            "_seed": 0,
            "gx_pool_refresh_every": 8,
        })
        algo = REGISTRY["cpo"](target_cost=0.0, target_kl=0.02)
        T = 200

    trainer = Trainer(env, algo, seed=0, epochs=epochs + 1)

    t_c0 = time.time()
    trainer.run_epoch(0)  # compile + first run
    compile_s = time.time() - t_c0

    times = []
    for e in range(1, epochs + 1):
        m = trainer.run_epoch(e)
        times.append(m["TEpoch"])
    ep_s = float(np.median(times))
    sps = env_num * T / ep_s

    # rollout-scan-only timing: the physics-bound inner loop in isolation.
    # The returned scalar folds in every batch leaf so XLA cannot
    # dead-code-eliminate any part of the rollout.
    import jax.numpy as jnp

    def _rollout_probe(rs):
        rs2, batch, acc = trainer._rollout(rs, 0.5)
        s = sum(jnp.sum(v) for v in batch.values()
                if jnp.issubdtype(v.dtype, jnp.floating))
        return s + jnp.sum(rs2.obs)

    rollout_jit = jax.jit(_rollout_probe)
    rollout_jit(trainer.state).block_until_ready()
    t0 = time.time()
    rollout_jit(trainer.state).block_until_ready()
    rollout_s = time.time() - t0

    if profile_dir:
        from guardx_tpu.utils.profiling import trace

        with trace(f"{profile_dir}/{robot}"):
            trainer.run_epoch(epochs + 1)

    return {
        "robot": robot,
        "algo": "ppo" if robot in ("shadow", "humanoid_amp") else "cpo",
        "env_num": env_num,
        "T": T,
        "epoch_s": round(ep_s, 4),
        "rollout_s": round(rollout_s, 4),
        "steps_per_sec": round(sps, 1),
        "rollout_steps_per_sec": round(env_num * T / rollout_s, 1),
        "compile_s": round(compile_s, 1),
        "nq": int(env.model.nq) if hasattr(env, "model") else None,
        "nv": int(env.model.nv) if hasattr(env, "model") else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--robots", type=str,
                   default="point,swimmer,ant,walker,doggo,shadow")
    p.add_argument("--env_num", type=int, default=4000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--profile", type=str, default=None)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()

    rows = []
    for robot in args.robots.split(","):
        r = bench_one(robot.strip(), args.env_num, args.epochs,
                      args.profile)
        rows.append(r)
        print(json.dumps(r), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)

    # markdown table for PERF.md
    print("\n| robot | algo | env_num | nq/nv | epoch s | steps/s "
          "| rollout-only steps/s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['robot']} | {r['algo']} | {r['env_num']} "
              f"| {r['nq']}/{r['nv']} | {r['epoch_s']} "
              f"| {r['steps_per_sec']:,.0f} "
              f"| {r['rollout_steps_per_sec']:,.0f} |")


if __name__ == "__main__":
    main()
