"""Headline benchmark: CPO on Goal_Point_8Hazards + articulated aggregate.

Measures steady-state env-steps/s on one chip for the reference's
suite-scale constrained workload (env_num=4000-16384, max_ep_len=200 —
/root/reference/safe_rl_libX/run.py:80-90, cpo/cpo.py:726-750) running the
complete training epoch (rollout + GAE + CPO trust-region update + reset)
as one XLA program.

Two workloads in one JSON line (VERDICT r4 #4 — the headline alone only
exercised the planar-3dof fast path, leaving the general FK/CRBA/contact
physics invisible to the round-over-round record):
  - value: the Goal_Point headline at 16k envs (comparable to r1-r4)
  - articulated_geomean_steps_per_sec: geometric mean of full-epoch CPO
    env-steps/s over {ant, walker, doggo} at the reference's suite scale
    (env_num=4000), the path the lane-major Pallas substep kernel serves.

vs_baseline is the fraction of the per-chip north-star from BASELINE.json:
10M aggregate env-steps/s on a v5e-16 => 625k env-steps/s per chip. (The
reference publishes no quantitative numbers — BASELINE.md.)
"""

import json
import sys
import time

PER_CHIP_TARGET = 10_000_000 / 16  # BASELINE.json north-star, v5e-16

ARTICULATED = ("ant", "walker", "doggo")


def _bench_epochs(env, algo_name, epochs, seed=0):
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    algo = REGISTRY[algo_name](target_cost=0.0, target_kl=0.02)
    trainer = Trainer(env, algo, seed=seed, epochs=epochs)
    trainer.run_epoch(0)  # warmup: compile + first execute
    t0 = time.time()
    steps = 0
    for e in range(1, epochs + 1):
        trainer.run_epoch(e)
        steps += trainer.B * trainer.T
    return steps / (time.time() - t0)


def _guard_env(robot, env_num, pool_refresh):
    from guardx_tpu.envs import Engine

    cfg = {
        'env_num': env_num, 'num_steps': 200,
        'task': 'goal', 'goal_size': 0.5,
        'hazards_num': 8, 'hazards_size': 0.3,
        'constrain_hazards': True, 'constrain_indicator': False,
        '_seed': 0,
        # production-tuned: reuse the 2x-env_num layout pool for 8 epochs
        # (validated within seed noise on the 200-epoch CPO milestone —
        # PERF.md; engine default stays 1 = reference parity)
        'gx_pool_refresh_every': pool_refresh,
    }
    if robot != 'point':
        cfg['robot_base'] = f'xmls/{robot}.xml'
    return Engine(cfg)


def main():
    # default 16384 envs: the BASELINE.json target scale ("8k+ envs") at
    # the batch size that best fills the chip (PERF.md scaling table)
    env_num = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    # 8 timed epochs = exactly one pool-refresh cycle, so the layout-pool
    # regeneration cost is honestly amortized into the number
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sps = _bench_epochs(_guard_env('point', env_num, 8), 'cpo', epochs)

    out = {
        "metric": "env_steps_per_sec_cpo_goal_point",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / PER_CHIP_TARGET, 4),
    }

    # articulated aggregate at suite scale — skipped for smoke runs
    # (env_num < 1024, e.g. the verify recipe's `bench.py 256 2`)
    if env_num >= 1024:
        art = {}
        for robot in ARTICULATED:
            art[robot] = round(
                _bench_epochs(_guard_env(robot, 4000, 8), 'cpo', 3), 1)
        geo = 1.0
        for v in art.values():
            geo *= v
        geo **= 1.0 / len(art)
        out["articulated_geomean_steps_per_sec"] = round(geo, 1)
        out["articulated"] = art
        out["articulated_vs_baseline"] = round(geo / PER_CHIP_TARGET, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
