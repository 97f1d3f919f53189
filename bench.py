"""Headline benchmark: CPO on Goal_Point_8Hazards, fully-jitted epochs.

Measures steady-state env-steps/s on one chip for the reference's
suite-scale constrained workload (env_num=4000, max_ep_len=200 —
/root/reference/safe_rl_libX/run.py:80-90, cpo/cpo.py:726-750) running the
complete training epoch (rollout + GAE + CPO trust-region update + reset)
as one XLA program.

Prints ONE JSON line. vs_baseline is the fraction of the per-chip
north-star from BASELINE.json: 10M aggregate env-steps/s on a v5e-16
=> 625k env-steps/s per chip. (The reference publishes no quantitative
numbers — BASELINE.md.)
"""

import json
import sys
import time

PER_CHIP_TARGET = 10_000_000 / 16  # BASELINE.json north-star, v5e-16


def main():
    # default 16384 envs: the BASELINE.json target scale ("8k+ envs") at
    # the batch size that best fills the chip (PERF.md scaling table);
    # whole run incl. compile ~70 s
    env_num = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    # 8 timed epochs = exactly one pool-refresh cycle, so the layout-pool
    # regeneration cost is honestly amortized into the number
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from guardx_tpu.envs import Engine
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    env = Engine({
        'env_num': env_num, 'num_steps': 200,
        'task': 'goal', 'goal_size': 0.5,
        'hazards_num': 8, 'hazards_size': 0.3,
        'constrain_hazards': True, 'constrain_indicator': False,
        '_seed': 0,
        # production-tuned: reuse the 2x-env_num layout pool for 8 epochs
        # (validated within seed noise on the 200-epoch CPO milestone —
        # PERF.md; engine default stays 1 = reference parity)
        'gx_pool_refresh_every': 8,
    })
    algo = REGISTRY['cpo'](target_cost=0.0, target_kl=0.02)
    trainer = Trainer(env, algo, seed=0, epochs=epochs)

    trainer.run_epoch(0)  # warmup: compile + first execute
    t0 = time.time()
    steps = 0
    for e in range(1, epochs + 1):
        m = trainer.run_epoch(e)
        steps += env_num * 200
    dt = time.time() - t0
    sps = steps / dt

    print(json.dumps({
        "metric": "env_steps_per_sec_cpo_goal_point",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
