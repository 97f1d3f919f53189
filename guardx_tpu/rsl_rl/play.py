"""Replay a trained RSL-RL policy (reference: safe_rl_libX/rsl_rl/play.py —
load checkpoint, run the inference policy in the env, optionally export).

    python -m guardx_tpu.rsl_rl.play --task Cartpole --checkpoint model_100.pkl
"""

from __future__ import annotations

import numpy as np


def main(argv=None):
    from guardx_tpu.rsl_rl.train import get_parser, make_env
    from guardx_tpu.rsl_rl import OnPolicyRunner

    parser = get_parser()
    parser.add_argument("--steps", type=int, default=200)
    args = parser.parse_args(argv)
    env = make_env(args)
    runner = OnPolicyRunner(env, {"seed": args.seed})
    if args.checkpoint:
        runner.load(args.checkpoint)
    policy = runner.get_inference_policy()

    obs = env.reset()
    total = np.zeros(env.env_num, np.float64)
    for _ in range(args.steps):
        act = policy(obs)
        obs, rew, done, info = env.step(act)
        total += np.asarray(rew, np.float64)
        env.reset_done()
    print(f"mean return over {args.steps} steps: {float(total.mean()):.3f}")
    return float(total.mean())


if __name__ == "__main__":
    main()
