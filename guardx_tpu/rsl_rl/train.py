"""Train an RL agent with the RSL-RL runner surface.

Rebuild of the reference entry script (safe_rl_libX/rsl_rl/train.py:48,105):
same CLI (--task/--num_envs/--seed/--max_iterations + cli_args RSL-RL
flags), same flow (make env -> OnPolicyRunner -> learn). On a TPU host the
Isaac Lab stack is absent, so Isaac task ids resolve to the native bench
tasks (guardx_tpu.rsl_rl.resolve_task); if an Isaac Lab install IS present
(GPU host), the original external path is used via ExternalEnvWrapper.

    python -m guardx_tpu.rsl_rl.train --task Isaac-Velocity-Rough-Anymal-C-v0 \
        --num_envs 1024 --max_iterations 300
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def get_parser():
    from guardx_tpu.rsl_rl import cli_args

    parser = argparse.ArgumentParser(
        description="Train an RL agent with RSL-RL."
    )
    parser.add_argument("--video", action="store_true", default=False)
    parser.add_argument("--video_length", type=int, default=200)
    parser.add_argument("--video_interval", type=int, default=2000)
    parser.add_argument("--cpu", action="store_true", default=False)
    parser.add_argument("--disable_fabric", action="store_true", default=False)
    parser.add_argument("--num_envs", type=int, default=256)
    parser.add_argument("--task", type=str, default="Cartpole")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_iterations", type=int, default=100)
    parser.add_argument("--max_ep_len", type=int, default=500)
    cli_args.add_rsl_rl_args(parser)
    return parser


def make_env(args):
    """Isaac Lab env when the stack exists, else the native bench task."""
    try:  # pragma: no cover - exercised only on Isaac hosts
        import gymnasium as gym
        from omni.isaac.lab.app import AppLauncher  # noqa: F401

        from guardx_tpu.envs.wrappers import IsaacLabWrapper

        env = gym.make(args.task)
        return IsaacLabWrapper(env)
    except ImportError:
        pass
    from guardx_tpu.rsl_rl import resolve_task
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine

    native = resolve_task(args.task)
    if native is None:
        raise SystemExit(
            f"task '{args.task}' has no native TPU implementation and the "
            "Isaac Lab stack is not installed"
        )
    return NativeBenchEngine(
        native, env_num=args.num_envs, num_steps=args.max_ep_len,
        seed=args.seed,
    )


def resolve_checkpoint(log_root, load_run, load_checkpoint=None):
    """Resolve the reference rsl_rl resume convention: --load_run names a
    run DIRECTORY under the experiment root (not a file), and the model
    file inside it is chosen by --checkpoint (default: latest model_*.pkl).
    A direct file path is also accepted."""
    if os.path.isfile(load_run):
        return load_run
    run_dir = (load_run if os.path.isdir(load_run)
               else os.path.join(log_root, load_run))
    if not os.path.isdir(run_dir):
        raise SystemExit(
            f"--load_run '{load_run}' is neither a checkpoint file nor a "
            f"run directory under {log_root}"
        )
    if load_checkpoint:
        path = os.path.join(run_dir, load_checkpoint)
        if not os.path.isfile(path):
            raise SystemExit(f"checkpoint '{load_checkpoint}' not found "
                             f"in {run_dir}")
        return path
    import glob as _glob

    models = sorted(
        _glob.glob(os.path.join(run_dir, "model_*.pkl")),
        key=lambda p: int(os.path.basename(p)[6:-4]),
    )
    if not models:
        raise SystemExit(f"no model_*.pkl checkpoints in {run_dir}")
    return models[-1]


def main(argv=None):
    from guardx_tpu.rsl_rl import OnPolicyRunner, cli_args

    args = get_parser().parse_args(argv)
    env = make_env(args)
    agent_cfg = cli_args.parse_rsl_rl_cfg(args.task, args)

    log_root = os.path.abspath(
        os.path.join("logs", "rsl_rl", agent_cfg["experiment_name"])
    )
    log_dir = os.path.join(
        log_root, datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    )
    print(f"[INFO] Logging experiment in directory: {log_root}")

    runner = OnPolicyRunner(env, agent_cfg, log_dir=log_dir)
    if agent_cfg.get("resume") and agent_cfg.get("load_run"):
        runner.load(resolve_checkpoint(
            log_root, agent_cfg["load_run"], agent_cfg.get("load_checkpoint")
        ))
    metrics = runner.learn(num_learning_iterations=args.max_iterations)
    runner.save(os.path.join(log_dir, f"model_{runner.it}.pkl"))
    print({k: float(v) for k, v in (metrics or {}).items()
           if k in ("EpRet", "EpLen", "KL")})
    return metrics


if __name__ == "__main__":
    main()
