"""RSL-RL CLI argument surface (reference: safe_rl_libX/rsl_rl/cli_args.py
add_rsl_rl_args/parse_rsl_rl_cfg): the same flag names, parsed into the
cfg dict guardx_tpu.rsl_rl.OnPolicyRunner consumes."""

from __future__ import annotations

import argparse

from guardx_tpu.rsl_rl import DEFAULT_CFG


def add_rsl_rl_args(parser: argparse.ArgumentParser):
    grp = parser.add_argument_group("rsl_rl", "RSL-RL agent arguments")
    grp.add_argument("--experiment_name", type=str, default=None)
    grp.add_argument("--run_name", type=str, default=None)
    grp.add_argument("--resume", action="store_true", default=False)
    grp.add_argument("--load_run", type=str, default=None)
    grp.add_argument("--checkpoint", type=str, default=None)
    grp.add_argument("--logger", type=str, default=None,
                     choices=[None, "tensorboard", "wandb", "neptune"])
    grp.add_argument("--log_project_name", type=str, default=None)
    return parser


def parse_rsl_rl_cfg(task_name: str, args) -> dict:
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in DEFAULT_CFG.items()}
    cfg["experiment_name"] = args.experiment_name or task_name
    if getattr(args, "seed", None) is not None:
        cfg["seed"] = args.seed
    cfg["resume"] = args.resume
    cfg["load_run"] = args.load_run
    cfg["load_checkpoint"] = args.checkpoint
    return cfg
