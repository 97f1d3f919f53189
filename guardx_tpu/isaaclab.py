"""Isaac Lab PPO entry point (reference: safe_rl_libX/train.py:1-40 and
video.py — AppLauncher + isaaclabgym.make + ppo_runner.runner).

The reference builds an Isaac Lab (omniverse) env and hands it to the PPO
runner with GUARD's CLI. On a TPU host the omniverse stack cannot exist;
this entry keeps the identical CLI surface and flow, resolving the task to
a native bench env when Isaac Lab is absent (guardx_tpu.rsl_rl.resolve_task)
and using the IsaacLabWrapper when it is present.

    python -m guardx_tpu.isaaclab --task Isaac-Velocity-Flat-G1-v0 \
        --env_num 4096 --hid 128 --l 3 --max_ep_len 24 --epochs 1500 \
        --target_kl 0.01
"""

from __future__ import annotations


def get_parser():
    from guardx_tpu.train import get_parser as base_parser

    parser = base_parser()
    # reference train.py extra flags (video + fabric)
    parser.add_argument("--video", action="store_true", default=False)
    parser.add_argument("--video_length", type=int, default=200)
    parser.add_argument("--video_interval", type=int, default=2000)
    parser.add_argument("--disable_fabric", action="store_true",
                        default=False)
    parser.add_argument("--max_iterations", type=int, default=None)
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.algo = "ppo"

    # only the Isaac stack imports are allowed to fall through to the
    # native path — an ImportError raised inside the training run itself
    # must propagate (and the app must close), not silently retrain natively
    try:  # pragma: no cover - exercised only on Isaac hosts
        import gymnasium as isaaclabgym
        from omni.isaac.lab.app import AppLauncher
    except ImportError:
        isaaclabgym = None

    if isaaclabgym is not None:  # pragma: no cover - Isaac hosts only
        app_launcher = AppLauncher(args)
        simulation_app = app_launcher.app

        env_unwrapped = isaaclabgym.make(
            args.task, render_mode="rgb_array" if args.video else None
        )
        args.env_unwrapped = env_unwrapped
        from guardx_tpu.train import run

        try:
            return run(args)
        finally:
            simulation_app.close()

    from guardx_tpu.rsl_rl import resolve_task

    native = resolve_task(args.task)
    if native is None:
        raise SystemExit(
            f"task '{args.task}' has no native TPU implementation and the "
            "Isaac Lab stack is not installed"
        )
    args.task = native
    if args.max_iterations:
        args.epochs = args.max_iterations
    from guardx_tpu.train import run

    return run(args)


if __name__ == "__main__":
    main()
