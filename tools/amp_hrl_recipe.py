"""AMP-pretrain -> freeze LLC -> HRL steering recipe.

The reference pipeline (IsaacGymEnvs/isaacgymenvs/learning/):
amp_continuous.py trains a low-level controller whose gait is shaped by a
motion-prior discriminator; hrl_continuous.py then trains a high-level
policy whose actions are LATENTS consumed by the frozen LLC. This script
is that pipeline end-to-end on the TPU-native stack:

Phase A (LLC): AMP on AnymalTerrain — command-conditioned locomotion
  (obs = proprioception ++ velocity commands) with the doggo-trot demo
  clip (tools/make_demo_clip.py) as the style prior. The trained policy
  IS a command-conditional stylized walker.

Phase B (HRL): the high-level policy acts on Goal_Doggo_8Hazards; its
  3-dim latent is the velocity command fed to the frozen LLC. The LLC's
  input is assembled from the GUARD observation's qpos/qvel slices (the
  same proprioception AnymalTerrain exposes) plus the latent.

Writes both runs under logs/ (progress.txt: Phase A's StyleReward rising
is the "demo data in, stylized gait out" evidence; Phase B's EpRet is the
steering evidence).

Usage:  python tools/amp_hrl_recipe.py [--epochs_llc 80] [--epochs_hrl 60]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phase_a(args):
    """AMP LLC on AnymalTerrain with the trot demo. Returns (nets,
    pi_params, llc_env) of the trained controller."""
    from guardx_tpu.train import get_parser, run

    demo = os.path.join("tests", "golden", "doggo_trot_pairs.npz")
    if not os.path.exists(demo):
        from tools.make_demo_clip import main as make_clip

        make_clip([])
    targv = [
        "--algo", "amp", "--task", "AnymalTerrain",
        "--env_num", str(args.env_num), "--max_ep_len", str(args.max_ep_len),
        "--epochs", str(args.epochs_llc), "--seed", str(args.seed),
        "--amp_demos", demo, "--exp_name", "amp_llc", "--model_save",
    ]
    a = get_parser().parse_args(targv)
    metrics = run(a)
    print("Phase A final:", {k: round(float(v), 4) for k, v in metrics.items()
                             if k in ("EpRet", "StyleReward", "LossDisc")})
    return a


def phase_b(args, llc_args):
    """HRL on Goal_Doggo_8Hazards steering the frozen Phase-A LLC."""
    import glob
    import joblib
    import jax.numpy as jnp

    from guardx_tpu.algos.base import Networks
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.envs.registry import create_env
    from guardx_tpu.envs.bench_tasks import NativeBenchEngine
    from guardx_tpu.utils.logx import EpochLogger, setup_logger_kwargs
    from guardx_tpu.utils import motion

    # frozen LLC params from Phase A's model save
    from guardx_tpu.train import make_exp_name

    run_dir = sorted(glob.glob(os.path.join(
        "logs", make_exp_name(llc_args), "*", "jax_save", "model.pkl"
    )))[-1]
    model = joblib.load(run_dir)
    llc_pi = model.pi if hasattr(model, "pi") else model["pi"]

    # LLC network shape mirrors Phase A's Trainer (Networks defaults)
    llc_env = NativeBenchEngine("AnymalTerrain", env_num=1, num_steps=8)
    llc_nets = Networks(llc_env.obs_flat_size, llc_env.action_space.shape[0])

    class _A:  # GUARD goal task for the high-level policy
        task = "Goal_Doggo_8Hazards"
        env_num = args.env_num
        seed = args.seed
        max_ep_len = args.max_ep_len
        pool_refresh = 8

    env = create_env(_A())

    # proprioception slices of the GUARD obs -> LLC obs (qpos[2:] ++ qvel
    # ++ latent command), matching AnymalTerrain's observation layout
    offs, i = {}, 0
    for k in sorted(env.obs_space_dict.keys()):
        offs[k] = i
        i += int(np.prod(env.obs_space_dict[k].shape))
    nq, nv = env.robot.nq, env.robot.nv
    qpos_idx = np.arange(offs["qpos"] + 2, offs["qpos"] + nq)
    qvel_idx = np.arange(offs["qvel"], offs["qvel"] + nv)
    prop_idx = jnp.asarray(np.concatenate([qpos_idx, qvel_idx]), jnp.int32)

    def llc_apply(params, obs, z):
        llc_obs = jnp.concatenate([obs[..., prop_idx], z], axis=-1)
        mu, _ = llc_nets.pi_apply(params, llc_obs)
        return mu  # deterministic frozen LLC (hrl_continuous.py semantics)

    algo = REGISTRY["hrl"](
        llc_apply=llc_apply, llc_params=llc_pi, latent_dim=3,
        target_kl=0.02,
    )
    logger_kwargs = setup_logger_kwargs(
        f"Goal_Doggo_8Hazards_hrl_epochs{args.epochs_hrl}", args.seed
    )
    logger = EpochLogger(**logger_kwargs)
    trainer = Trainer(env, algo, seed=args.seed, epochs=args.epochs_hrl)
    for epoch in range(args.epochs_hrl):
        m = trainer.run_epoch(epoch)
        logger.log_tabular("Epoch", epoch)
        for k in ("EpRet", "EpCost", "EpLen", "KL", "Entropy", "TEpoch"):
            if k in m:
                logger.log_tabular(k, m[k])
        logger.dump_tabular()
    print("Phase B final EpRet:", m["EpRet"])
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--env_num", type=int, default=512)
    ap.add_argument("--max_ep_len", type=int, default=200)
    ap.add_argument("--epochs_llc", type=int, default=80)
    ap.add_argument("--epochs_hrl", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_a", action="store_true",
                    help="reuse an existing Phase-A run")
    args = ap.parse_args(argv)

    llc_args = phase_a(args) if not args.skip_a else None
    if llc_args is None:
        from guardx_tpu.train import get_parser

        llc_args = get_parser().parse_args([
            "--algo", "amp", "--task", "AnymalTerrain",
            "--env_num", str(args.env_num),
            "--max_ep_len", str(args.max_ep_len),
            "--epochs", str(args.epochs_llc), "--seed", str(args.seed),
            "--exp_name", "amp_llc",
        ])
    phase_b(args, llc_args)


if __name__ == "__main__":
    main()
