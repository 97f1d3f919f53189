"""Unified training CLI: every algorithm, every GUARD task, one entry point.

Replaces the reference's 19 per-algorithm ``python <algo>.py`` scripts
(e.g. cpo/cpo.py:714-750): same flags (--task --target_cost --target_kl
--hid --l --gamma --seed --env_num --max_ep_len --epochs --exp_name
--model_save), same experiment-name convention
``<task>_<algo>_kl<·>_target_cost<·>_epochs<·>_step<·>``, same log-dir
layout ``./logs/<exp>/<exp>_s<seed>/`` with progress.txt + config.json,
plus what the reference lacks: ``--algo`` selection, ``--resume`` from the
orbax checkpoint, ``--mesh`` data-parallel sharding over all local devices,
and ``--one_episode`` (the reference forks whole ``*_one_episode/``
directories for that — SURVEY.md §2.2).

Usage:
    python -m guardx_tpu.train --algo cpo --task Goal_Point_8Hazards \
        --env_num 1200 --max_ep_len 200 --epochs 100
"""

from __future__ import annotations

import argparse
import os
import time


def get_parser() -> argparse.ArgumentParser:
    """CLI surface (reference cpo/cpo.py:714-731 + extensions)."""
    parser = argparse.ArgumentParser()
    parser.add_argument('--algo', type=str, default='cpo',
                        help='algorithm name (see guardx_tpu.algos REGISTRY)')
    parser.add_argument('--task', type=str, default='Goal_Point_8Hazards')
    parser.add_argument('--target_cost', type=float, default=0.0)
    parser.add_argument('--target_kl', type=float, default=0.02)
    parser.add_argument('--cost_reduction', type=float, default=0.0)
    parser.add_argument('--hid', type=int, default=64)
    parser.add_argument('--l', type=int, default=2)
    parser.add_argument('--gamma', type=float, default=0.99)
    parser.add_argument('--lam', type=float, default=0.97)
    parser.add_argument('--seed', '-s', type=int, default=0)
    parser.add_argument('--env_num', type=int, default=1200)
    parser.add_argument('--max_ep_len', type=int, default=200)
    parser.add_argument('--epochs', type=int, default=100)
    parser.add_argument('--exp_name', type=str, default=None,
                        help='defaults to the algo name (reference behavior)')
    parser.add_argument('--model_save', action='store_true')
    parser.add_argument('--save_freq', type=int, default=10)
    parser.add_argument('--continuous', action='store_true',
                        help='continuous rollouts: env state persists '
                             'across epochs, fragment ends are value-'
                             'bootstrapped (rl_games horizon semantics); '
                             'pair with --rollout_horizon')
    parser.add_argument('--rollout_horizon', type=int, default=None,
                        help='rollout fragment length per update (default: '
                             'max_ep_len); decouples the update cadence '
                             'from the episode time limit')
    parser.add_argument('--layout_pool', type=int, default=None,
                        help='layout-pool candidate count (default: auto '
                             'from env_num; raise for tasks with many scene '
                             'objects where rejection acceptance is low, '
                             'e.g. Push/Defense)')
    parser.add_argument('--pool_refresh', type=int, default=None,
                        help='regenerate the layout pool every N epochs '
                             '(default 1 = reference behavior)')
    parser.add_argument('--amp_demos', type=str, default=None,
                        help='npz with an (N, 2, obs_dim) "pairs" array of '
                             'demo transitions (required for --algo amp on '
                             'tasks without a motion library)')
    parser.add_argument('--amp_motions', type=str, default=None,
                        help='comma-separated mocap clips for HumanoidAMP '
                             '(clip names like "walk,run" resolve to the '
                             'reference-shipped poselib .npy files, or give '
                             'paths); default walk,run')
    parser.add_argument('--one_episode', action='store_true',
                        help='one-episode-per-env epochs (the reference\'s '
                             '*_one_episode variants)')
    parser.add_argument('--recurrent', action='store_true',
                        help='LSTM actor-critic (auto-enabled for *LSTM '
                             'registry task names, the reference\'s '
                             'rl_games LSTM workloads)')
    parser.add_argument('--lstm', type=int, default=64,
                        help='LSTM hidden size for --recurrent')
    parser.add_argument('--algo_hp', type=str, default=None,
                        help='extra algorithm hyperparameters as '
                             'key=value[,key=value...] (numeric), e.g. '
                             '--algo_hp task_reward_w=0,disc_reward_w=1')
    parser.add_argument('--obs_norm', action='store_true',
                        help='running-mean-std observation normalization '
                             'for all network inputs (rl_games '
                             'normalize_input; the GUARD reference never '
                             'normalizes, so default off)')
    parser.add_argument('--log_std_init', type=float, default=-0.5,
                        help='initial policy log-std (reference GUARD '
                             'trainers: -0.5, cpo_core.py:118; rl_games '
                             'AMP configs: -2.9, HumanoidAMPPPO.yaml)')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the checkpoint in the log dir')
    parser.add_argument('--mesh', action='store_true',
                        help='shard the env axis over all local devices')
    parser.add_argument('--data_dir', type=str, default=None)
    parser.add_argument('--profile', action='store_true',
                        help='capture an xprof trace of epoch 1 into '
                             '<logdir>/trace')
    parser.add_argument('--debug_nans', action='store_true',
                        help='jax debug_nans/debug_infs (fail at the '
                             'producing op)')
    return parser


def make_exp_name(args) -> str:
    """Reference naming convention (cpo/cpo.py:735-739)."""
    exp = args.exp_name or args.algo
    return (f"{args.task}_{exp}"
            f"_kl{args.target_kl}"
            f"_target_cost{args.target_cost}"
            f"_epochs{args.epochs}"
            f"_step{args.max_ep_len * args.env_num}")


def run(args) -> dict:
    """Build env + algo + trainer from args and train. Returns the last
    epoch's metrics dict."""
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.envs.registry import create_env
    from guardx_tpu.utils import checkpoint as ckpt
    from guardx_tpu.utils.logx import EpochLogger, setup_logger_kwargs

    if args.algo not in REGISTRY:
        raise SystemExit(
            f"unknown algo '{args.algo}'; available: {sorted(REGISTRY)}"
        )

    logger_kwargs = setup_logger_kwargs(
        make_exp_name(args), args.seed, data_dir=args.data_dir
    )
    logger = EpochLogger(**logger_kwargs)

    env = create_env(args)
    algo_cls = REGISTRY[args.algo]
    algo_kw = dict(
        target_cost=args.target_cost, target_kl=args.target_kl,
        cost_reduction=args.cost_reduction, gamma=args.gamma, lam=args.lam,
    )
    if getattr(args, 'algo_hp', None):
        for kv in args.algo_hp.split(','):
            if '=' not in kv:
                raise SystemExit(
                    f"--algo_hp: malformed entry {kv!r} "
                    f"(expected key=value[,key=value...])"
                )
            k, v = kv.split('=', 1)
            k, v = k.strip(), v.strip()
            # int -> float -> bool -> string coercion so integer hps stay
            # ints and non-numeric values (names, tuples) pass through
            try:
                algo_kw[k] = int(v)
            except ValueError:
                try:
                    algo_kw[k] = float(v)
                except ValueError:
                    if v.lower() in ('true', 'false'):
                        algo_kw[k] = v.lower() == 'true'
                    else:
                        algo_kw[k] = v
    if args.algo == 'amp':
        import numpy as _np

        if not getattr(args, 'amp_demos', None) and hasattr(
            env, 'demo_amp_pairs'
        ):
            # HumanoidAMP: demo pairs come straight from the env's mocap
            # motion library (reference fetch_amp_obs_demo); the policy
            # observation IS the AMP feature space, so no feature_idx
            algo_kw['demos'] = env.demo_amp_pairs()
        elif not getattr(args, 'amp_demos', None):
            raise SystemExit(
                "--algo amp needs --amp_demos <file.npz> holding an "
                "(N, 2, F) 'pairs' array (tools/make_demo_clip.py for "
                "joint-feature clips, or amp.record_demo_transitions for "
                "whole-obs pairs)"
            )
        else:
            demos = _np.load(args.amp_demos)['pairs']
            algo_kw['demos'] = demos
            if demos.shape[-1] != env.obs_flat_size:
                # joint-feature demos (utils/motion.py): discriminate on
                # the matching joint slices of the observation
                from guardx_tpu.utils.motion import feature_indices

                idx = feature_indices(env)
                if demos.shape[-1] != idx.shape[0]:
                    raise SystemExit(
                        f"demo feature dim {demos.shape[-1]} matches "
                        f"neither the obs dim {env.obs_flat_size} nor the "
                        f"joint-feature dim {idx.shape[0]} for task "
                        f"{args.task}"
                    )
                algo_kw['feature_idx'] = idx
    algo = algo_cls(**algo_kw)
    if args.one_episode:
        algo.one_episode = True
    # config.json records the RESOLVED algorithm hyperparameters (nu/lam
    # learning rates, warmups, disc settings, ...), not just the CLI args —
    # the r3 PDO run's nu values were unrecoverable from its log dir
    # (VERDICT r3 weak #2)
    logger.save_config({
        **vars(args),
        'algo_hp': {
            k: v for k, v in sorted(algo.hp.items())
            if isinstance(v, (int, float, str, bool, tuple, list, type(None)))
        },
    })

    mesh = None
    if args.mesh:
        from guardx_tpu.parallel import make_mesh

        mesh = make_mesh()

    # the reference's *LSTM registry names ARE the recurrent-policy request
    # (rl_games LSTM configs, safe_rl_env_config.py:2455-2566)
    recurrent = bool(getattr(args, 'recurrent', False)) or 'LSTM' in args.task
    hidden = tuple([args.hid] * (args.l if not recurrent else max(args.l - 1, 1)))
    trainer = Trainer(
        env, algo, seed=args.seed, hidden_sizes=hidden,
        epochs=args.epochs, mesh=mesh,
        recurrent=recurrent, lstm_size=int(getattr(args, 'lstm', 64)),
        log_std_init=float(getattr(args, 'log_std_init', -0.5)),
        obs_norm=bool(getattr(args, 'obs_norm', False)),
        continuous=bool(getattr(args, 'continuous', False)),
        rollout_T=getattr(args, 'rollout_horizon', None),
    )
    logger.setup_model_saver(trainer.state.algo)

    # Automatic Domain Randomization loop (AllegroHandDextremeADR):
    # pin boundary-evaluator env groups before each epoch, expand/contract
    # the global DR bounds from their epoch returns after it
    # (guardx_tpu.envs.randomize.ADRManager; reference adr_vec_task.py)
    adr = None
    if getattr(env, 'adr_enabled', False):
        from guardx_tpu.envs.randomize import ADRManager

        adr = ADRManager(args.env_num, seed=args.seed)

    start_epoch = 0
    if args.resume and ckpt.has_checkpoint(logger.output_dir):
        trainer.state, start_epoch, trainer.total_steps = (
            ckpt.restore_checkpoint(logger.output_dir, trainer.state)
        )
        logger.log(f"Resumed from epoch {start_epoch}", 'yellow')

    if args.debug_nans:
        from guardx_tpu.utils.profiling import enable_nan_debug

        enable_nan_debug()

    metrics = {}
    start = time.time()
    for epoch in range(start_epoch, args.epochs):
        if adr is not None:
            trainer.state = trainer.state.replace(
                env_state=adr.before_epoch(trainer.state.env_state)
            )
        if args.profile and epoch == start_epoch + 1:
            # epoch 0 compiles; trace the first steady-state epoch
            from guardx_tpu.utils.profiling import trace

            with trace(os.path.join(logger.output_dir, 'trace')):
                metrics = trainer.run_epoch(epoch)
        else:
            metrics = trainer.run_epoch(epoch)
        if adr is not None:
            metrics.update(adr.after_epoch(metrics.pop('PerEnvRet')))

        # reference metric vocabulary + order (cpo/cpo.py:683-712)
        logger.log_tabular('Epoch', epoch)
        for key in ('EpRet', 'EpCost', 'EpCostRet', 'EpLen', 'EpMaxCost',
                    'MaxEpLenRet'):
            if key in metrics:
                logger.log_tabular(key, metrics[key])
        logger.log_tabular('CumulativeCost', metrics['CumulativeCost'])
        logger.log_tabular('CostRate', metrics['CostRate'])
        logger.log_tabular('VVals', metrics['VVals'])
        logger.log_tabular('TotalEnvInteracts', metrics['TotalEnvInteracts'])
        for key in sorted(metrics):
            if key not in ('EpRet', 'EpCost', 'EpCostRet', 'EpLen',
                           'EpMaxCost', 'MaxEpLenRet', 'CumulativeCost',
                           'CostRate', 'VVals', 'TotalEnvInteracts',
                           'TEpoch', 'StepsPerSec') and not hasattr(
                               metrics[key], 'ndim'):
                logger.log_tabular(key, metrics[key])
        logger.log_tabular('TEpoch', metrics['TEpoch'])
        logger.log_tabular('StepsPerSec', metrics['StepsPerSec'])
        logger.log_tabular('Time', time.time() - start)
        logger.dump_tabular()

        if args.model_save and (
            (epoch % args.save_freq == 0) or (epoch == args.epochs - 1)
        ):
            # obs_norm policies need the running obs statistics at replay
            # time (the nets were trained on normalized inputs); save them
            # next to the AlgoState (video.py handles both schemas)
            if args.obs_norm:
                logger.model_saver_elements = {
                    'algo': trainer.state.algo,
                    'obs_rms': trainer.state.obs_rms,
                }
            else:
                logger.model_saver_elements = trainer.state.algo
            logger.save_state({'total_steps': trainer.total_steps})
            ckpt.save_checkpoint(
                logger.output_dir, trainer.state, epoch + 1,
                trainer.total_steps,
            )
    return metrics


def main(argv=None):
    args = get_parser().parse_args(argv)
    run(args)


if __name__ == '__main__':
    main()
