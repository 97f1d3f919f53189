"""Run the ACTUAL reference trainers (torch, CPU) on the host-physics
reference engine, for side-by-side validation against the native
guardx_tpu trainers (VERDICT.md round-3 "Weak #2": USL / SafetyLayer /
PDO evidence).

The reference trainer scripts (/root/reference/safe_rl_libX/{pdo,usl,
safelayer,trpo}/) are imported UNMODIFIED and their trainer functions
invoked exactly as their own __main__ blocks do (same defaults, e.g.
usl.py:210-213, pdo.py:644-700 with the reference-default nu_alpha=0.05 /
nu_init=0.1), with three environment substitutions this image forces:

- `mpi4py` is absent -> a single-process stub (size 1, rank 0; Allreduce
  = copy) standing in for utils/mpi_tools.py's COMM_WORLD use
- `utils.*` resolves to the legacy /root/reference/safe_rl_lib/utils
  package (the reference's own intended resolution: trainers
  sys.path.append('..') and import utils.logx — SURVEY.md L6 notes this
  only works with safe_rl_lib on PYTHONPATH)
- `utils.safe_rl_env_config.create_env` is replaced by
  tools/ref_host_engine.HostRefEngine — the reference engine's own
  layout/obs/reward/cost code on host-MuJoCo physics (mjx is absent)

torch device resolves to CPU via the trainers' own
`torch.device("cuda:0" if available else "cpu")` (pdo.py:19).

Usage:
    python tools/run_ref_sidebyside.py <algo> [env_num] [epochs] [seed]
with algo in {trpo, pdo, usl, safelayer}. Logs land under
logs/ref_sidebyside/<exp_name>/.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
LIBX = os.path.join(REF, "safe_rl_libX")
LEGACY_UTILS = os.path.join(REF, "safe_rl_lib", "utils")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def install_mpi_stub():
    """Fake single-process mpi4py: exactly what utils/mpi_tools.py calls."""
    if "mpi4py" in sys.modules:
        return
    mpi4py = types.ModuleType("mpi4py")

    class _Op:
        pass

    class _Comm:
        def Get_size(self):
            return 1

        def Get_rank(self):
            return 0

        def Allreduce(self, src, dst, op=None):
            np.copyto(dst, src)

        def Bcast(self, buf, root=0):
            pass

    MPI = types.ModuleType("mpi4py.MPI")
    MPI.COMM_WORLD = _Comm()
    MPI.SUM = _Op()
    MPI.MIN = _Op()
    MPI.MAX = _Op()
    mpi4py.MPI = MPI
    sys.modules["mpi4py"] = mpi4py
    sys.modules["mpi4py.MPI"] = MPI


def install_utils_pkg():
    """`utils` -> legacy safe_rl_lib/utils (no __init__.py there; synthesize
    the package), with safe_rl_env_config.create_env stubbed out."""
    if "utils" in sys.modules:
        return
    pkg = types.ModuleType("utils")
    pkg.__path__ = [LEGACY_UTILS]
    sys.modules["utils"] = pkg

    cfg = types.ModuleType("utils.safe_rl_env_config")

    def create_env(args):
        raise RuntimeError("side-by-side drives env_fn directly")

    cfg.create_env = create_env
    cfg.configuration = lambda task: (_ for _ in ()).throw(
        RuntimeError("unused"))
    sys.modules["utils.safe_rl_env_config"] = cfg


def load_trainer(algo):
    """Import /root/reference/safe_rl_libX/<algo>/<algo>.py unmodified."""
    import importlib.util

    algo_dir = os.path.join(LIBX, algo)
    sys.path.insert(0, algo_dir)  # `import <algo>_core as core`
    spec = importlib.util.spec_from_file_location(
        f"ref_{algo}", os.path.join(algo_dir, f"{algo}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref_{algo}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    algo = sys.argv[1] if len(sys.argv) > 1 else "pdo"
    env_num = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    max_ep_len = 200
    target_kl = 0.02

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ref_shims import install_shims

    install_shims()
    # `from gym.spaces import Box` (pdo_core.py:3) needs the submodule
    # registered, not just the attribute
    import gymnasium

    sys.modules.setdefault("gym.spaces", gymnasium.spaces)
    install_mpi_stub()
    install_utils_pkg()

    from ref_host_engine import HostRefEngine

    import torch

    torch.set_num_threads(2)

    trainer = load_trainer(algo)

    exp_name = (f"Goal_Point_8Hazards_ref_{algo}_kl{target_kl}"
                f"_epochs{epochs}_step{max_ep_len * env_num}")
    logger_kwargs = dict(
        output_dir=os.path.join(REPO, "logs", "ref_sidebyside", exp_name,
                                f"{exp_name}_s{seed}"),
        exp_name=exp_name,
    )

    def env_fn():
        return HostRefEngine(env_num=env_num, num_steps=max_ep_len,
                             seed=seed)

    core = sys.modules[f"ref_{algo}"].core if hasattr(
        sys.modules[f"ref_{algo}"], "core") else None
    common = dict(
        actor_critic=core.MLPActorCritic,
        ac_kwargs=dict(hidden_sizes=[64] * 2),
        gamma=0.99, seed=seed, env_num=env_num,
        max_ep_len=max_ep_len, epochs=epochs,
        logger_kwargs=logger_kwargs, model_save=False,
        target_kl=target_kl,
    )
    if algo == "pdo":
        # reference CLI defaults: pdo.py:649-656 (target_cost 0.0,
        # nu_init 0.1, nu_alpha 0.05, cost_reduction 0.0)
        trainer.pdo(env_fn, target_cost=0.0, nu_init=0.1, nu_alpha=0.05,
                    cost_reduction=0.0, **common)
    elif algo == "usl":
        trainer.usl(env_fn, **common)
    elif algo == "safelayer":
        trainer.safelayer(env_fn, **common)
    elif algo == "trpo":
        trainer.trpo(env_fn, **common)
    else:
        raise SystemExit(f"unknown algo {algo}")


if __name__ == "__main__":
    main()
