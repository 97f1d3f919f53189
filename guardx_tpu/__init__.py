"""guardx_tpu: a TPU-native safe reinforcement-learning framework.

A from-scratch rebuild of the capabilities of intelligent-control-lab/guardX
(reference: /root/reference) designed TPU-first:

- ``guardx_tpu.physics``  — batched rigid-body physics engine in pure JAX
  (replaces the reference's dependency on MuJoCo MJX; reference usage at
  safe_rl_envs/safe_rl_envs/envs/engine.py:231-232).
- ``guardx_tpu.envs``     — the GUARD safety-constrained environment engine
  (goal tasks, hazards, pseudo-lidar; reference engine.py:84-1070) as pure
  functional jit/vmap-able step/reset kernels.
- ``guardx_tpu.algos``    — the safe-RL trainer suite (TRPO/CPO/PCPO/PDO/
  TRPO-Lagrangian/FAC/IPO/SCPO/USL/SafetyLayer/LPG/PPO/A2C/APO/...;
  reference safe_rl_libX/*) as pure JAX updates over a shared
  trust-region core, fully jitted end to end.
- ``guardx_tpu.parallel`` — jax.sharding Mesh / shard_map scaling of the
  env batch and psum gradient reduction (replaces mpi4py;
  reference guard_utils/mpi_tools.py).
- ``guardx_tpu.utils``    — EpochLogger-compatible logging, config registry,
  checkpointing, plotting.
"""

__version__ = "0.1.0"

import os as _os

# Backend override: GUARDX_PLATFORM=cpu forces the CPU backend even when a
# site customization pins JAX_PLATFORMS (the axon TPU tunnel does; plain
# env vars cannot override it — jax.config wins as long as the backend is
# not initialized yet).
if _os.environ.get("GUARDX_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["GUARDX_PLATFORM"])
    except Exception:
        pass

# persistent XLA compilation cache: TPU compiles of the jitted epoch are
# expensive (tens of seconds); cache them across processes. Opt out with
# GUARDX_NO_COMPILE_CACHE=1.
if not _os.environ.get("GUARDX_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache = _os.environ.get(
        "GUARDX_COMPILE_CACHE", _os.path.expanduser("~/.cache/guardx_jax")
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
