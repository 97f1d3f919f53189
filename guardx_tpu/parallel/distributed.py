"""Multi-host bootstrap + global statistics.

TPU-native replacement for the reference's mpi4py layer
(safe_rl_libX/guard_utils/mpi_tools.py, mpi_pytorch.py):

- ``mpi_fork`` + mpirun re-exec (mpi_tools.py:6-36)  ->  ``init_distributed``
  (jax.distributed.initialize; each host is launched by the cluster
  scheduler, not re-exec'd).
- ``seed += 10000 * proc_id()`` (cpo/cpo.py:340)  ->  ``host_seed`` folds the
  process index into the root PRNG key, so env sharding stays decorrelated
  across hosts while the global experiment stays reproducible.
- ``mpi_avg_grads`` / ``sync_params`` (mpi_pytorch.py:20-35)  ->  nothing:
  under GSPMD the gradient mean over the sharded (T*B) axis IS the psum
  collective, and replicated params never diverge.
- ``mpi_statistics_scalar`` (mpi_tools.py:70-92)  ->  ``global_stats``
  (inside shard_map / pmapped code) or plain jnp reductions under GSPMD jit
  (XLA inserts the collectives).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


#: Environment variables whose presence marks a managed multi-host launch
#: (TPU pod metadata / generic JAX coordinator / SLURM / OMPI).
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize JAX's multi-host runtime (no-op on a single host).

    Must be called BEFORE any API that touches the backend
    (``jax.devices()``, ``jax.process_count()``, array creation, ...): the
    first backend query freezes the process topology, after which
    ``jax.distributed.initialize`` can no longer take effect. For that
    reason this function never queries the backend itself — it checks
    ``jax.distributed.is_initialized()``, which only reads the
    coordination-service state.

    With explicit arguments (manual bring-up, e.g. the 2-process CPU test)
    initialization failures propagate. With no arguments, the cluster
    topology is auto-discovered from the environment on managed launches
    (TPU pods, SLURM, OMPI); on a plain single-host run there is nothing to
    discover and this returns without touching JAX at all.

    (Mirrors the role of mpi_fork at mpi_tools.py:6-36, minus the re-exec:
    hosts are launched externally by the cluster scheduler.)
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        # managed multi-host launch: auto-discovery must succeed — a
        # swallowed failure here would silently train on 1/N of the pod
        jax.distributed.initialize()


def host_seed(rng_or_seed):
    """Per-host decorrelated PRNG key (reference: seed += 10000*proc_id(),
    cpo/cpo.py:340). Accepts an int seed or a PRNGKey."""
    key = (
        jax.random.PRNGKey(rng_or_seed)
        if isinstance(rng_or_seed, int)
        else rng_or_seed
    )
    return jax.random.fold_in(key, jax.process_index())


def global_stats(x, axis_name: str | None = None):
    """Global (mean, std, n) of a possibly-sharded array — the device-side
    equivalent of mpi_statistics_scalar (mpi_tools.py:70-92).

    Inside shard_map-decorated code pass the mesh axis name and the local
    shard; under GSPMD jit leave axis_name=None and XLA handles the
    cross-device reduction of the plain jnp ops.
    """
    x = jnp.asarray(x, jnp.float32)
    if axis_name is None:
        n = jnp.float32(x.size)
        s = jnp.sum(x)
        sq = jnp.sum(x * x)
    else:
        n = jax.lax.psum(jnp.float32(x.size), axis_name)
        s = jax.lax.psum(jnp.sum(x), axis_name)
        sq = jax.lax.psum(jnp.sum(x * x), axis_name)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    return mean, jnp.sqrt(var), n
