"""Device mesh + sharding rules for the training state.

Replaces the reference's mpi4py data parallelism (guard_utils/mpi_tools.py,
mpi_pytorch.py): instead of process forking + CPU allreduce of torch grads,
the env batch axis is sharded over a 1-D 'dp' mesh and the jitted epoch is
partitioned by GSPMD — the full-batch loss/gradient means over the (T*B)
axis become psum collectives over ICI automatically, and parameters stay
replicated by construction (no sync_params needed).

Multi-host: call jax.distributed.initialize() before building the mesh; the
same code paths then span hosts (dp over all global devices).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D 'dp' mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dp",))


def state_shardings(mesh: Mesh, state, batch_size: int):
    """Sharding pytree for a RunnerState: leaves with leading dim ==
    batch_size are sharded over 'dp'; everything else (params, optimizer
    state, layout pool, scalars) is replicated."""
    shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def rule(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == batch_size:
            return shard
        return repl

    return jax.tree_util.tree_map(rule, state)
