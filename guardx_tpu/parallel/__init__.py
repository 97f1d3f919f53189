"""Multi-chip scaling: jax.sharding Mesh over the env batch axis."""

from guardx_tpu.parallel.mesh import make_mesh, state_shardings
from guardx_tpu.parallel.distributed import (
    init_distributed,
    host_seed,
    global_stats,
)

__all__ = [
    "make_mesh",
    "state_shardings",
    "init_distributed",
    "host_seed",
    "global_stats",
]
