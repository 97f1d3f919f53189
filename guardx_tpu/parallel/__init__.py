"""Multi-chip scaling: jax.sharding Mesh over the env batch axis."""

from guardx_tpu.parallel.mesh import make_mesh, state_shardings

__all__ = ["make_mesh", "state_shardings"]
