"""Tests for the multi-host helpers (8-virtual-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from guardx_tpu.parallel import global_stats, host_seed, make_mesh
from jax.sharding import PartitionSpec as P
from jax import shard_map


def test_host_seed_single_process_deterministic():
    k1 = host_seed(0)
    k2 = host_seed(0)
    assert jnp.array_equal(k1, k2)
    assert not jnp.array_equal(host_seed(0), host_seed(1))


def test_global_stats_matches_numpy():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    mean, std, n = global_stats(jnp.asarray(x))
    np.testing.assert_allclose(float(mean), x.mean(), atol=1e-5)
    np.testing.assert_allclose(float(std), x.std(), atol=1e-5)
    assert int(n) == 1000


def test_global_stats_shard_map_psum():
    mesh = make_mesh(8)
    x = np.arange(64, dtype=np.float32)

    @jax.jit
    def f(x):
        def inner(xs):
            m, s, n = global_stats(xs, axis_name="dp")
            return jnp.stack([m, s, n])

        return shard_map(
            inner, mesh=mesh, in_specs=P("dp"), out_specs=P()
        )(x)

    m, s, n = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(m, x.mean(), rtol=1e-5)
    np.testing.assert_allclose(s, x.std(), rtol=1e-5)
    assert n == 64
