"""Unit tests for guardx_tpu.ops: tiny Cholesky and the Pallas GAE kernel
(interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guardx_tpu.algos import buffer
from guardx_tpu.ops import chol_tiny, chol_solve_tiny, solve_spd_tiny
from guardx_tpu.ops.gae_scan import gae_pallas


def _rand_spd(rng, n, batch=()):
    A = rng.standard_normal(batch + (n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [1, 4, 9, 23])
def test_chol_tiny_matches_numpy(n):
    rng = np.random.default_rng(0)
    A = _rand_spd(rng, n)
    L = chol_tiny(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(A), rtol=2e-4, atol=2e-4)


def test_chol_solve_tiny_vector_and_matrix():
    rng = np.random.default_rng(1)
    n = 9
    A = _rand_spd(rng, n)
    b = rng.standard_normal((n,)).astype(np.float32)
    B = rng.standard_normal((n, 5)).astype(np.float32)
    x = solve_spd_tiny(jnp.asarray(A), jnp.asarray(b))
    X = chol_solve_tiny(chol_tiny(jnp.asarray(A)), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B), rtol=1e-3, atol=1e-3)


def test_chol_tiny_vmap_batch():
    rng = np.random.default_rng(2)
    n, B = 6, 32
    A = _rand_spd(rng, n, (B,))
    b = rng.standard_normal((B, n)).astype(np.float32)
    x = jax.vmap(solve_spd_tiny)(jnp.asarray(A), jnp.asarray(b))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-3, atol=1e-3)


def test_gae_pallas_matches_scan():
    rng = np.random.default_rng(3)
    T, B = 17, 512
    rew = jnp.asarray(rng.standard_normal((T, B)).astype(np.float32))
    val = jnp.asarray(rng.standard_normal((T, B)).astype(np.float32))
    done = jnp.asarray(
        (rng.random((T, B)) < 0.1).astype(np.float32)
    ).at[-1].set(1.0)
    adv_ref, ret_ref = buffer.gae(rew, val, done, 0.99, 0.95)
    adv, ret = gae_pallas(rew, val, done, 0.99, 0.95, interpret=True)
    np.testing.assert_allclose(np.asarray(adv), np.asarray(adv_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(ret_ref), rtol=1e-5, atol=1e-5)


def test_pallas_chol_matches_unrolled():
    """solve_spd_lanes (interpret mode on CPU) == tiny_chol on random SPD
    batches, vector and matrix right-hand sides, including batch padding."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from guardx_tpu.ops import tiny_chol
    from guardx_tpu.ops.pallas_chol import solve_spd_lanes

    rng = np.random.RandomState(0)
    for B, n, m in ((130, 7, 1), (64, 13, 5), (32, 19, 30)):
        A = rng.randn(B, n, n)
        A = (A @ A.transpose(0, 2, 1) + n * np.eye(n)).astype(np.float32)
        A = jnp.asarray(A)
        b = jnp.asarray(rng.randn(B, n).astype(np.float32))
        bm = jnp.asarray(rng.randn(B, n, m).astype(np.float32))
        ref_v = jax.vmap(tiny_chol.solve_spd_tiny)(A, b)
        ref_m = jax.vmap(tiny_chol.solve_spd_tiny)(A, bm)
        out_v = solve_spd_lanes(A, b, interpret=True)
        out_m = solve_spd_lanes(A, bm, interpret=True)
        np.testing.assert_allclose(out_v, ref_v, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(out_m, ref_m, rtol=2e-5, atol=2e-5)


def test_pallas_chol_custom_vmap_cpu_fallback():
    """solve_spd_env unbatched falls back to the scalar unroll (the CPU
    path the pipeline uses off-TPU)."""
    import numpy as np
    import jax.numpy as jnp
    from guardx_tpu.ops import tiny_chol
    from guardx_tpu.ops.pallas_chol import solve_spd_env

    rng = np.random.RandomState(1)
    A = rng.randn(9, 9)
    A = (A @ A.T + 9 * np.eye(9)).astype(np.float32)
    b = rng.randn(9).astype(np.float32)
    out = solve_spd_env(jnp.asarray(A), jnp.asarray(b))
    ref = tiny_chol.solve_spd_tiny(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
