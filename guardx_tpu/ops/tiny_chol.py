"""Unrolled Cholesky factor/solve for tiny SPD systems.

The physics pipeline solves (M + h D) qacc = rhs once per substep with
nv in [9, 32] (point robot nv=9 … humanoid nv≈27). XLA's lax.linalg.cholesky
on TPU runs a blocked algorithm with dynamic slicing that is built for
hundreds-sized matrices; for these tiny systems, fully unrolling the
Cholesky-Banachiewicz recurrence into static scalar graphs is far better:
under ``jax.vmap`` each scalar op becomes one (B,)-wide fused VPU op, the
whole solve is branch- and gather-free, and XLA fuses it with the
surrounding dynamics algebra.

Used by guardx_tpu.physics.pipeline in place of jax.scipy cho_factor /
cho_solve (reference counterpart: MJX's internal solver, used via mjx.step
at safe_rl_envs/safe_rl_envs/envs/engine.py:668-670).
"""

from __future__ import annotations

import jax.numpy as jnp

# beyond this, unrolling bloats compile time faster than it buys runtime
MAX_UNROLL_N = 36


def chol_tiny(A):
    """Lower Cholesky factor of a tiny SPD matrix (n, n), fully unrolled.

    Returns L (n, n) with L @ L.T == A. Works element-wise under vmap.
    """
    n = A.shape[-1]
    assert A.shape[-2] == n and n <= MAX_UNROLL_N
    # L held as a python list of lists of scalars (traced values); assembled
    # into one array at the end so the graph stays static.
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0]) for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve_tiny(L, b):
    """Solve L L^T x = b given the factor from chol_tiny.

    b: (..., n) or (..., n, m); unrolled forward + back substitution.
    """
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_spd_tiny(A, b):
    """x = A^{-1} b for tiny SPD A; one fused factor+solve."""
    return chol_solve_tiny(chol_tiny(A), b)
