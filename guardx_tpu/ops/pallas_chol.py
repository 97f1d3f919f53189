"""Pallas TPU kernel: batched tiny SPD factor + solve, batch on lanes.

Why this exists (PERF.md round 4): the physics pipeline solves
(M + hD) x = b for thousands of independent tiny (nv <= ~34) SPD systems
per substep. Both XLA lowerings are pathological IN CONTEXT on TPU:

- the unrolled scalar graph (ops/tiny_chol.py) runs at 0.037 ms in
  isolation (B=4000, n=13) but ~2.4 ms when composed with the CRBA chain
  — XLA fuses it into per-row `slice_reduce` loop fusions over (B,)
  SMEM-annotated channels (~60x slower than the same math isolated);
- jax.scipy cho_factor (blocked LAPACK custom call) doubles the whole
  rollout at these sizes.

Here the batch dimension is placed on the LANES: inputs are transposed
to channel-major (n, n, B) / (n, m, B), each Cholesky recurrence step is
one (1, B_blk)- or (m, B_blk)-wide VPU op inside a single kernel, and no
(B,) intermediate ever hits HBM. The recurrence is the same
Cholesky–Banachiewicz unroll as tiny_chol (validated against it in
tests/test_ops.py).

Used by physics/pipeline._spd_factor on TPU backends (GUARDX_CHOL
selects: pallas | unrolled | blocked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-aligned batch block: 8 sublanes x 128 lanes per (1, B_BLK) channel
B_BLK = 1024


def _pick_blk(n: int, m: int) -> int:
    """Largest lane block whose double-buffered working set fits VMEM."""
    for blk in (1024, 512, 256, 128):
        if n * (n + 2 * m) * blk * 4 * 2 < 12 * 1024 * 1024:
            return blk
    return 128


def _chol_solve_kernel(n: int, m: int, a_ref, b_ref, x_ref):
    """One batch block: factor A (n, n, B_BLK) and solve for b (n, m, B_BLK).

    Channels a_ref[i, j] are (B_BLK,) lane vectors; the unrolled
    recurrence keeps every intermediate in VMEM/registers.
    """
    # Cholesky-Banachiewicz, fully unrolled (tiny_chol.chol_tiny)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a_ref[i, j, :]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jax.lax.rsqrt(s)  # store 1/L_ii (division-free)
            else:
                L[i][j] = s * L[j][j]

    # forward: L y = b   (rows are (m, B_BLK) blocks)
    y = [None] * n
    for i in range(n):
        s = b_ref[i, :, :]
        for k in range(i):
            s = s - L[i][k][None, :] * y[k]
        y[i] = s * L[i][i][None, :]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][None, :] * x[k]
        x[i] = s * L[i][i][None, :]
    for i in range(n):
        x_ref[i, :, :] = x[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_spd_lanes(A, b, interpret: bool = False):
    """x = A^{-1} b for batched tiny SPD A.

    A: (B, n, n); b: (B, n) or (B, n, m). Returns x shaped like b.
    B is padded to a multiple of B_BLK internally (identity-padded rows).
    """
    vec = b.ndim == 2
    if vec:
        b = b[..., None]
    B, n, _ = A.shape
    m = b.shape[-1]
    # wide RHS (FrankaCubeStack's constraint solve: nv=21, m=297 Delassus
    # columns) exceeds scoped VMEM even at the smallest lane block — chunk
    # the independent columns; the in-kernel refactor per chunk costs
    # n^3/6 lane ops, noise next to the m*n^2 substitutions
    M_CHUNK = 96
    if m > M_CHUNK:
        parts = [
            solve_spd_lanes(A, b[..., i:i + M_CHUNK], interpret=interpret)
            for i in range(0, m, M_CHUNK)
        ]
        return jnp.concatenate(parts, axis=-1)
    blk = _pick_blk(n, m)

    pad = (-B) % blk
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate(
            [b, jnp.zeros((pad, n, m), b.dtype)], axis=0
        )
    Bp = B + pad

    # channel-major: batch innermost (lanes)
    A_t = jnp.transpose(A, (1, 2, 0))  # (n, n, Bp)
    b_t = jnp.transpose(b, (1, 2, 0))  # (n, m, Bp)

    kernel = functools.partial(_chol_solve_kernel, n, m)
    x_t = pl.pallas_call(
        kernel,
        # Mosaic's true scoped-vmem footprint exceeds the 16M default for
        # some (n, m, blk) shapes the budget heuristic admits (GUARD
        # humanoid n=19 m=22 at blk=1024: 18.4M); v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        grid=(Bp // blk,),
        in_specs=[
            pl.BlockSpec((n, n, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, blk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m, Bp), A.dtype),
        interpret=interpret,
    )(A_t, b_t)

    x = jnp.transpose(x_t, (2, 0, 1))[:B]
    return x[..., 0] if vec else x


# ---------------------------------------------------------------------------
# single-env surface for the vmapped pipeline: jax.custom_batching routes
# the batched call into the lane kernel; the unbatched fallback stays on
# the scalar unroll (ops/tiny_chol.py)
# ---------------------------------------------------------------------------

from guardx_tpu.ops import tiny_chol as _tc
from jax import custom_batching as _cb


@_cb.custom_vmap
def solve_spd_env(A, b):
    """x = A^{-1} b for ONE env (A (n, n), b (n,) or (n, m)); under vmap
    the whole batch lowers to one solve_spd_lanes kernel call."""
    return _tc.solve_spd_tiny(A, b)


@solve_spd_env.def_vmap
def _solve_spd_env_vmap(axis_size, in_batched, A, b):
    A_b, b_b = in_batched
    if not A_b or not b_b:
        # partial batching should not occur in the pipeline; fall back
        Av = A if A_b else jnp.broadcast_to(A, (axis_size,) + A.shape)
        bv = b if b_b else jnp.broadcast_to(b, (axis_size,) + b.shape)
        return solve_spd_lanes(Av, bv), True
    return solve_spd_lanes(A, b), True
