"""TPU-native compute kernels for the hot paths.

- tiny_chol: unrolled Cholesky factor/solve for the small per-env mass
  matrices of the physics pipeline. Under jax.vmap every scalar of the
  factorization becomes one (B,)-wide VPU op, so the batched solve compiles
  to pure fused elementwise code instead of XLA's generic blocked Cholesky
  (which loops with dynamic slices at these sizes).
- gae_scan: Pallas TPU kernel fusing the GAE-lambda and rewards-to-go
  backward recurrences over a (T, B) rollout into a single pass over HBM
  (the reference computes these on the CPU with scipy.signal.lfilter —
  safe_rl_libX/cpo/cpo.py:71-137).
"""

from guardx_tpu.ops.tiny_chol import chol_tiny, chol_solve_tiny, solve_spd_tiny
from guardx_tpu.ops.gae_scan import gae_pallas

__all__ = [
    "chol_tiny",
    "chol_solve_tiny",
    "solve_spd_tiny",
    "gae_pallas",
]
