"""Batched rigid-body physics in pure JAX, designed for TPU.

This subpackage is the TPU-native replacement for MuJoCo MJX as used by the
reference (safe_rl_envs/safe_rl_envs/envs/engine.py:231-232, mjx.put_model /
mjx.put_data / mjx.step / mjx.forward).  The host-side ``mujoco`` package is
used only as an MJCF *compiler* (model constants); all device compute is
generated from this package's JAX programs.

Design notes (TPU-first):
- All per-step compute is dense, static-shape, batched linear algebra:
  mass matrix and bias forces come from an ancestor-masked 6D Jacobian
  formulation (see ``dynamics.py``) so the whole pipeline is a handful of
  batched matmuls + a tiny Cholesky solve — no per-dof recursions at runtime.
- Contacts are a static pair list (robot geoms vs. the floor plane) resolved
  with a smooth penalty model, so control flow is branch-free.
- Everything is float32; `vmap` over the env axis turns per-env (nv,nv)
  operations into large batched ops that XLA tiles onto the TPU VPU/MXU.
"""

from guardx_tpu.physics.model import Model, Data, load_model, make_data
from guardx_tpu.physics.pipeline import forward, step

__all__ = ["Model", "Data", "load_model", "make_data", "forward", "step"]
