"""JAX <-> Torch interop via DLPack, dict-pytree aware.

Rebuild of the reference's engine_utils
(reference: safe_rl_envs/safe_rl_envs/envs/engine_utils.py:9-73). The
framework itself is single-runtime JAX (the trainers never touch torch —
SURVEY.md §7 design stance), but external envs and checkpoint consumers may
speak torch; these converters give the same zero-copy bridge the reference
used on every step, here only at true interop boundaries.

As in the reference, jax_to_torch forces float32 on floating outputs
(engine_utils.py:60 astype('float32')).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.singledispatch
def torch_to_jax(value):
    """Torch tensor (or dict of) -> jax array, zero-copy where the devices
    allow (reference torch_to_jax, engine_utils.py:9-35)."""
    return value


@functools.singledispatch
def jax_to_torch(value):
    """jax array (or dict of) -> torch tensor (reference jax_to_torch,
    engine_utils.py:38-73)."""
    return value


def _register_torch():
    try:
        import torch
        import torch.utils.dlpack as torch_dlpack
    except ImportError:  # torch genuinely absent: converters are identity
        return

    @torch_to_jax.register(torch.Tensor)
    def _torch_tensor_to_jax(value: "torch.Tensor"):
        try:
            return jnp.from_dlpack(torch_dlpack.to_dlpack(value.contiguous()))
        except Exception:
            return jnp.asarray(value.detach().cpu().numpy())

    @torch_to_jax.register(dict)
    def _torch_dict_to_jax(value: dict):
        return {k: torch_to_jax(v) for k, v in value.items()}

    @jax_to_torch.register(jax.Array)
    def _jax_array_to_torch(value: jax.Array):
        if jnp.issubdtype(value.dtype, jnp.floating):
            value = value.astype('float32')
        try:
            return torch_dlpack.from_dlpack(value.__dlpack__())
        except Exception:
            return torch.from_numpy(np.asarray(value))

    @jax_to_torch.register(dict)
    def _jax_dict_to_torch(value: dict):
        return {k: jax_to_torch(v) for k, v in value.items()}


_register_torch()


def to_jax(x):
    """Anything array-like -> jax array (torch via dlpack, else asarray)."""
    out = torch_to_jax(x)
    if not isinstance(out, (jax.Array, dict)):
        out = jnp.asarray(np.asarray(out))
    return out
