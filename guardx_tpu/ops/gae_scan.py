"""Fused GAE-lambda + rewards-to-go as a Pallas TPU kernel.

The reference computes both discounted recurrences on the host CPU with
scipy.signal.lfilter, per env in the ragged case
(safe_rl_libX/cpo/cpo.py:71-137, cpo_core.py:42-69). The pure-JAX rebuild
(guardx_tpu.algos.buffer.gae) is two lax.scans over T; this kernel fuses
delta computation and BOTH backward recurrences into one pass: each (T, TB)
tile of the rollout is staged into VMEM once and walked backward with
(TB,)-wide VPU ops, writing adv and ret without re-touching HBM.

Semantics are identical to buffer.gae: done[t]==1 ends the segment after
step t with zero bootstrap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-aligned batch tile: 4 sublane rows of 128 lanes
_TB = 512


def _gae_kernel(rew_ref, val_ref, done_ref, adv_ref, ret_ref, *, gamma, lam):
    T = rew_ref.shape[0]

    def body(i, carry):
        a_c, r_c, next_val = carry
        t = T - 1 - i
        rew = rew_ref[t, :]
        val = val_ref[t, :]
        cont = 1.0 - done_ref[t, :]
        delta = rew + gamma * next_val * cont - val
        a = delta + gamma * lam * cont * a_c
        r = rew + gamma * cont * r_c
        adv_ref[t, :] = a
        ret_ref[t, :] = r
        return (a, r, val)

    zero = jnp.zeros((rew_ref.shape[1],), rew_ref.dtype)
    jax.lax.fori_loop(0, T, body, (zero, zero, zero))


@functools.partial(jax.jit, static_argnames=("gamma", "lam", "interpret"))
def gae_pallas(rew, val, done, gamma: float, lam: float, interpret: bool = False):
    """(adv, ret) for a (T, B) rollout; B must be a multiple of 512.

    Drop-in for guardx_tpu.algos.buffer.gae on TPU. gamma/lam are static
    (they are fixed per experiment; changing them recompiles, as does the
    reference's jitted epoch).
    """
    T, B = rew.shape
    assert B % _TB == 0, f"batch {B} not a multiple of {_TB}"
    grid = (B // _TB,)
    spec = pl.BlockSpec((T, _TB), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_gae_kernel, gamma=gamma, lam=lam)
    adv, ret = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, B), rew.dtype),
            jax.ShapeDtypeStruct((T, B), rew.dtype),
        ),
        interpret=interpret,
    )(rew, val, done)
    return adv, ret


def gae_auto(rew, val, done, gamma: float, lam: float):
    """gae_pallas on TPU when shapes allow; lax.scan fallback elsewhere."""
    from guardx_tpu.algos import buffer

    T, B = rew.shape
    if jax.default_backend() == "tpu" and B % _TB == 0:
        return gae_pallas(rew, val, done, gamma, lam)
    return buffer.gae(rew, val, done, gamma, lam)
