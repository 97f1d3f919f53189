"""On-device rollout buffers and GAE.

The reference stores (env_num, T) tensors on GPU but computes discounted
cumulative sums on the CPU with scipy.signal.lfilter, per env in the ragged
case (safe_rl_libX/cpo/cpo.py:71-137, cpo_core.py:42-69). Here everything is
a fixed-shape (T, B) array and GAE is a single backward lax.scan (XLA keeps
it on device; the done-mask handles ragged episode boundaries, generalizing
the reference's per-env Python loop).

Semantics matched to the reference trainer:
- bootstrap values are ZERO at every done and at epoch end (the reference
  zeroes v/vc for done envs and for all envs at timeout — cpo.py:636-655)
- reward advantages are z-scored PER ENV, cost advantages centered only
  (cpo.py:150-160)
- one-episode mode: steps after each env's first done are invalidated and
  rewards/costs zeroed (trpo_one_episode/trpo.py:444-503)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def discount_cumsum(x, discount, axis=0):
    """y_t = x_t + discount * y_{t+1} along `axis` (reference
    cpo_core.py:42-57, scipy lfilter) as a reverse scan on device."""
    x = jnp.moveaxis(x, axis, 0)

    def step(carry, xt):
        y = xt + discount * carry
        return y, y

    _, ys = jax.lax.scan(step, jnp.zeros_like(x[0]), x, reverse=True)
    return jnp.moveaxis(ys, 0, axis)


def gae(rew, val, done, gamma, lam):
    """Masked GAE-lambda + rewards-to-go over a (T, B) rollout.

    done[t] = 1 ends the segment AFTER step t with zero bootstrap (matches
    the reference's zeroed last_val/last_cost_val, cpo.py:636-655; the final
    step of the epoch is forced done by the caller to reproduce the timeout
    behavior).

    Returns (adv, ret) with shapes (T, B).
    """
    cont = 1.0 - done  # (T, B)
    # delta_t = r_t + gamma * V(s_{t+1}) * cont_t - V(s_t)
    next_val = jnp.concatenate([val[1:], jnp.zeros_like(val[:1])], axis=0)
    delta = rew + gamma * next_val * cont - val

    def adv_step(carry, xs):
        d, c = xs
        a = d + gamma * lam * c * carry
        return a, a

    _, adv = jax.lax.scan(
        adv_step, jnp.zeros_like(delta[0]), (delta, cont), reverse=True
    )

    def ret_step(carry, xs):
        r, c = xs
        y = r + gamma * c * carry
        return y, y

    _, ret = jax.lax.scan(
        ret_step, jnp.zeros_like(rew[0]), (rew, cont), reverse=True
    )
    return adv, ret


def normalize_advantages(adv, adc, valid=None):
    """Per-env normalization (reference cpo.py:150-160): z-score reward
    advantages, center (not scale) cost advantages. adv/adc: (T, B).

    With a validity mask (one-episode mode), statistics use valid steps only
    (reference trpo_one_episode/trpo.py:119-130 computes stats on the
    selected steps)."""
    if valid is None:
        mean = jnp.mean(adv, axis=0, keepdims=True)
        std = jnp.std(adv, axis=0, keepdims=True)
        adc_mean = jnp.mean(adc, axis=0, keepdims=True)
    else:
        w = valid / jnp.maximum(jnp.sum(valid, axis=0, keepdims=True), 1.0)
        mean = jnp.sum(adv * w, axis=0, keepdims=True)
        var = jnp.sum(w * (adv - mean) ** 2, axis=0, keepdims=True)
        std = jnp.sqrt(var)
        adc_mean = jnp.sum(adc * w, axis=0, keepdims=True)
    adv = (adv - mean) / (std + EPS)
    adc = adc - adc_mean
    if valid is not None:
        adv = adv * valid
        adc = adc * valid
    return adv, adc


def one_episode_mask(done):
    """Validity mask for one-episode mode: steps up to and INCLUDING each
    env's first done are valid; later steps are not
    (reference trpo_one_episode/trpo.py:84-130: first_done_idx tracking).

    done: (T, B) -> valid (T, B) in {0,1}.
    """
    prior_done = jnp.concatenate(
        [jnp.zeros_like(done[:1]), jnp.cumsum(done, axis=0)[:-1]], axis=0
    )
    return (prior_done < 0.5).astype(done.dtype)
