"""Actor-critic networks and distribution math.

Rebuilds the reference's per-algorithm `*_core.py` modules (canonical copy:
safe_rl_libX/cpo/cpo_core.py) once, in flax. Architecture parity:
- Gaussian policy: tanh MLP (64, 64) mean head, state-independent log_std
  parameter initialized to -0.5 (cpo_core.py:110-122)
- value / cost-value critics: tanh MLP (64, 64) -> scalar (cpo_core.py:136-143)
- diagonal-gaussian KL for the trust region (cpo_core.py:12-22)

All functions are pure; parameters travel as pytrees so the trust-region
core can flatten them with jax.flatten_util.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-8


class MLP(nn.Module):
    sizes: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = dict(tanh=nn.tanh, relu=nn.relu)[self.activation]
        for i, h in enumerate(self.sizes[:-1]):
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.sizes[-1])(x)


class GaussianActor(nn.Module):
    """Diagonal-gaussian policy (reference MLPGaussianActor,
    cpo_core.py:110-133)."""

    act_dim: int
    hidden_sizes: Sequence[int] = (64, 64)
    activation: str = "tanh"
    # reference GUARD trainers init at -0.5 (cpo_core.py:118); rl_games AMP
    # configs use -2.9 (HumanoidAMPPPO.yaml sigma_init) -- exposed as
    # --log_std_init
    log_std_init: float = -0.5

    @nn.compact
    def __call__(self, obs):
        mu = MLP((*self.hidden_sizes, self.act_dim), self.activation)(obs)
        init = self.log_std_init
        log_std = self.param(
            "log_std", lambda k: init * jnp.ones(self.act_dim, jnp.float32)
        )
        return mu, jnp.broadcast_to(log_std, mu.shape)


class Critic(nn.Module):
    """Scalar state-value critic (reference MLPCritic, cpo_core.py:136-143)."""

    hidden_sizes: Sequence[int] = (64, 64)
    activation: str = "tanh"
    softplus_head: bool = False  # USL/SafetyLayer cost critics use softplus

    @nn.compact
    def __call__(self, obs):
        v = MLP((*self.hidden_sizes, 1), self.activation)(obs)
        v = jnp.squeeze(v, -1)
        if self.softplus_head:
            v = jax.nn.softplus(v)
        return v


class QCritic(nn.Module):
    """State-action cost critic Q_c(s, a) (reference usl_core.py:146-161),
    softplus head so predicted costs are nonnegative."""

    hidden_sizes: Sequence[int] = (64, 64)
    activation: str = "relu"

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        q = MLP((*self.hidden_sizes, 1), self.activation)(x)
        return jax.nn.softplus(jnp.squeeze(q, -1))


class LambdaNet(nn.Module):
    """State-dependent Lagrange multiplier network for TRPO-FAC
    (reference trpofac_core.py:157-187), softplus output >= 0."""

    hidden_sizes: Sequence[int] = (64, 64)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, obs):
        lam = MLP((*self.hidden_sizes, 1), self.activation)(obs)
        return jax.nn.softplus(jnp.squeeze(lam, -1))


# ---------------------------------------------------------------------------
# recurrent (LSTM) networks
# ---------------------------------------------------------------------------
#
# The reference's flagship workloads are rl_games LSTM policies
# (AllegroKukaTwoArmsLSTM / ShadowHandOpenAI_LSTM — reference train.py:7-14,
# safe_rl_libX/guard_utils/safe_rl_env_config.py:2455-2566). The TPU-native
# design: an MLP encoder feeding one LSTM cell, exposed as a SINGLE-STEP
# pure function (obs, carry) -> (out, carry'). The rollout threads the
# carry through the epoch `lax.scan` (reset at done); update-time replay
# re-runs the same scan from the epoch-start zero state, so trust-region
# closures (loss/KL/FVP) differentiate through the sequence with no stored
# hidden states beyond the done flags.


class RecurrentGaussianActor(nn.Module):
    """Diagonal-gaussian policy with memory: MLP encoder -> LSTM -> mean
    head; state-independent log_std like the MLP actor."""

    act_dim: int
    hidden_sizes: Sequence[int] = (64,)
    lstm_size: int = 64
    activation: str = "tanh"
    log_std_init: float = -0.5

    @nn.compact
    def __call__(self, obs, carry):
        act = dict(tanh=nn.tanh, relu=nn.relu)[self.activation]
        x = obs
        for h in self.hidden_sizes:
            x = act(nn.Dense(h)(x))
        carry, y = nn.OptimizedLSTMCell(self.lstm_size)(carry, x)
        mu = nn.Dense(self.act_dim)(y)
        init = self.log_std_init
        log_std = self.param(
            "log_std", lambda k: init * jnp.ones(self.act_dim, jnp.float32)
        )
        return (mu, jnp.broadcast_to(log_std, mu.shape)), carry


class RecurrentCritic(nn.Module):
    """Scalar critic with memory: MLP encoder -> LSTM -> value head."""

    hidden_sizes: Sequence[int] = (64,)
    lstm_size: int = 64
    activation: str = "tanh"
    softplus_head: bool = False

    @nn.compact
    def __call__(self, obs, carry):
        act = dict(tanh=nn.tanh, relu=nn.relu)[self.activation]
        x = obs
        for h in self.hidden_sizes:
            x = act(nn.Dense(h)(x))
        carry, y = nn.OptimizedLSTMCell(self.lstm_size)(carry, x)
        v = jnp.squeeze(nn.Dense(1)(y), -1)
        if self.softplus_head:
            v = jax.nn.softplus(v)
        return v, carry


def zero_carry(batch_shape, lstm_size):
    """Zero LSTM carry (c, h) for a given batch shape ((), (B,), ...)."""
    shape = tuple(batch_shape) + (lstm_size,)
    return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def mask_carry(carry, done):
    """Reset the carry where done (done broadcast against the feature dim)."""
    keep = (1.0 - done)[..., None]
    return jax.tree_util.tree_map(lambda x: x * keep, carry)


# ---------------------------------------------------------------------------
# distribution math
# ---------------------------------------------------------------------------

def gaussian_logp(mu, log_std, act):
    """Sum-over-dims diagonal gaussian log-density (cpo_core.py:124-125)."""
    pre = -0.5 * (
        ((act - mu) / (jnp.exp(log_std) + EPS)) ** 2
        + 2 * log_std
        + jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(pre, axis=-1)


def gaussian_sample(rng, mu, log_std):
    return mu + jnp.exp(log_std) * jax.random.normal(rng, mu.shape)


def gaussian_entropy(log_std):
    """Mean entropy of diagonal gaussians (per batch element summed over dims)."""
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def diagonal_gaussian_kl(mu0, log_std0, mu1, log_std1):
    """Mean KL(old || new) between diagonal gaussians (cpo_core.py:12-22)."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    pre = 0.5 * (((mu1 - mu0) ** 2 + var0) / (var1 + EPS) - 1) + log_std1 - log_std0
    return jnp.mean(jnp.sum(pre, axis=-1))


def count_vars(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
