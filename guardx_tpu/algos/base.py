"""Shared algorithm machinery: networks bundle, policy-loss closures,
critic fitting, and the AlgoState pytree.

Each algorithm in guardx_tpu.algos.algorithms is a small module over these
helpers + the trust-region core — replacing the reference's ~19 copies of a
700-line trainer (SURVEY.md §2.2) with one runner and per-algo update rules.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from guardx_tpu.algos import core
from guardx_tpu.algos import trust_region as tr

EPS = 1e-8


@struct.dataclass
class AlgoState:
    """Learnable state shared by all algorithms (+ algo-specific extras)."""

    pi: Any
    v: Any
    vc: Any
    v_opt: Any
    vc_opt: Any
    extra: Any  # dict pytree: lagrange multipliers, extra nets, their opts


class Networks:
    """Static bundle of network modules + apply fns (not a pytree)."""

    recurrent = False

    def __init__(self, obs_dim: int, act_dim: int, hidden_sizes=(64, 64),
                 vc_softplus: bool = False, log_std_init: float = -0.5):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.actor = core.GaussianActor(act_dim=act_dim, hidden_sizes=hidden_sizes,
                                        log_std_init=log_std_init)
        self.critic = core.Critic(hidden_sizes=hidden_sizes)
        # SCPO's max-cost critic has a softplus head (scpo_core.py:158-165)
        self.vc_critic = core.Critic(
            hidden_sizes=hidden_sizes, softplus_head=vc_softplus
        )
        self.pi_apply = self.actor.apply
        self.v_apply = self.critic.apply
        self.vc_apply = self.vc_critic.apply

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, self.obs_dim), jnp.float32)
        pi = self.actor.init(k1, dummy)
        v = self.critic.init(k2, dummy)
        vc = self.vc_critic.init(k3, dummy)
        return pi, v, vc


class RecurrentNetworks(Networks):
    """LSTM actor-critic bundle (the reference's rl_games LSTM policies —
    ShadowHandOpenAI_LSTM / AllegroKuka*LSTM registry names,
    safe_rl_env_config.py:2455-2566).

    Single-step applies take and return an LSTM carry per net; sequence
    applies replay a whole (T, B) rollout from the epoch-start zero carry,
    resetting at the recorded done flags — exactly reproducing the
    distributions the rollout sampled from, so trust-region closures
    differentiate through the sequence."""

    recurrent = True

    def __init__(self, obs_dim: int, act_dim: int, hidden_sizes=(64,),
                 lstm_size: int = 64, vc_softplus: bool = False,
                 log_std_init: float = -0.5):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.lstm_size = lstm_size
        self.actor = core.RecurrentGaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, lstm_size=lstm_size,
            log_std_init=log_std_init,
        )
        self.critic = core.RecurrentCritic(
            hidden_sizes=hidden_sizes, lstm_size=lstm_size
        )
        self.vc_critic = core.RecurrentCritic(
            hidden_sizes=hidden_sizes, lstm_size=lstm_size,
            softplus_head=vc_softplus,
        )
        # step applies: (params, obs, carry) -> (out, carry')
        self.pi_apply = self.actor.apply
        self.v_apply = self.critic.apply
        self.vc_apply = self.vc_critic.apply

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, self.obs_dim), jnp.float32)
        carry = core.zero_carry((1,), self.lstm_size)
        pi = self.actor.init(k1, dummy, carry)
        v = self.critic.init(k2, dummy, carry)
        vc = self.vc_critic.init(k3, dummy, carry)
        return pi, v, vc

    def init_hidden(self, B: int):
        """Per-net zero carries for a batch of B envs."""
        z = lambda: core.zero_carry((B,), self.lstm_size)
        return {'pi': z(), 'v': z(), 'vc': z()}

    def _seq(self, apply_fn, params, obs_tb, done_prev_tb):
        """Replay apply_fn over a (T, B, ...) sequence from zero carry,
        resetting the carry where the PREVIOUS step ended (done_prev[0]=0:
        every epoch starts from a full env reset, runner.py epoch-end)."""
        B = obs_tb.shape[1]
        carry0 = core.zero_carry((B,), self.lstm_size)

        def step(carry, inp):
            o, dprev = inp
            carry = core.mask_carry(carry, dprev)
            out, carry = apply_fn(params, o, carry)
            return carry, out

        _, outs = jax.lax.scan(step, carry0, (obs_tb, done_prev_tb))
        return outs

    def pi_seq(self, params, obs_tb, done_prev_tb):
        """(T, B, O) -> ((T, B, A) mu, (T, B, A) log_std)."""
        return self._seq(self.pi_apply, params, obs_tb, done_prev_tb)

    def v_seq(self, params, obs_tb, done_prev_tb):
        return self._seq(self.v_apply, params, obs_tb, done_prev_tb)

    def vc_seq(self, params, obs_tb, done_prev_tb):
        return self._seq(self.vc_apply, params, obs_tb, done_prev_tb)


def wmean(x, w):
    """Weighted mean (w=1 everywhere reduces to the reference's .mean())."""
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def weighted_gaussian_kl(mu0, log_std0, mu1, log_std1, w):
    """Mean diagonal-gaussian KL with sample weights (cpo_core.py:12-22)."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    pre = 0.5 * (((mu1 - mu0) ** 2 + var0) / (var1 + EPS) - 1) + log_std1 - log_std0
    return wmean(jnp.sum(pre, axis=-1), w)


def make_mu_logstd_fn(nets: Networks, data: dict):
    """The ONE place update rules get the policy distribution at new params:

    returns f(pi_params) -> (mu, log_std) flattened to (T*B, A), matching
    data['act']/data['logp'] row order. Feedforward nets apply to the flat
    observation matrix; recurrent nets replay the (T, B) sequence from the
    epoch-start zero carry with the recorded done resets (identical to what
    the rollout sampled from)."""
    if nets.recurrent:
        obs_tb, done_prev = data['obs_tb'], data['done_prev_tb']

        def f(params):
            mu, log_std = nets.pi_seq(params, obs_tb, done_prev)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            return flat(mu), flat(log_std)
    else:
        obs = data['obs']

        def f(params):
            return nets.pi_apply(params, obs)
    return f


def make_pi_closures(nets: Networks, data: dict):
    """Flat-theta closures over the rollout data for the TR machinery:

    Returns (theta -> loss_pi, theta -> surr_cost, theta -> kl, unravel)
    matching the reference's compute_loss_pi / compute_cost_pi /
    compute_kl_pi (cpo.py:362-405).
    """
    act, adv, adc = data['act'], data['adv'], data['adc']
    logp_old, mu_old, logstd_old = data['logp'], data['mu'], data['logstd']
    w = data['valid']
    mu_fn = make_mu_logstd_fn(nets, data)

    def loss_pi(params):
        mu, log_std = mu_fn(params)
        logp = core.gaussian_logp(mu, log_std, act)
        ratio = jnp.exp(logp - logp_old)
        return -wmean(ratio * adv, w)

    def surr_cost(params):
        mu, log_std = mu_fn(params)
        logp = core.gaussian_logp(mu, log_std, act)
        ratio = jnp.exp(logp - logp_old)
        return wmean(ratio * adc, w)

    def kl(params):
        mu, log_std = mu_fn(params)
        return weighted_gaussian_kl(mu_old, logstd_old, mu, log_std, w)

    return loss_pi, surr_cost, kl


FVP_MAX_SAMPLES = 16384  # curvature-batch cap; 0 = full batch


def make_curvature_kl(nets: Networks, data: dict, max_n: int | None = None):
    """KL closure over a strided subsample of the batch, for Fisher-vector
    products only.

    The reference evaluates its double-backward FVP on the full (B*T) batch
    every CG iteration (cpo.py:206-222,459-475) — at suite scale that is
    ~200 HBM-bound sweeps of an 800k-row batch per update for a ~7k-param
    policy. The curvature estimate does not need that: the FVP batch is
    capped (the gradient g, the line-search acceptance KL, and every loss
    stay full-batch). Set GUARDX_FVP_SAMPLES=0 to force full-batch FVPs.
    """
    import os

    if max_n is None:
        max_n = int(os.environ.get('GUARDX_FVP_SAMPLES', FVP_MAX_SAMPLES))

    if nets.recurrent:
        # a recurrent KL must replay whole sequences: subsample the ENV
        # axis (full T per kept env) instead of flat rows
        obs_tb, done_prev = data['obs_tb'], data['done_prev_tb']
        T, B = obs_tb.shape[:2]
        mu_old = data['mu'].reshape(T, B, -1)
        logstd_old = data['logstd'].reshape(T, B, -1)
        w = data['valid'].reshape(T, B)
        if max_n and T * B > max_n:
            # env-axis stride first (full T per kept env); clamp to B so a
            # few-envs/long-horizon batch can't stride past every env
            stride = min(-(-(T * B) // max_n), B)
            obs_tb, done_prev = obs_tb[:, ::stride], done_prev[:, ::stride]
            mu_old, logstd_old = mu_old[:, ::stride], logstd_old[:, ::stride]
            w = w[:, ::stride]
            # if T alone still exceeds the cap, replay a full PREFIX of the
            # sequence (prefix keeps the carry replay valid from t=0)
            kept_b = obs_tb.shape[1]
            if T * kept_b > max_n:
                t_keep = max(1, max_n // kept_b)
                obs_tb, done_prev = obs_tb[:t_keep], done_prev[:t_keep]
                mu_old, logstd_old = mu_old[:t_keep], logstd_old[:t_keep]
                w = w[:t_keep]

        def kl(params):
            mu, log_std = nets.pi_seq(params, obs_tb, done_prev)
            return weighted_gaussian_kl(
                mu_old.reshape(-1, mu.shape[-1]),
                logstd_old.reshape(-1, mu.shape[-1]),
                mu.reshape(-1, mu.shape[-1]),
                log_std.reshape(-1, mu.shape[-1]),
                w.reshape(-1),
            )

        return kl

    obs, mu_old, logstd_old, w = (
        data['obs'], data['mu'], data['logstd'], data['valid']
    )
    n = obs.shape[0]
    if max_n and n > max_n:
        stride = -(-n // max_n)  # ceil: spreads samples across (T, B)
        obs, mu_old, logstd_old, w = (
            obs[::stride], mu_old[::stride], logstd_old[::stride], w[::stride]
        )

    def kl(params):
        mu, log_std = nets.pi_apply(params, obs)
        return weighted_gaussian_kl(mu_old, logstd_old, mu, log_std, w)

    return kl


def pi_diagnostics(nets: Networks, params, data):
    """approx_kl and entropy at current params (cpo.py:400-403)."""
    act, w = data['act'], data['valid']
    mu, log_std = make_mu_logstd_fn(nets, data)(params)
    logp = core.gaussian_logp(mu, log_std, act)
    approx_kl = wmean(data['logp'] - logp, w)
    ent = wmean(core.gaussian_entropy(log_std), w)
    return approx_kl, ent


def _critic_bf16() -> bool:
    """Mixed-precision critic fitting on TPU (GUARDX_CRITIC_COMPUTE=f32 to
    disable). The fit is HBM-bound — 2 x 80 full-batch fwd+bwd sweeps of the
    (B*T, O) observation matrix dominate the whole CPO epoch at suite scale
    — so the network compute runs in bf16 (params, Adam state, and the MSE
    reduction stay f32). The reference's torch path runs TF32 matmuls on
    Ampere GPUs by default, i.e. reduced-precision critic matmuls match the
    reference's effective numerics."""
    import os

    mode = os.environ.get('GUARDX_CRITIC_COMPUTE')
    if mode:
        return mode == 'bf16'
    return jax.default_backend() == 'tpu'


def _critic_batch(n_rows: int) -> int:
    """Per-iteration row count for the critic fit. The reference runs 80
    FULL-batch Adam steps (cpo.py:563-576) — statistically wild overkill at
    suite scale (80 x 1.6M rows at env_num=8192) and the single largest
    HBM consumer of the whole epoch (96% of CPO update time, measured).
    Default: rotating 256k-row slices (the full batch when smaller).
    GUARDX_CRITIC_BATCH=0 restores reference full-batch numerics; the A/B
    methodology in LEARNING.md covers this flag too."""
    import os

    v = os.environ.get('GUARDX_CRITIC_BATCH')
    cap = 262_144 if v is None else int(v)
    if cap <= 0:
        return n_rows
    return min(n_rows, cap)


def fit_critic(apply_fn, params, opt: optax.GradientTransformation, opt_state,
               obs, target, iters: int, w):
    """`iters` Adam steps on the (weighted) MSE (cpo.py:563-576), each on a
    rotating contiguous slice of the batch (see _critic_batch). Rows arrive
    (T, B)-flattened, so a contiguous slice spans all envs at a few
    consecutive timesteps — diverse enough for SGD, and a dynamic_slice is
    the cheapest possible gather."""
    n = obs.shape[0]
    bs = _critic_batch(n)
    # ceil division so the tail n % bs rows are visited too (the final
    # slice overlaps: dynamic_slice clamps its start to n - bs)
    n_slices = max(-(-n // bs), 1)

    if _critic_bf16():
        obs_c = obs.astype(jnp.bfloat16)

        def loss_fn(p, o, t, ww):
            p16 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), p
            )
            pred = apply_fn(p16, o).astype(jnp.float32)
            return wmean((pred - t) ** 2, ww)
    else:
        obs_c = obs

        def loss_fn(p, o, t, ww):
            return wmean((apply_fn(p, o) - t) ** 2, ww)

    def body(i, carry):
        p, s = carry
        start = (i % n_slices) * bs
        o = jax.lax.dynamic_slice_in_dim(obs_c, start, bs, 0)
        t = jax.lax.dynamic_slice_in_dim(target, start, bs, 0)
        ww = jax.lax.dynamic_slice_in_dim(w, start, bs, 0)
        grads = jax.grad(loss_fn)(p, o, t, ww)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s)

    params, opt_state = jax.lax.fori_loop(0, iters, body, (params, opt_state))
    return params, opt_state, loss_fn(params, obs_c, target, w)


def fit_critic_recurrent(seq_apply, params, opt, opt_state, obs_tb,
                         done_prev_tb, target_tb, iters: int, w_tb):
    """`iters` Adam steps on the sequence MSE for a recurrent critic.

    Each step replays the full (T, B) sequence (the LSTM carry threads from
    t=0, so the row-slicing of the feedforward fit can't apply); the
    batch already spans all envs, plenty diverse for Adam."""

    def loss_fn(p):
        pred = seq_apply(p, obs_tb, done_prev_tb)
        return wmean((pred - target_tb) ** 2, w_tb)

    def body(_, carry):
        p, s = carry
        grads = jax.grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s)

    params, opt_state = jax.lax.fori_loop(0, iters, body, (params, opt_state))
    return params, opt_state, loss_fn(params)


def constraint_violation(aux: dict, target_cost: float, rescale: bool = True):
    """c = (EpCost - target_cost) / EpLen (cpo.py:449-456).

    SCPO uses the un-rescaled variant (scpo.py:485-498)."""
    c = aux['ep_cost'] - target_cost
    if rescale:
        c = c / (aux['ep_len'] + EPS)
    return c


class Algorithm:
    """Base: algorithms override update(); defaults cover the common
    v/vc critic fitting, hyperparameters, and no-op rollout hooks."""

    name = "base"
    one_episode = False
    # which data fields the update consumes beyond the common set
    needs_cost_critic = True
    augments_obs = False  # SCPO appends the running max-cost M
    vc_softplus = False   # SCPO's max-cost critic head

    def __init__(self, **hp):
        self.hp = dict(
            gamma=0.99, lam=0.97,
            vf_lr=1e-3, vcf_lr=1e-3, train_v_iters=80, train_vc_iters=80,
            target_kl=0.01, target_cost=0.0,
            backtrack_coeff=0.8, backtrack_iters=100, cost_reduction=0.0,
        )
        self.hp.update(hp)

    def init_extra(self, rng, nets: Networks):
        return {}

    def init_pi_opt(self, pi_params):
        """Extra entries merged into `extra` for Adam-based policies."""
        return {}

    # ---- rollout hooks (no-ops by default) -------------------------------
    def rollout_carry_init(self, B: int):
        return {}

    def obs_for_policy(self, obs, carry):
        return obs

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        """Act-time safety correction hook. env/env_state let algorithms
        probe candidate actions through the (pure) physics — the TPU-native
        form of ISSA's save-state/step/rollback sampling
        (safe_rl_lib/issa/trpoissa.py:337-369)."""
        return a, {}

    def process_cost(self, cost, carry, done):
        return cost, carry, {}

    def shape_rewards(self, nets, s: AlgoState, batch):
        """Post-rollout reward shaping hook (AMP blends its adversarial
        style reward into batch['rew'] before GAE). Default: identity."""
        return batch

    def fit_critics(self, nets, s: AlgoState, data, v_opt, vc_opt):
        if nets.recurrent:
            T, B = data['obs_tb'].shape[:2]
            ret_tb = data['ret'].reshape(T, B)
            cret_tb = data['cret'].reshape(T, B)
            w_tb = data['valid'].reshape(T, B)
            v, v_opt_state, loss_v = fit_critic_recurrent(
                nets.v_seq, s.v, v_opt, s.v_opt, data['obs_tb'],
                data['done_prev_tb'], ret_tb,
                int(self.hp['train_v_iters']), w_tb,
            )
            if self.needs_cost_critic:
                vc, vc_opt_state, loss_vc = fit_critic_recurrent(
                    nets.vc_seq, s.vc, vc_opt, s.vc_opt, data['obs_tb'],
                    data['done_prev_tb'], cret_tb,
                    int(self.hp['train_vc_iters']), w_tb,
                )
            else:
                vc, vc_opt_state, loss_vc = s.vc, s.vc_opt, jnp.float32(0.0)
            return s.replace(v=v, v_opt=v_opt_state, vc=vc,
                             vc_opt=vc_opt_state), \
                dict(LossV=loss_v, LossVC=loss_vc)
        v, v_opt_state, loss_v = fit_critic(
            nets.v_apply, s.v, v_opt, s.v_opt, data['obs'], data['ret'],
            int(self.hp['train_v_iters']), data['valid'],
        )
        if self.needs_cost_critic:
            vc, vc_opt_state, loss_vc = fit_critic(
                nets.vc_apply, s.vc, vc_opt, s.vc_opt, data['obs'], data['cret'],
                int(self.hp['train_vc_iters']), data['valid'],
            )
        else:
            vc, vc_opt_state, loss_vc = s.vc, s.vc_opt, jnp.float32(0.0)
        return s.replace(v=v, v_opt=v_opt_state, vc=vc, vc_opt=vc_opt_state), \
            dict(LossV=loss_v, LossVC=loss_vc)

    def update(self, nets: Networks, s: AlgoState, data: dict, aux: dict,
               opts: dict):
        raise NotImplementedError
