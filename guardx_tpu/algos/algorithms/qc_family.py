"""Action-correction family: USL, SafetyLayer, LPG — a state-action cost
critic corrects the sampled action at rollout time, the policy itself is a
TRPO update on reward advantages.

References:
- USL          safe_rl_libX/usl/usl.py, usl_core.py:146-196 — Qc(s,a) with
  softplus head; TD target cost + gamma*Qc'; at act time (after a 1/3-of-
  epochs warmup, usl.py:483-486) the action descends Qc for <=20 normalized
  gradient steps until Qc <= delta
- SafetyLayer  safe_rl_libX/safelayer/safelayer.py, safelayer_core.py:146-190
  — LINEAR cost model c_t = c_{t-1} + g(s)^T a (Dalal 2018); single
  closed-form correction; critic fit on (g(s)^T a_safe + prev_cost - cost)^2
  with zero-target downsampling
- LPG          safe_rl_libX/lpg/lpg.py — TRPO + USL-style Qc correction
  applied from the start; Qc trained on (obs, act_safe) TD targets
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from guardx_tpu.algos import core
from guardx_tpu.algos.base import AlgoState, Networks, wmean, fit_critic, EPS
from guardx_tpu.algos.algorithms.tr_family import TRPO
from guardx_tpu.algos.algorithms.scpo import downsample_weights


def usl_correction(qc_apply, qc_params, obs, act, delta=0.0, n_iter=20,
                   eta=0.05, max_action=1.0):
    """Iterative normalized gradient descent on Qc (usl_core.py:165-196).

    Batched: each env stops when its Qc <= delta or any |a| exceeds
    max_action (frozen thereafter, like the reference's index set).
    """

    def qc_sum(a):
        return jnp.sum(qc_apply(qc_params, obs, a))

    def body(_, carry):
        a, frozen = carry
        pred = qc_apply(qc_params, obs, a)
        safe_now = pred <= delta
        over = jnp.max(jnp.abs(a), axis=-1) > max_action
        frozen = jnp.logical_or(frozen, jnp.logical_or(safe_now, over))
        g = jax.grad(qc_sum)(a)
        Z = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        step = eta * g / (Z + 1e-8)
        a_new = jnp.where(frozen[:, None], a, a - step)
        return a_new, frozen

    B = obs.shape[0]
    a, _ = jax.lax.fori_loop(
        0, n_iter, body, (act, jnp.zeros(B, dtype=bool))
    )
    return a


class USL(TRPO):
    name = "usl"

    def __init__(self, **hp):
        hp.setdefault('ccritic_lr', 1e-3)
        hp.setdefault('train_ccritic_iters', 80)
        hp.setdefault('delta', 0.0)
        hp.setdefault('warmup_ratio', 1.0 / 3.0)  # usl.py:483
        super().__init__(**hp)
        self.needs_cost_critic = False
        self._qc = core.QCritic()
        self._qc_opt = optax.adam(self.hp['ccritic_lr'])

    def init_extra(self, rng, nets: Networks):
        dummy_o = jnp.zeros((1, nets.obs_dim))
        dummy_a = jnp.zeros((1, nets.act_dim))
        params = self._qc.init(rng, dummy_o, dummy_a)
        return {'qc': params, 'qc_opt': self._qc_opt.init(params)}

    # ---- rollout hooks ---------------------------------------------------
    def rollout_carry_init(self, B):
        return {'prev_c': jnp.zeros(B, jnp.float32)}

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        corrected = usl_correction(
            self._qc.apply, s.extra['qc'], obs, a, self.hp['delta']
        )
        use = epoch_frac > self.hp['warmup_ratio']
        a_safe = jnp.where(use, corrected, a)
        qc = self._qc.apply(s.extra['qc'], obs, a_safe)
        # observability: how far the correction moved the action (0 during
        # warmup) — surfaces whether the Qc descent is actually active
        corr = jnp.linalg.norm(a_safe - a, axis=-1)
        return a_safe, {'qc': qc, 'corr_mag': corr}

    def process_cost(self, cost, carry, done):
        new_carry = {'prev_c': jnp.where(done > 0, 0.0, cost)}
        return cost, new_carry, {'prev_cost': carry['prev_c']}

    # ---- update ----------------------------------------------------------
    def update(self, nets, s, data, aux, opts):
        s, metrics = super().update(nets, s, data, aux, opts)
        metrics['CorrectionMag'] = wmean(data['corr_mag'], data['valid'])
        return s, metrics

    def post_accept(self, nets, s, data, aux, c, accepted, opts):
        # Qc TD fit: target = cost + gamma * qc_{t+1} * (1-done)
        # (usl.py:107,127 with zeroed bootstrap at segment ends)
        gamma = self.hp['gamma']
        qc_tb, cost_tb, done_tb = data['qc_tb'], data['cost_tb'], data['done_tb']
        qc_next = jnp.concatenate([qc_tb[1:], jnp.zeros_like(qc_tb[:1])], axis=0)
        target = cost_tb + gamma * qc_next * (1.0 - done_tb)
        target_flat = target.reshape(-1)
        obs, act_safe, w = data['obs'], data['act_safe'], data['valid']

        def loss_fn(p):
            return wmean((self._qc.apply(p, obs, act_safe) - target_flat) ** 2, w)

        def body(_, carry):
            p, st = carry
            grads = jax.grad(loss_fn)(p)
            updates, st = self._qc_opt.update(grads, st, p)
            return (optax.apply_updates(p, updates), st)

        qc, qc_opt = jax.lax.fori_loop(
            0, int(self.hp['train_ccritic_iters']), body,
            (s.extra['qc'], s.extra['qc_opt']),
        )
        return s.replace(extra={**s.extra, 'qc': qc, 'qc_opt': qc_opt})


class LPG(USL):
    """LPG = TRPO + USL-style correction active from the start (lpg.py:497)."""

    name = "lpg"

    def __init__(self, **hp):
        hp.setdefault('warmup_ratio', -1.0)  # always on
        super().__init__(**hp)


class SafetyLayer(TRPO):
    name = "safelayer"

    def __init__(self, **hp):
        hp.setdefault('ccritic_lr', 1e-3)
        hp.setdefault('train_ccritic_iters', 80)
        hp.setdefault('delta', 0.0)
        hp.setdefault('max_action', 1.0)
        # the reference gates the correction behind the SAME 1/3-of-epochs
        # warmup as USL (safelayer.py:517-520) — the g-model identifies on
        # uncorrected policy data first. Running it from epoch 0 (r3
        # behavior) corrects along an untrained g and never suppresses
        # cost (r4 reference side-by-side, LEARNING.md).
        hp.setdefault('warmup_ratio', 1.0 / 3.0)
        super().__init__(**hp)
        self.needs_cost_critic = False
        # g-network: obs -> act_dim coefficients of the linear cost model
        self._g_lr = self.hp['ccritic_lr']

    def init_extra(self, rng, nets: Networks):
        self._g_net = core.MLP((64, 64, nets.act_dim), activation="tanh")
        params = self._g_net.init(rng, jnp.zeros((1, nets.obs_dim)))
        self._g_opt = optax.adam(self._g_lr)
        return {'g': params, 'g_opt': self._g_opt.init(params),
                'gc_loss': jnp.float32(0.0), 'gc_corr': jnp.float32(0.0)}

    def _pred_c(self, g_params, obs, act):
        g = self._g_net.apply(g_params, obs)
        return jnp.sum(g * act, axis=-1)

    # ---- rollout hooks ---------------------------------------------------
    def rollout_carry_init(self, B):
        return {'prev_c': jnp.zeros(B, jnp.float32)}

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        """Closed-form Dalal correction (safelayer_core.py:169-190)."""
        g = self._g_net.apply(s.extra['g'], obs)  # (B, A)
        prev_c = carry['prev_c']
        pred = jnp.sum(g * a, axis=-1) + prev_c
        numer = pred - self.hp['delta']
        denom = jnp.sum(g * g, axis=-1) + 1e-8
        mult = jax.nn.relu(numer / denom)
        a_new = a - mult[:, None] * g
        a_new = jnp.clip(a_new, -self.hp['max_action'], self.hp['max_action'])
        a_new = jnp.where((pred > self.hp['delta'])[:, None], a_new, a)
        use = epoch_frac > self.hp['warmup_ratio']
        a_safe = jnp.where(use, a_new, a)
        corr = jnp.linalg.norm(a_safe - a, axis=-1)
        return a_safe, {'corr_mag': corr}

    def process_cost(self, cost, carry, done):
        new_carry = {'prev_c': jnp.where(done > 0, 0.0, cost)}
        return cost, new_carry, {'prev_cost': carry['prev_c']}

    # ---- update ----------------------------------------------------------
    def update(self, nets, s, data, aux, opts):
        s, metrics = super().update(nets, s, data, aux, opts)
        metrics['CorrectionMag'] = wmean(data['corr_mag'], data['valid'])
        metrics['LossGC'] = s.extra['gc_loss']
        metrics['GCCorr'] = s.extra['gc_corr']
        return s, metrics

    def post_accept(self, nets, s, data, aux, c, accepted, opts):
        # fit the linear cost model: (g(s)^T a_safe + prev_cost - cost)^2
        # with zero-target downsampling (safelayer.py:384-400)
        obs, act_safe = data['obs'], data['act_safe']
        cost, prev_cost = data['cost'], data['prev_cost']
        w = downsample_weights(cost, data['valid'])

        def loss_fn(p):
            cur = self._pred_c(p, obs, act_safe) + prev_cost
            return wmean((cur - cost) ** 2, w)

        def body(_, carry):
            p, st = carry
            grads = jax.grad(loss_fn)(p)
            updates, st = self._g_opt.update(grads, st, p)
            return (optax.apply_updates(p, updates), st)

        g, g_opt = jax.lax.fori_loop(
            0, int(self.hp['train_ccritic_iters']), body,
            (s.extra['g'], s.extra['g_opt']),
        )
        # fit diagnostics: weighted MSE + correlation of predicted vs
        # actual cost increments on this epoch's batch (is the linear
        # model predictive at all?)
        pred_inc = self._pred_c(g, obs, act_safe)
        true_inc = cost - prev_cost
        wm = w / jnp.maximum(jnp.sum(w), 1.0)
        mp, mt = jnp.sum(wm * pred_inc), jnp.sum(wm * true_inc)
        cov = jnp.sum(wm * (pred_inc - mp) * (true_inc - mt))
        sp = jnp.sqrt(jnp.sum(wm * (pred_inc - mp) ** 2) + EPS)
        st_ = jnp.sqrt(jnp.sum(wm * (true_inc - mt) ** 2) + EPS)
        return s.replace(extra={**s.extra, 'g': g, 'g_opt': g_opt,
                                'gc_loss': loss_fn(g),
                                'gc_corr': cov / (sp * st_)})
