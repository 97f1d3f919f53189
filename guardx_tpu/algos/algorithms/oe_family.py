"""One-episode-only algorithms: AlphaPPO, V-MPO, ESPO, PAPO.

The reference ships these solely as *_one_episode variants (each env
contributes exactly one episode per epoch — SURVEY.md §2.2); here they are
Algorithm subclasses with ``one_episode = True`` over the shared runner.

References:
- AlphaPPO  safe_rl_libX/alphappo_one_episode/alphappo.py:260-347,454-460
  (alpha-divergence penalty in the loss, adaptive beta doubling/halving on
  the post-update precise KL), alphappo_core.py:104-137 (alpha_kl)
- V-MPO     safe_rl_libX/vmpo_one_episode/vmpo.py:263-345 (top-half
  advantages, learned temperature eta and trust-region alpha as Lagrange
  variables, eta/alpha clamped to >= 1e-8)
- ESPO      safe_rl_libX/espo_one_episode/espo.py:254-320 (unclipped
  surrogate, early stop when the update deviation exceeds delta=0.25,
  AbsoluteRatioDeviation logged)
- PAPO      safe_rl_libX/papo_one_episode/papo.py:283-330 (APO's
  variance-regularized surrogate with PPO proximal clipping and the
  'detailed' KL-bias correction; Adam + KL early stop)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from guardx_tpu.algos import core
from guardx_tpu.algos.base import (
    Algorithm, AlgoState, Networks, make_mu_logstd_fn, pi_diagnostics,
    wmean, EPS,
)

sg = jax.lax.stop_gradient


def adam_pi_loop(loss_fn, opt, params, opt_state, iters: int, target_kl):
    """train_pi_iters Adam steps with KL early stop, KL checked BEFORE the
    step is applied (the shared update skeleton of the reference's
    PPO-family trainers, e.g. alphappo.py:316-327). loss_fn(p) must return
    (loss, approx_kl)."""

    def cond(carry):
        i, p, s, kl = carry
        return jnp.logical_and(i < iters, kl <= target_kl)

    def body(carry):
        i, p, s, _ = carry
        (loss, kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_s = opt.update(grads, s, p)
        new_p = optax.apply_updates(p, updates)
        stop = kl > target_kl
        p = jax.tree_util.tree_map(lambda a, b: jnp.where(stop, a, b), p, new_p)
        s = jax.tree_util.tree_map(lambda a, b: jnp.where(stop, a, b), s, new_s)
        return i + 1, p, s, kl

    i, params, opt_state, kl = jax.lax.while_loop(
        cond, body, (jnp.int32(0), params, opt_state, jnp.float32(0.0))
    )
    return params, opt_state, i, kl


def alpha_kl(mu0, log_std0, mu1, log_std1, alpha, w):
    """Mean alpha-divergence between diagonal gaussians
    (alphappo_core.py alpha_kl)."""
    std0, std1 = jnp.exp(log_std0), jnp.exp(log_std1)
    denom = alpha * std1 ** 2 + (1 - alpha) * std0 ** 2
    factor = (std0 ** (1 - alpha)) * (std1 ** alpha) / jnp.sqrt(denom + EPS)
    expo = alpha * (alpha - 1) * (mu0 - mu1) ** 2 / (2.0 * denom + EPS)
    pre = (factor * jnp.exp(expo) - 1) / (alpha * (alpha - 1))
    return wmean(jnp.sum(pre, axis=-1), w)


class ESPO(Algorithm):
    """Early-Stopping Policy Optimization (espo.py:254-320): unclipped
    ratio surrogate; each Adam step is gated on the mean update deviation
    staying under delta (the reference gates on the averaged approx-KL
     'dev' against --delta, default 0.25)."""

    name = "espo"
    one_episode = True
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('delta', 0.25)  # espo.py:466 CLI default
        hp.setdefault('pi_lr', 3e-4)
        hp.setdefault('train_pi_iters', 80)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_pi_opt(self, pi_params):
        return {'pi_opt': self._pi_opt.init(pi_params)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv = data['act'], data['adv']
        logp_old, w = data['logp'], data['valid']
        mu_fn = make_mu_logstd_fn(nets, data)

        def loss_fn(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            return -wmean(ratio * adv, w), wmean(logp_old - logp, w)

        pi_l_old, _ = loss_fn(s.pi)
        pi, pi_opt, i, _ = adam_pi_loop(
            loss_fn, self._pi_opt, s.pi, s.extra['pi_opt'],
            int(self.hp['train_pi_iters']), self.hp['delta'],
        )
        s = s.replace(pi=pi, extra={**s.extra, 'pi_opt': pi_opt})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])

        mu, log_std = mu_fn(s.pi)
        logp = core.gaussian_logp(mu, log_std, act)
        deviation = wmean(jnp.abs(jnp.exp(logp - logp_old) - 1.0), w)
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        loss_new, _ = loss_fn(s.pi)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=loss_new - pi_l_old,
            KL=approx_kl, Entropy=ent, StopIter=i.astype(jnp.float32),
            AbsoluteRatioDeviation=deviation, **critic_metrics,
        )


class AlphaPPO(Algorithm):
    """PPO with an alpha-divergence penalty and adaptive beta
    (alphappo.py:281-287 loss; 454-460 beta doubling/halving on the
    post-update alpha-KL vs target_kl). beta lives in AlgoState.extra so
    the whole schedule stays inside the jitted epoch."""

    name = "alphappo"
    one_episode = True
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('beta', 0.5)   # alphappo.py:497 CLI default
        hp.setdefault('alpha', 0.5)  # alphappo.py:498 CLI default
        hp.setdefault('pi_lr', 3e-4)
        hp.setdefault('train_pi_iters', 80)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_extra(self, rng, nets):
        return {'beta': jnp.float32(self.hp['beta'])}

    def init_pi_opt(self, pi_params):
        return {'pi_opt': self._pi_opt.init(pi_params)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv = data['act'], data['adv']
        logp_old, mu_old, logstd_old = data['logp'], data['mu'], data['logstd']
        w = data['valid']
        beta = s.extra['beta']
        a = self.hp['alpha']
        tk = self.hp['target_kl']
        mu_fn = make_mu_logstd_fn(nets, data)

        def loss_fn(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            akl = alpha_kl(mu_old, logstd_old, mu, log_std, a, w)
            loss = -(1 - beta) * wmean(ratio * adv, w) + beta * akl
            return loss, wmean(logp_old - logp, w)

        pi_l_old, _ = loss_fn(s.pi)
        pi, pi_opt, i, _ = adam_pi_loop(
            loss_fn, self._pi_opt, s.pi, s.extra['pi_opt'],
            int(self.hp['train_pi_iters']), tk,
        )

        # post-update precise alpha-KL drives the beta schedule
        mu, log_std = mu_fn(pi)
        precise_kl = alpha_kl(mu_old, logstd_old, mu, log_std, a, w)
        beta_new = jnp.where(precise_kl >= tk, 2.0 * beta, 0.5 * beta)

        s = s.replace(pi=pi, extra={**s.extra, 'pi_opt': pi_opt,
                                    'beta': beta_new})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        loss_new, _ = loss_fn(s.pi)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=loss_new - pi_l_old,
            KL=approx_kl, Entropy=ent, StopIter=i.astype(jnp.float32),
            PreciseKL=precise_kl, Beta=beta, **critic_metrics,
        )


class VMPO(Algorithm):
    """V-MPO (vmpo.py:263-345): E-step keeps the top half of advantages,
    weights them by softmax(adv/eta); eta and the trust-region multiplier
    alpha are learned jointly with the policy and clamped >= 1e-8.

    Top-half selection is threshold-based for fixed shapes: the k-th
    largest valid advantage (k = floor(n_valid/2)) gates the 'good' set —
    the reference slices the sorted valid batch directly (vmpo.py:287-290).
    """

    name = "vmpo"
    one_episode = True
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('eps_eta', 0.1)     # vmpo.py:137 defaults
        hp.setdefault('eps_alpha', 0.008)
        hp.setdefault('pi_lr', 3e-4)
        hp.setdefault('train_pi_iters', 80)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_extra(self, rng, nets):
        # eta init 1.0, alpha init 5.0 (vmpo.py:263-264)
        return {'eta': jnp.float32(1.0), 'alpha': jnp.float32(5.0)}

    def init_pi_opt(self, pi_params):
        # one Adam over (pi, eta, alpha) — the reference passes all three
        # parameter groups to a single Adam (vmpo.py:313-319)
        joint = {'pi': pi_params, 'eta': jnp.float32(1.0),
                 'alpha': jnp.float32(5.0)}
        return {'pi_opt': self._pi_opt.init(joint)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv = data['act'], data['adv']
        logp_old, mu_old, logstd_old = data['logp'], data['mu'], data['logstd']
        w = data['valid']
        mu_fn = make_mu_logstd_fn(nets, data)
        eps_eta, eps_alpha = self.hp['eps_eta'], self.hp['eps_alpha']
        tk = self.hp['target_kl']

        # top-half threshold over valid advantages
        n_valid = jnp.sum(w)
        k = jnp.maximum((n_valid / 2).astype(jnp.int32), 1)
        sorted_desc = jnp.sort(jnp.where(w > 0, adv, -jnp.inf))[::-1]
        thresh = jnp.take(sorted_desc, k - 1)
        good = w * (adv >= thresh)

        from guardx_tpu.algos.base import weighted_gaussian_kl

        def loss_fn(joint):
            p, eta, alpha = joint['pi'], joint['eta'], joint['alpha']
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            # E-step weights with detached temperature
            z = jnp.where(good > 0, adv / sg(eta), -jnp.inf)
            z = z - jnp.max(jnp.where(good > 0, z, -jnp.inf))
            e = jnp.where(good > 0, jnp.exp(z), 0.0)
            phis = e / (jnp.sum(e) + EPS)
            l_pi = -jnp.sum(phis * logp)
            # temperature loss on the good set
            mean_exp = wmean(jnp.exp(adv / eta), good)
            l_eta = eta * eps_eta + eta * jnp.log(mean_exp + EPS)
            # trust-region multiplier loss
            kl = weighted_gaussian_kl(mu_old, logstd_old, mu, log_std, w)
            l_alpha = alpha * (eps_alpha - sg(kl)) + sg(alpha) * kl
            return l_pi + l_eta + l_alpha, wmean(logp_old - logp, w)

        joint0 = {'pi': s.pi, 'eta': s.extra['eta'], 'alpha': s.extra['alpha']}
        pi_l_old, _ = loss_fn(joint0)

        opt = self._pi_opt

        def cond(carry):
            i, j, os_, kl = carry
            return jnp.logical_and(i < int(self.hp['train_pi_iters']), kl <= tk)

        def body(carry):
            i, j, os_, _ = carry
            (loss, kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(j)
            updates, new_os = opt.update(grads, os_, j)
            new_j = optax.apply_updates(j, updates)
            # clamp eta/alpha (vmpo.py:343-344)
            new_j = dict(new_j,
                         eta=jnp.maximum(new_j['eta'], 1e-8),
                         alpha=jnp.maximum(new_j['alpha'], 1e-8))
            stop = kl > tk
            j = jax.tree_util.tree_map(lambda x, y: jnp.where(stop, x, y),
                                       j, new_j)
            os_ = jax.tree_util.tree_map(lambda x, y: jnp.where(stop, x, y),
                                         os_, new_os)
            return i + 1, j, os_, kl

        i, joint, pi_opt, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), joint0, s.extra['pi_opt'],
                         jnp.float32(0.0))
        )
        s = s.replace(pi=joint['pi'],
                      extra={**s.extra, 'pi_opt': pi_opt,
                             'eta': joint['eta'], 'alpha': joint['alpha']})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        loss_new, _ = loss_fn(joint)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=loss_new - pi_l_old,
            KL=approx_kl, Entropy=ent, StopIter=i.astype(jnp.float32),
            Eta=joint['eta'], Alpha=joint['alpha'], **critic_metrics,
        )


class PAPO(Algorithm):
    """Proximal Absolute Policy Optimization (papo.py:283-330): APO's
    variance-regularized objective with PPO clipping on both the mean and
    variance surrogates, plus the 'detailed' KL-bias floor on min_J^2;
    optimized with Adam + KL early stop (not APO's CG/line-search)."""

    name = "papo"
    one_episode = True
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('clip_ratio', 0.2)   # papo.py:134
        hp.setdefault('omega_1', 0.001)    # papo.py:523-525 CLI defaults
        hp.setdefault('omega_2', 0.005)
        hp.setdefault('k', 10.5)
        hp.setdefault('detailed', True)
        hp.setdefault('pi_lr', 3e-4)
        hp.setdefault('train_pi_iters', 80)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_pi_opt(self, pi_params):
        return {'pi_opt': self._pi_opt.init(pi_params)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv = data['act'], data['adv']
        delta_td, val = data['delta'], data['val']
        logp_old, w = data['logp'], data['valid']
        mu_fn = make_mu_logstd_fn(nets, data)
        clip = self.hp['clip_ratio']
        om1, om2, k = self.hp['omega_1'], self.hp['omega_2'], self.hp['k']
        gamma = self.hp['gamma']
        tk = self.hp['target_kl']

        def loss_fn(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            clipped = jnp.clip(ratio, 1 - clip, 1 + clip)

            mean_surr = wmean(jnp.minimum(ratio * adv, clipped * adv), w)

            tmp = (ratio - 1) * delta_td ** 2 + 2 * ratio * delta_td * om2
            ctmp = (clipped - 1) * delta_td ** 2 + 2 * clipped * delta_td * om2
            mean_var_surr = om1 * wmean(jnp.minimum(tmp, ctmp), w)

            val_mean = wmean(val, w)
            min_J_sq = mean_surr ** 2 + 2 * val_mean * mean_surr
            if self.hp['detailed']:
                kl_div = jnp.abs(wmean(logp_old - logp, w))
                epsilon = jnp.max(jnp.where(w > 0, adv, -jnp.inf))
                bias = 4 * gamma * kl_div * epsilon / (1 - gamma) ** 2
                min_J_sq = jnp.where(
                    mean_surr + val_mean - bias < 0, 0.0, min_J_sq
                )

            factor = om1 * (1 - gamma ** 2) / k
            L_ = jnp.abs(adv)
            var_mean_surr = factor * wmean(L_ ** 2 + 2 * L_ * val, w) - min_J_sq
            loss = (-(mean_surr - k * (mean_var_surr + var_mean_surr))
                    * 2.0 / 3.0 - mean_surr / 3.0)
            return loss, wmean(logp_old - logp, w)

        pi_l_old, _ = loss_fn(s.pi)
        pi, pi_opt, i, _ = adam_pi_loop(
            loss_fn, self._pi_opt, s.pi, s.extra['pi_opt'],
            int(self.hp['train_pi_iters']), tk,
        )
        s = s.replace(pi=pi, extra={**s.extra, 'pi_opt': pi_opt})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        loss_new, _ = loss_fn(s.pi)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=loss_new - pi_l_old,
            KL=approx_kl, Entropy=ent, StopIter=i.astype(jnp.float32),
            **critic_metrics,
        )
