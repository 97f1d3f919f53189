"""Policy-gradient family: PPO (clip + KL early stop), A2C, and APO
(variance-regularized trust-region surrogate).

References:
- PPO  safe_rl_libX/ppo/ppo_runner.py:284-340 (clip loss, early stop when
  approx_kl > target_kl, Adam train_pi_iters=80)
- A2C  safe_rl_libX/a2c/a2c.py:266-307 (single Adam step on -E[logp*adv])
- APO  safe_rl_libX/apo/apo.py:370-402,425-465 (mean/variance surrogate mix,
  TRPO-style CG + line search update)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from guardx_tpu.algos import core
from guardx_tpu.algos import trust_region as tr
from guardx_tpu.algos.base import (
    Algorithm, AlgoState, Networks, make_pi_closures, make_mu_logstd_fn,
    pi_diagnostics, wmean, EPS,
)
from guardx_tpu.algos.algorithms.tr_family import TRPO, _flat_closures


class PPO(Algorithm):
    """Clipped surrogate + KL early stop (ppo_runner.py:284-340)."""

    name = "ppo"
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('clip_ratio', 0.2)
        hp.setdefault('pi_lr', 3e-4)
        hp.setdefault('train_pi_iters', 80)
        # rl_games-style minibatched optimization (a2c_common.py
        # train_epoch: mini_epochs sweeps x N/minibatch_size SGD steps).
        # minibatch_size=0 (default) keeps the GUARD reference's
        # full-batch train_pi_iters + KL early-stop semantics
        # (ppo_runner.py:323-331). The FrankaCubeStack r5 diagnosis
        # (LEARNING.md) names this optimization regime — thousands of
        # small clipped steps — as what escapes the hold-align optimum.
        hp.setdefault('minibatch_size', 0)
        hp.setdefault('mini_epochs', 6)
        # rl_games schedulers (rl_games schedulers.py, selected by the
        # train yaml's lr_schedule): 'fixed' keeps OUR KL early stop;
        # 'constant' takes every minibatch step at constant lr with NO
        # early stop (HumanoidAMPPPO.yaml); 'adaptive' additionally
        # scales lr by 1.5 around kl_threshold (FrankaCubeStackPPO.yaml)
        hp.setdefault('lr_schedule', 'fixed')
        hp.setdefault('kl_threshold', 0.008)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_extra(self, rng, nets):
        if int(self.hp['minibatch_size']) > 0:
            extra = {'pi_rng': rng}
            if str(self.hp['lr_schedule']) == 'adaptive':
                extra['pi_lr_now'] = jnp.float32(self.hp['pi_lr'])
            return extra
        return {}

    def init_pi_opt(self, pi_params):
        return {'pi_opt': self._pi_opt.init(pi_params)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv = data['act'], data['adv']
        logp_old, w = data['logp'], data['valid']
        clip = self.hp['clip_ratio']
        tk = self.hp['target_kl']
        mu_fn = make_mu_logstd_fn(nets, data)

        def loss_fn(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            clip_adv = jnp.clip(ratio, 1 - clip, 1 + clip) * adv
            loss = -wmean(jnp.minimum(ratio * adv, clip_adv), w)
            approx_kl = wmean(logp_old - logp, w)
            return loss, approx_kl

        pi_l_old, _ = loss_fn(s.pi)

        mbs = int(self.hp['minibatch_size'])
        if mbs > 0 and not nets.recurrent:
            return self._update_minibatched(
                nets, s, data, aux, opts, loss_fn, pi_l_old
            )

        # train_pi_iters Adam steps with early stop when kl > target_kl
        # (ppo_runner.py:323-331) as a while_loop
        def cond(carry):
            i, p, opt_state, kl = carry
            return jnp.logical_and(i < int(self.hp['train_pi_iters']), kl <= tk)

        def body(carry):
            i, p, opt_state, _ = carry
            (loss, kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            # the reference checks kl BEFORE applying the step
            updates, new_opt = self._pi_opt.update(grads, opt_state, p)
            new_p = optax.apply_updates(p, updates)
            stop = kl > tk
            p = jax.tree_util.tree_map(
                lambda a, b: jnp.where(stop, a, b), p, new_p
            )
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(stop, a, b), opt_state, new_opt
            )
            return i + 1, p, opt_state, kl

        i, pi, pi_opt, kl = jax.lax.while_loop(
            cond, body, (jnp.int32(0), s.pi, s.extra['pi_opt'], jnp.float32(0.0))
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

    def _update_minibatched(self, nets, s, data, aux, opts, loss_full,
                            pi_l_old):
        """mini_epochs x (N // minibatch_size) clipped-surrogate Adam steps
        on random minibatches (a2c_common.py train_epoch structure), with
        the KL early stop evaluated on each minibatch's estimate.
        Feedforward policies only — recurrent sequence replay needs the
        full (T, B) batch and stays on the full-batch path."""
        act, adv = data['act'], data['adv']
        logp_old, w = data['logp'], data['valid']
        clip = self.hp['clip_ratio']
        tk = self.hp['target_kl']
        mbs = int(self.hp['minibatch_size'])
        N = act.shape[0]
        n_mb = max(N // mbs, 1)
        total = max(int(self.hp['mini_epochs']), 1) * n_mb
        sched = str(self.hp['lr_schedule'])
        kl_thr = float(self.hp['kl_threshold'])
        base_lr = float(self.hp['pi_lr'])

        def loss_mb(p, idx):
            mu, log_std = nets.pi_apply(p, data['obs'][idx])
            logp = core.gaussian_logp(mu, log_std, act[idx])
            ratio = jnp.exp(logp - logp_old[idx])
            clip_adv = jnp.clip(ratio, 1 - clip, 1 + clip) * adv[idx]
            loss = -wmean(jnp.minimum(ratio * adv[idx], clip_adv), w[idx])
            approx_kl = wmean(logp_old[idx] - logp, w[idx])
            return loss, approx_kl

        def cond(carry):
            i, p, opt_state, kl, rng, lr = carry
            if sched == 'fixed':
                # our KL early stop (GUARD ppo_runner.py:323-331 carried
                # into the minibatch regime)
                return jnp.logical_and(i < total, kl <= tk)
            # rl_games schedulers take EVERY minibatch step — no early
            # stop; 'constant' keeps lr, 'adaptive' scales it
            return i < total

        def body(carry):
            i, p, opt_state, _, rng, lr = carry
            rng, k = jax.random.split(rng)
            idx = jax.random.randint(k, (mbs,), 0, N)
            (loss, kl), grads = jax.value_and_grad(
                loss_mb, has_aux=True
            )(p, idx)
            updates, new_opt = self._pi_opt.update(grads, opt_state, p)
            if sched == 'adaptive':
                # rl_games AdaptiveScheduler: kl > 2*threshold -> lr/1.5,
                # kl < 0.5*threshold -> lr*1.5, clamped to [1e-6, 1e-2];
                # realized by scaling Adam's update (linear in lr)
                lr = jnp.where(kl > 2.0 * kl_thr,
                               jnp.maximum(lr / 1.5, 1e-6), lr)
                lr = jnp.where(kl < 0.5 * kl_thr,
                               jnp.minimum(lr * 1.5, 1e-2), lr)
                updates = jax.tree_util.tree_map(
                    lambda u: u * (lr / base_lr), updates
                )
            new_p = optax.apply_updates(p, updates)
            if sched == 'fixed':
                stop = kl > tk
                new_p = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(stop, a, b), p, new_p
                )
                new_opt = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(stop, a, b), opt_state, new_opt
                )
            return i + 1, new_p, new_opt, kl, rng, lr

        lr0 = (s.extra['pi_lr_now'] if sched == 'adaptive'
               else jnp.float32(base_lr))
        i, pi, pi_opt, kl, rng, lr_out = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), s.pi, s.extra['pi_opt'], jnp.float32(0.0),
             s.extra['pi_rng'], lr0),
        )
        new_extra = {**s.extra, 'pi_opt': pi_opt, 'pi_rng': rng}
        if sched == 'adaptive':
            # lr persists across epochs (rl_games keeps the scheduler state)
            new_extra['pi_lr_now'] = lr_out
        s = s.replace(pi=pi, extra=new_extra)
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'],
                                             opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        loss_new, _ = loss_full(s.pi)
        out = dict(
            LossPi=pi_l_old, DeltaLossPi=loss_new - pi_l_old,
            KL=approx_kl, Entropy=ent, StopIter=i.astype(jnp.float32),
            **critic_metrics,
        )
        if sched == 'adaptive':
            out['LrNow'] = lr_out
        return s, out


class A2C(Algorithm):
    """Vanilla policy gradient (a2c/a2c.py:266-307): one Adam step on
    -E[logp * adv]."""

    name = "a2c"
    needs_cost_critic = False

    def __init__(self, **hp):
        hp.setdefault('pi_lr', 3e-4)
        super().__init__(**hp)
        self._pi_opt = optax.adam(self.hp['pi_lr'])

    def init_pi_opt(self, pi_params):
        return {'pi_opt': self._pi_opt.init(pi_params)}

    def update(self, nets, s: AlgoState, data, aux, opts):
        act, adv, w = data['act'], data['adv'], data['valid']
        mu_fn = make_mu_logstd_fn(nets, data)

        def loss_fn(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            return -wmean(logp * adv, w)

        pi_l_old, grads = jax.value_and_grad(loss_fn)(s.pi)
        updates, pi_opt = self._pi_opt.update(grads, s.extra['pi_opt'], s.pi)
        pi = optax.apply_updates(s.pi, updates)
        s = s.replace(pi=pi, extra={**s.extra, 'pi_opt': pi_opt})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=loss_fn(pi) - pi_l_old,
            KL=approx_kl, Entropy=ent, **critic_metrics,
        )


class APO(TRPO):
    """Absolute Policy Optimization (apo/apo.py:370-402): TRPO machinery on
    the variance-regularized surrogate

        loss = -(mean_surr - k*(mean_var_surr + var_mean_surr)) * 2/3
               - mean_surr / 3

    where mean_var_surr uses the TD deltas ('adv_pair') and var_mean_surr
    the values (apo.py:383-399, detailed=False path)."""

    name = "apo"

    def __init__(self, **hp):
        hp.setdefault('k', 10.0)        # apo.py:209
        hp.setdefault('omega_1', 0.001)  # apo.py:611 CLI default
        hp.setdefault('omega_2', 0.005)  # apo.py:612 CLI default
        super().__init__(**hp)
        self.needs_cost_critic = False

    def _apo_loss(self, nets, data):
        act, adv = data['act'], data['adv']
        delta, val = data['delta'], data['val']
        logp_old, w = data['logp'], data['valid']
        mu_fn = make_mu_logstd_fn(nets, data)
        k = self.hp['k']
        om1, om2 = self.hp['omega_1'], self.hp['omega_2']
        gamma = self.hp['gamma']

        def f(p):
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            mean_surr = wmean(ratio * adv, w)
            tmp = (ratio - 1) * delta ** 2 + 2 * ratio * delta * om2
            mean_var_surr = om1 * wmean(jnp.abs(tmp), w)
            val_mean = wmean(val, w)
            min_J_sq = mean_surr ** 2 + 2 * val_mean * mean_surr
            factor = om1 * (1 - gamma ** 2) / k
            L_ = jnp.abs(adv)
            var_mean_surr = factor * wmean(L_ ** 2 + 2 * L_ * val, w) - min_J_sq
            return (
                -(mean_surr - k * (mean_var_surr + var_mean_surr)) * 2.0 / 3.0
                - mean_surr / 3.0
            )

        return f

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, _, _, f_kl = _flat_closures(nets, s.pi, data)
        apo = self._apo_loss(nets, data)
        f_loss = lambda th: apo(unravel(th))
        pi_l_old = f_loss(theta0)
        tk = self.hp['target_kl']

        g = jax.grad(f_loss)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        x_hat = tr.cg(fvp, g)
        sHs = jnp.dot(x_hat, fvp(x_hat))
        x_dir = jnp.sqrt(2 * tk / (sHs + EPS)) * x_hat

        def accept(kl, pi_l):
            return jnp.logical_and(kl <= tk, pi_l <= pi_l_old)

        eval_fn = lambda th: (f_kl(th), f_loss(th))
        theta_new, accepted, j = tr.backtracking_line_search(
            eval_fn, accept, theta0, x_dir,
            self.hp['backtrack_coeff'], int(self.hp['backtrack_iters']),
        )
        s = s.replace(pi=unravel(theta_new))
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        return s, dict(
            LossPi=pi_l_old, DeltaLossPi=f_loss(theta_new) - pi_l_old,
            KL=approx_kl, Entropy=ent,
            LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
