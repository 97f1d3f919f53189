"""Trust-region family: TRPO, TRPO-Lagrangian, CPO, PCPO, PDO, TRPO-IPO,
TRPO-FAC.

Each update mirrors its reference trainer's core block:
- TRPO      safe_rl_libX/trpo/trpo.py:386-463
- TRPO-Lag  safe_rl_libX/trpolag/trpolag.py:376-471
- CPO       safe_rl_libX/cpo/cpo.py:425-560
- PCPO      safe_rl_libX/pcpo/pcpo.py:455-500
- PDO       safe_rl_libX/pdo/pdo.py:426-500
- TRPO-IPO  safe_rl_libX/trpoipo/trpoipo.py:370-406
- TRPO-FAC  safe_rl_libX/trpofac/trpofac.py:376-477

All run as single jitted programs: flat gradients, jvp-of-grad FVPs,
while-loop CG and backtracking line search (guardx_tpu.algos.trust_region).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from guardx_tpu.algos import core
from guardx_tpu.algos import trust_region as tr
from guardx_tpu.algos.base import (
    Algorithm, AlgoState, Networks, make_pi_closures, make_mu_logstd_fn,
    pi_diagnostics, constraint_violation, wmean, EPS,
)


def _flat_closures(nets, pi_params, data):
    """Flatten params and build flat-theta loss/cost/kl closures.

    f_kl carries a `fvp_fn` attribute — the same KL over the capped
    curvature batch (base.make_curvature_kl) — which tr.make_fvp picks up,
    so Fisher-vector products run on the subsample while the line search
    keeps the full-batch KL."""
    from guardx_tpu.algos.base import make_curvature_kl

    loss_pi, surr_cost, kl = make_pi_closures(nets, data)
    kl_curv = make_curvature_kl(nets, data)
    theta0, unravel = tr.flatten(pi_params)
    f_loss = lambda th: loss_pi(unravel(th))
    f_cost = lambda th: surr_cost(unravel(th))
    f_kl = lambda th: kl(unravel(th))
    f_kl.fvp_fn = lambda th: kl_curv(unravel(th))
    return theta0, unravel, f_loss, f_cost, f_kl


class TRPO(Algorithm):
    """Unconstrained trust region (reference trpo/trpo.py:386-463)."""

    name = "trpo"
    needs_cost_critic = True  # reference trpo still tracks vc? no — it logs
    # cost metrics but has no cost critic; keep one for uniform state (its
    # training is skipped below).

    def __init__(self, **hp):
        super().__init__(**hp)
        self.needs_cost_critic = False

    def direction(self, nets, s, data, aux, theta0, f_loss, f_cost, f_kl):
        g = jax.grad(f_loss)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        x_hat = tr.cg(fvp, g)
        sHs = jnp.dot(x_hat, fvp(x_hat))
        return jnp.sqrt(2 * self.hp['target_kl'] / (sHs + EPS)) * x_hat

    def accept(self, pi_l_old, surr_cost_old, c):
        tk = self.hp['target_kl']

        def ok(kl, pi_l):
            return jnp.logical_and(kl <= tk, pi_l <= pi_l_old)

        return ok

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, f_loss, f_cost, f_kl = _flat_closures(nets, s.pi, data)
        pi_l_old = f_loss(theta0)
        surr_cost_old = f_cost(theta0)
        c = constraint_violation(aux, self.hp['target_cost'])
        x_dir = self.direction(nets, s, data, aux, theta0, f_loss, f_cost, f_kl)

        eval_fn = lambda th: (f_kl(th), f_loss(th))
        theta_new, accepted, j = tr.backtracking_line_search(
            eval_fn, self.accept(pi_l_old, surr_cost_old, c), theta0, x_dir,
            self.hp['backtrack_coeff'], int(self.hp['backtrack_iters']),
        )
        s = s.replace(pi=unravel(theta_new))
        s = self.post_accept(nets, s, data, aux, c, accepted, opts)
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])

        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        metrics = dict(
            LossPi=pi_l_old, LossCost=surr_cost_old,
            DeltaLossPi=f_loss(theta_new) - pi_l_old,
            DeltaLossCost=f_cost(theta_new) - surr_cost_old,
            KL=approx_kl, Entropy=ent, LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
        return s, metrics

    def post_accept(self, nets, s, data, aux, c, accepted, opts):
        return s


class TRPOLag(TRPO):
    """TRPO + fixed Lagrange multiplier with dual ascent
    (reference trpolag/trpolag.py:376-471)."""

    name = "trpolag"

    def __init__(self, **hp):
        hp.setdefault('lam_lr', 0.005)  # trpolag.py:612 CLI default
        hp.setdefault('lmd_init', 0.0)
        super().__init__(**hp)
        self.needs_cost_critic = True

    def init_extra(self, rng, nets):
        return {'lmd': jnp.float32(self.hp['lmd_init'])}

    def direction(self, nets, s, data, aux, theta0, f_loss, f_cost, f_kl):
        lmd = s.extra['lmd']
        f_total = lambda th: f_loss(th) + lmd * f_cost(th)
        g = jax.grad(f_total)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        x_hat = tr.cg(fvp, g)
        sHs = jnp.dot(x_hat, fvp(x_hat))
        return jnp.sqrt(2 * self.hp['target_kl'] / (sHs + EPS)) * x_hat

    def post_accept(self, nets, s, data, aux, c, accepted, opts):
        # dual ascent on the UN-rescaled violation (trpolag.py:466-471)
        viol = aux['ep_cost'] - self.hp['target_cost']
        lmd = jnp.maximum(0.0, s.extra['lmd'] + self.hp['lam_lr'] * viol)
        return s.replace(extra={**s.extra, 'lmd': lmd})


class CPO(TRPO):
    """Constrained Policy Optimization: full QP with optim cases 0-4
    (reference cpo/cpo.py:425-560)."""

    name = "cpo"

    def __init__(self, **hp):
        super().__init__(**hp)
        self.needs_cost_critic = True

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, f_loss, f_cost, f_kl = _flat_closures(nets, s.pi, data)
        pi_l_old = f_loss(theta0)
        surr_cost_old = f_cost(theta0)
        c = constraint_violation(aux, self.hp['target_cost'])
        tk = self.hp['target_kl']

        g = jax.grad(f_loss)(theta0)
        b = jax.grad(f_cost)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        Hinv_g = tr.cg(fvp, g)
        approx_g = fvp(Hinv_g)
        Hinv_b = tr.cg(fvp, b)
        Hx_Hinv_b = fvp(Hinv_b)
        x_dir, optim_case, lam, nu = tr.cpo_direction(
            Hinv_g, Hinv_b, approx_g, Hx_Hinv_b, b, c, tk
        )

        cost_reduction = self.hp['cost_reduction']
        cost_bound = jnp.maximum(-c, -cost_reduction)

        def accept(kl, pi_l, s_cost):
            ok = kl <= tk
            # loss non-increase required only when feasible (optim_case > 1)
            ok = jnp.logical_and(
                ok, jnp.where(optim_case > 1, pi_l <= pi_l_old, True)
            )
            ok = jnp.logical_and(ok, s_cost - surr_cost_old <= cost_bound)
            return ok

        eval_fn = lambda th: (f_kl(th), f_loss(th), f_cost(th))
        theta_new, accepted, j = tr.backtracking_line_search(
            eval_fn, accept, theta0, x_dir,
            self.hp['backtrack_coeff'], int(self.hp['backtrack_iters']),
        )
        s = s.replace(pi=unravel(theta_new))
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])

        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        metrics = dict(
            LossPi=pi_l_old, LossCost=surr_cost_old,
            DeltaLossPi=f_loss(theta_new) - pi_l_old,
            DeltaLossCost=f_cost(theta_new) - surr_cost_old,
            KL=approx_kl, Entropy=ent,
            OptimCase=optim_case.astype(jnp.float32),
            LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
        return s, metrics


class PCPO(TRPO):
    """Projection-based CPO (reference pcpo/pcpo.py:455-500): TRPO step then
    projection onto the cost constraint; NO line search — the full step is
    always applied (pcpo.py:492-495). kl_proj selects KL- vs L2-projection."""

    name = "pcpo"

    def __init__(self, **hp):
        hp.setdefault('kl_proj', True)
        super().__init__(**hp)
        self.needs_cost_critic = True

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, f_loss, f_cost, f_kl = _flat_closures(nets, s.pi, data)
        pi_l_old = f_loss(theta0)
        surr_cost_old = f_cost(theta0)
        c = constraint_violation(aux, self.hp['target_cost'])
        tk = self.hp['target_kl']

        # PCPO maximizes the reward surrogate J = +E[ratio*adv]
        # (pcpo.py:393: "the gradient PCPO requires is for (maximize J)"),
        # so g here is the ASCENT gradient: -grad(loss).
        g = -jax.grad(f_loss)(theta0)
        b = jax.grad(f_cost)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        Hinv_g = tr.cg(fvp, g)
        approx_g = fvp(Hinv_g)
        q = jnp.dot(Hinv_g, approx_g)
        if self.hp['kl_proj']:
            Linv_b = tr.cg(fvp, b)
            approx_b = fvp(Linv_b)
        else:
            Linv_b, approx_b = b, b

        trpo_step = jnp.sqrt(2 * tk / (q + EPS))
        cpo_step = jnp.maximum(
            0.0, (trpo_step * jnp.dot(b, Hinv_g) + c)
            / (jnp.dot(Linv_b, approx_b) + EPS),
        )
        # full projected step, no line search (pcpo.py:483-495)
        x_dir = trpo_step * Hinv_g - cpo_step * Linv_b
        theta_new = theta0 + x_dir
        s = s.replace(pi=unravel(theta_new))
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        metrics = dict(
            LossPi=pi_l_old, LossCost=surr_cost_old,
            DeltaLossPi=f_loss(theta_new) - pi_l_old,
            DeltaLossCost=f_cost(theta_new) - surr_cost_old,
            KL=approx_kl, Entropy=ent,
            **critic_metrics,
        )
        return s, metrics


class PDO(TRPO):
    """Primal-dual optimization (reference pdo/pdo.py:426-500): direction
    from g - nu*b, dual ascent on nu only when the step is accepted."""

    name = "pdo"

    def __init__(self, **hp):
        hp.setdefault('nu_init', 0.1)   # pdo.py:227
        hp.setdefault('nu_alpha', 0.05)  # pdo.py:651 CLI default
        super().__init__(**hp)
        self.needs_cost_critic = True

    def init_extra(self, rng, nets):
        return {'nu': jnp.float32(self.hp['nu_init'])}

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, f_loss, f_cost, f_kl = _flat_closures(nets, s.pi, data)
        pi_l_old = f_loss(theta0)
        surr_cost_old = f_cost(theta0)
        c = constraint_violation(aux, self.hp['target_cost'])
        tk = self.hp['target_kl']
        nu = s.extra['nu']

        g = jax.grad(f_loss)(theta0)
        b = jax.grad(f_cost)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        Hinv_g = tr.cg(fvp, g)
        approx_g = fvp(Hinv_g)
        t = approx_g - nu * b
        Hinv_t = tr.cg(fvp, t)
        sHs = jnp.dot(Hinv_t, fvp(Hinv_t))
        x_dir = jnp.sqrt(2 * tk / (sHs + EPS)) * Hinv_t

        cost_bound = jnp.maximum(-c, -self.hp['cost_reduction'])

        def accept(kl, pi_l, s_cost):
            return jnp.logical_and(
                kl <= tk,
                jnp.logical_and(
                    pi_l <= pi_l_old, s_cost - surr_cost_old <= cost_bound
                ),
            )

        eval_fn = lambda th: (f_kl(th), f_loss(th), f_cost(th))
        theta_new, accepted, j = tr.backtracking_line_search(
            eval_fn, accept, theta0, x_dir,
            self.hp['backtrack_coeff'], int(self.hp['backtrack_iters']),
        )
        # dual ascent only on acceptance (pdo.py:500)
        nu_new = jnp.where(
            accepted, jnp.maximum(nu + self.hp['nu_alpha'] * c, 0.0), nu
        )
        s = s.replace(pi=unravel(theta_new), extra={**s.extra, 'nu': nu_new})
        s, critic_metrics = self.fit_critics(nets, s, data, opts['v'], opts['vc'])
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        metrics = dict(
            LossPi=pi_l_old, LossCost=surr_cost_old,
            DeltaLossPi=f_loss(theta_new) - pi_l_old,
            DeltaLossCost=f_cost(theta_new) - surr_cost_old,
            KL=approx_kl, Entropy=ent, Nu=nu_new,
            LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
        return s, metrics


class TRPOIPO(TRPO):
    """Interior-point TRPO (reference trpoipo/trpoipo.py:370-406): log-barrier
    on the per-episode importance-weighted cost return."""

    name = "trpoipo"

    def __init__(self, **hp):
        hp.setdefault('t_ipo', 0.01)    # trpoipo.py:214
        hp.setdefault('penalty', 0.01)  # trpoipo.py:214
        super().__init__(**hp)
        self.needs_cost_critic = False

    def _ipo_loss(self, nets, data):
        """theta -> loss including the barrier term.

        The reference loops over episode ids (trpoipo.py:384-391); here
        per-episode sums come from reset-at-done scans over the (T, B)
        layout, evaluated at the segment-end (done) steps — fixed shapes.
        """
        cost_tb = data['cost_tb']
        done_tb = data['done_tb']    # (T, B) with the final row forced done
        adv, logp_old, w = data['adv'], data['logp'], data['valid']
        tc = self.hp['target_cost']
        mu_fn = make_mu_logstd_fn(nets, data)
        T, B_ = done_tb.shape

        def f(theta_unraveled):
            mu, log_std = mu_fn(theta_unraveled)
            logp = core.gaussian_logp(mu, log_std, data['act'])
            ratio = jnp.exp(logp - logp_old)
            loss_pi = -wmean(ratio * adv, w)

            # flat rows are the (T, B) reshape — one policy eval serves both
            dlp = (logp - logp_old).reshape(T, B_)  # (T, B)

            def seg(carry, xs):
                lp_sum, c_sum = carry
                d, dl, ct = xs
                lp_sum = lp_sum + dl
                c_sum = c_sum + ct
                out = (lp_sum, c_sum)
                # reset after a done step
                lp_sum = lp_sum * (1.0 - d)
                c_sum = c_sum * (1.0 - d)
                return (lp_sum, c_sum), out

            B = done_tb.shape[1]
            (_, _), (lp_sums, c_sums) = jax.lax.scan(
                seg, (jnp.zeros(B), jnp.zeros(B)), (done_tb, dlp, cost_tb)
            )
            n_epi = jnp.maximum(jnp.sum(done_tb), 1.0)
            J_C = jnp.sum(done_tb * jnp.exp(lp_sums) * c_sums) / n_epi
            J_t = J_C - tc
            phi = jnp.where(
                J_t < 0,
                jnp.log(jnp.maximum(-J_t, EPS)) / self.hp['t_ipo'],
                -J_t * self.hp['penalty'],
            )
            return loss_pi - phi

        return f

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, _, _, f_kl = _flat_closures(nets, s.pi, data)
        ipo = self._ipo_loss(nets, data)
        f_loss = lambda th: ipo(unravel(th))

        pi_l_old = f_loss(theta0)
        g = jax.grad(f_loss)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        x_hat = tr.cg(fvp, g)
        sHs = jnp.dot(x_hat, fvp(x_hat))
        tk = self.hp['target_kl']
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
        metrics = dict(
            LossPi=pi_l_old, DeltaLossPi=f_loss(theta_new) - pi_l_old,
            KL=approx_kl, Entropy=ent,
            LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
        return s, metrics


class TRPOFAC(TRPO):
    """State-dependent Lagrangian (FAC) — multiplier NETWORK lam_net(obs)
    (reference trpofac/trpofac.py:376-477, trpofac_core.py:157-187)."""

    name = "trpofac"

    def __init__(self, **hp):
        hp.setdefault('lam_lr', 0.005)
        super().__init__(**hp)
        self.needs_cost_critic = True
        self._lam_opt = optax.adam(self.hp['lam_lr'])

    def init_extra(self, rng, nets):
        lam_net = core.LambdaNet()
        params = lam_net.init(rng, jnp.zeros((1, nets.obs_dim)))
        self._lam_net = lam_net
        return {'lam_params': params, 'lam_opt': self._lam_opt.init(params)}

    def direction(self, nets, s, data, aux, theta0, f_loss, f_cost, f_kl):
        lam_net = core.LambdaNet()
        lam_s = jax.lax.stop_gradient(
            lam_net.apply(s.extra['lam_params'], data['obs'])
        )
        act, adc = data['act'], data['adc']
        logp_old, w = data['logp'], data['valid']
        _, unravel = tr.flatten(s.pi)
        mu_fn = make_mu_logstd_fn(nets, data)

        def f_total(th):
            p = unravel(th)
            mu, log_std = mu_fn(p)
            logp = core.gaussian_logp(mu, log_std, act)
            ratio = jnp.exp(logp - logp_old)
            return -wmean(ratio * data['adv'], w) + wmean(lam_s * ratio * adc, w)

        g = jax.grad(f_total)(theta0)
        fvp = tr.make_fvp(f_kl, theta0)
        x_hat = tr.cg(fvp, g)
        sHs = jnp.dot(x_hat, fvp(x_hat))
        return jnp.sqrt(2 * self.hp['target_kl'] / (sHs + EPS)) * x_hat

    def post_accept(self, nets, s, data, aux, c, accepted, opts):
        # one Adam step on the lam_net loss (trpofac.py:402-406,471-475)
        lam_net = core.LambdaNet()
        tc = self.hp['target_cost']

        def lam_loss(p):
            lam = lam_net.apply(p, data['obs'])
            return wmean(-lam * (data['cret'] - tc), data['valid'])

        grads = jax.grad(lam_loss)(s.extra['lam_params'])
        updates, lam_opt = self._lam_opt.update(
            grads, s.extra['lam_opt'], s.extra['lam_params']
        )
        lam_params = optax.apply_updates(s.extra['lam_params'], updates)
        return s.replace(
            extra={**s.extra, 'lam_params': lam_params, 'lam_opt': lam_opt}
        )
