"""SCPO: State-wise Constrained Policy Optimization.

Reference safe_rl_libX/scpo/scpo.py:
- observation augmented with the running episode max-cost M
  (scpo.py:636-641,694-700)
- the buffer stores cost INCREMENTS max(cost - M, 0) instead of costs
  (scpo.py:649-656); first step of an episode stores the raw cost
- constraint c = EpMaxCost - target_cost, NOT rescaled by EpLen
  (scpo.py:485-498)
- max-cost critic with softplus head (scpo_core.py:158-165) trained with
  downsampled positive/zero cost returns (scpo.py:419-450) — here the random
  zero-subsampling becomes a deterministic weighting with the same expected
  loss (documented divergence: no host-side np.random.choice under jit)
- CPO-style QP update on the increment advantages
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from guardx_tpu.algos import core, trust_region as tr
from guardx_tpu.algos.base import AlgoState, wmean, EPS
from guardx_tpu.algos.algorithms.tr_family import CPO, _flat_closures


def downsample_weights(target, valid):
    """Weights reproducing the reference's zero-target downsampling in
    expectation: positives weight 1, zeros weight n_pos/n_zero (<=1)."""
    pos = (target > 0).astype(jnp.float32) * valid
    zero = (target == 0).astype(jnp.float32) * valid
    n_pos = jnp.sum(pos)
    n_zero = jnp.maximum(jnp.sum(zero), 1.0)
    frac = jnp.minimum(n_pos / n_zero, 1.0)
    # when there are no positives the reference keeps everything
    frac = jnp.where(n_pos == 0, 1.0, frac)
    return pos + frac * zero


class SCPO(CPO):
    name = "scpo"
    augments_obs = True  # runner appends M to the policy/critic observation
    vc_softplus = True   # max-cost critic head (scpo_core.py:158-165)

    def __init__(self, **hp):
        super().__init__(**hp)

    # ---- rollout hooks -------------------------------------------------
    def rollout_carry_init(self, B):
        return {
            'M': jnp.zeros(B, jnp.float32),
            'first_step': jnp.ones(B, jnp.float32),
        }

    def obs_for_policy(self, obs, carry):
        return jnp.concatenate([obs, carry['M'][:, None]], axis=-1)

    def process_cost(self, cost, carry, done):
        """cost increments + running max M (scpo.py:640-656,694-700)."""
        first = carry['first_step']
        inc = jnp.where(first > 0, cost, jnp.maximum(cost - carry['M'], 0.0))
        M_next = jnp.where(first > 0, cost, carry['M'] + inc)
        # episode boundary: reset M and the first-step flag
        new_carry = {
            'M': jnp.where(done > 0, 0.0, M_next),
            'first_step': jnp.where(done > 0, 1.0, 0.0),
        }
        # EpMaxCost logged at episode end = M at that step
        return inc, new_carry, {'ep_max_cost': M_next}

    # ---- update hooks ---------------------------------------------------
    def constraint(self, aux):
        # c = EpMaxCost - target, un-rescaled (scpo.py:485-498)
        return aux['ep_max_cost'] - self.hp['target_cost']

    def fit_critics(self, nets, s: AlgoState, data, v_opt, vc_opt):
        from guardx_tpu.algos.base import fit_critic, fit_critic_recurrent
        w = downsample_weights(data['cret'], data['valid'])
        if nets.recurrent:
            T, B = data['obs_tb'].shape[:2]
            v, v_opt_state, loss_v = fit_critic_recurrent(
                nets.v_seq, s.v, v_opt, s.v_opt, data['obs_tb'],
                data['done_prev_tb'], data['ret'].reshape(T, B),
                int(self.hp['train_v_iters']), data['valid'].reshape(T, B),
            )
            vc, vc_opt_state, loss_vc = fit_critic_recurrent(
                nets.vc_seq, s.vc, vc_opt, s.vc_opt, data['obs_tb'],
                data['done_prev_tb'], data['cret'].reshape(T, B),
                int(self.hp['train_vc_iters']), w.reshape(T, B),
            )
            return s.replace(v=v, v_opt=v_opt_state, vc=vc,
                             vc_opt=vc_opt_state), \
                dict(LossV=loss_v, LossVC=loss_vc)
        v, v_opt_state, loss_v = fit_critic(
            nets.v_apply, s.v, v_opt, s.v_opt, data['obs'], data['ret'],
            int(self.hp['train_v_iters']), data['valid'],
        )
        vc, vc_opt_state, loss_vc = fit_critic(
            nets.vc_apply, s.vc, vc_opt, s.vc_opt, data['obs'], data['cret'],
            int(self.hp['train_vc_iters']), w,
        )
        return s.replace(v=v, v_opt=v_opt_state, vc=vc, vc_opt=vc_opt_state), \
            dict(LossV=loss_v, LossVC=loss_vc)

    def update(self, nets, s: AlgoState, data, aux, opts):
        theta0, unravel, f_loss, f_cost, f_kl = _flat_closures(nets, s.pi, data)
        pi_l_old = f_loss(theta0)
        surr_cost_old = f_cost(theta0)
        c = self.constraint(aux)
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
        cost_bound = jnp.maximum(-c, -self.hp['cost_reduction'])

        def accept(kl, pi_l, s_cost):
            ok = kl <= tk
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
        from guardx_tpu.algos.base import pi_diagnostics
        approx_kl, ent = pi_diagnostics(nets, s.pi, data)
        return s, dict(
            LossPi=pi_l_old, LossCost=surr_cost_old,
            DeltaLossPi=f_loss(theta_new) - pi_l_old,
            DeltaLossCost=f_cost(theta_new) - surr_cost_old,
            KL=approx_kl, Entropy=ent,
            OptimCase=optim_case.astype(jnp.float32),
            LineSearchStep=j.astype(jnp.float32),
            Accepted=accepted.astype(jnp.float32),
            **critic_metrics,
        )
