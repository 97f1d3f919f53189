"""ISSA / UAISSA: implicit safe-set algorithms with AdamBA action
correction.

Rebuild of the legacy layer's two unique algorithms (SURVEY.md §2.5):
- TRPO-ISSA  safe_rl_lib/issa/trpoissa.py:337-533,600-640 — at act time,
  AdamBA samples boundary points of the implicit safe set defined by the
  adaptive safety index phi = sigma + size^n - d^n - k*ddot and executes
  the minimum-norm safe action. The reference probes candidates by
  deep-copying the mujoco sim state, stepping, and rolling back — host
  serial. Here the environment is a pure function, so a probe is just
  ``physics step`` on the env state: every direction's outreach/bisection
  runs as a vmapped ``lax.while_loop`` on device.
- UAISSA     safe_rl_lib/uaissa/uaissa.py:193-242,434-533 — same AdamBA,
  but the probe queries an MC-dropout dynamics model predicting
  (d, ddot) from (obs, action); safety requires the mean + L_beta * std
  upper confidence bound of the future index to decrease. The dynamics
  model trains on rollout-collected (obs, act, d, ddot) pairs (MSE + L2,
  uaissa.py build_dynamics).

As shipped, the reference's ISSA scripts call legacy APIs the bundled MJX
engine does not have (env.sim.get_state / adaptive_safety_index) — they
cannot run there; this implementation is wired to the rebuilt engine.

The reference never defines the hazard aggregation of its (missing)
adaptive_safety_index; the standard ISSA formulation (max over hazards of
the per-hazard index) is used.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from guardx_tpu.algos.base import AlgoState, wmean, EPS
from guardx_tpu.algos.algorithms.tr_family import TRPO

ADAMBA_BOUND = 1e-4  # initial / terminal eta (trpoissa.py:414 'bound')
ADAMBA_MAX_ITERS = 64  # covers full outreach (x2) + bisection (x0.5) span


def safety_index(robot_xy, vel_xy, hazards_pos, size, k, sigma, n):
    """phi = sigma + size^n - d^n - k * ddot, max over hazards
    (uaissa.py:436-444 get_safety_index; d/ddot as in uaissa.py:711-721:
    ddot = -(dir . vel) / d)."""
    rel = hazards_pos - robot_xy[None, :]  # (H, 2)
    d = jnp.linalg.norm(rel, axis=-1) + EPS
    ddot = -jnp.sum(rel * vel_xy[None, :], axis=-1) / d
    phi = sigma + size ** n - d ** n - k * ddot
    return jnp.max(phi)


def adamba_directions(rng, act_dim: int, vec_num: int):
    """Probe directions: evenly spaced half-unit circle points for 2-D
    action spaces, N(0, 0.1) otherwise (trpoissa.py:400-419)."""
    if act_dim == 2:
        theta = jnp.arange(vec_num) * (2 * jnp.pi / vec_num)
        return jnp.stack([jnp.sin(theta), jnp.cos(theta)], axis=-1) / 2
    return 0.1 * jax.random.normal(rng, (vec_num, act_dim))


def adamba_one_direction(a0, direction, chk_safe, lo, hi):
    """Outreach-then-bisect along one direction (trpoissa.py:449-496).

    chk_safe(a) -> bool. Returns (candidate, valid)."""

    def in_bounds(a):
        return jnp.logical_and(jnp.all(a >= lo), jnp.all(a <= hi))

    def cond(c):
        return jnp.logical_not(c['done'])

    def body(c):
        a, eta, dec = c['a'], c['eta'], c['dec']
        safe = chk_safe(a)
        oob = jnp.logical_not(in_bounds(a))
        # termination: bisection converged -> take opt; out of bounds ->
        # keep the (invalid) current point, matching the reference's break
        converged = jnp.logical_and(eta <= ADAMBA_BOUND, dec == 1)
        done = jnp.logical_or(jnp.logical_or(oob, converged),
                              c['it'] >= ADAMBA_MAX_ITERS)

        # the four AdamBA transitions
        outreach = jnp.logical_and(jnp.logical_not(safe), dec == 0)
        first_hit = jnp.logical_and(safe, dec == 0)
        bisect_out = jnp.logical_and(jnp.logical_not(safe), dec == 1)
        bisect_in = jnp.logical_and(safe, dec == 1)

        a_new = jnp.where(outreach | bisect_out, a + eta * direction,
                          jnp.where(bisect_in, a - eta * direction, a))
        eta_new = jnp.where(outreach, eta * 2,
                            jnp.where(first_hit, eta * 0.25,
                                      jnp.where(dec == 1, eta * 0.5, eta)))
        dec_new = jnp.where(first_hit, 1, dec)
        opt_new = jnp.where(first_hit | bisect_in, a, c['opt'])
        has_opt = jnp.logical_or(c['has_opt'], first_hit)

        return dict(
            a=jnp.where(done, a, a_new),
            eta=jnp.where(done, eta, eta_new),
            dec=jnp.where(done, dec, dec_new),
            opt=jnp.where(done, c['opt'], opt_new),
            has_opt=jnp.where(done, c['has_opt'], has_opt),
            done=done,
            valid=jnp.logical_and(converged, c['has_opt'] | safe),
            it=c['it'] + 1,
        )

    init = dict(a=a0, eta=jnp.float32(ADAMBA_BOUND), dec=jnp.int32(0),
                opt=a0, has_opt=jnp.bool_(False), done=jnp.bool_(False),
                valid=jnp.bool_(False), it=jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    cand = out['opt']
    valid = jnp.logical_and(out['valid'],
                            jnp.logical_and(jnp.all(cand >= lo),
                                            jnp.all(cand <= hi)))
    return cand, valid


def adamba_sc(a_raw, chk_safe, lo, hi, rng, vec_num: int):
    """Full AdamBA safety correction (trpoissa.py:381-533): probe vec_num
    directions, keep valid boundary actions, execute the minimum-norm one;
    fall back to the raw action when none found (trpoissa.py:618-620)."""
    act_dim = a_raw.shape[-1]
    dirs = adamba_directions(rng, act_dim, vec_num)
    cands, valids = jax.vmap(
        lambda d: adamba_one_direction(a_raw, d, chk_safe, lo, hi)
    )(dirs)
    norms = jnp.where(valids, jnp.linalg.norm(cands, axis=-1), jnp.inf)
    best = jnp.argmin(norms)
    any_valid = jnp.any(valids)
    a_safe = jnp.where(any_valid, cands[best], a_raw)
    return a_safe, any_valid


class ISSA(TRPO):
    """TRPO + AdamBA safety correction probed through the real physics
    (trpoissa.py main loop: a_safe = AdamBA_SC(o, a, env, vec_num=5, ...),
    fallback a)."""

    name = "issa"

    def __init__(self, **hp):
        hp.setdefault('adaptive_k', 3.0)      # trpoissa.py:381 defaults
        hp.setdefault('adaptive_n', 1.0)
        hp.setdefault('adaptive_sigma', 0.04)
        hp.setdefault('vec_num', 5)           # trpoissa.py:618
        super().__init__(**hp)
        self.needs_cost_critic = False

    def _phi(self, env, state, xy, xy_prev):
        vel = (xy - xy_prev) / env.dt
        return safety_index(
            xy, vel, state.hazards_pos, env.hazards_size,
            self.hp['adaptive_k'], self.hp['adaptive_sigma'],
            self.hp['adaptive_n'],
        )

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        if env is None or not getattr(env, 'hazards_num', 0):
            return a, {}
        from guardx_tpu import physics

        lo = jnp.asarray(np.where(np.isfinite(env.action_space.low),
                                  env.action_space.low, -10.0), jnp.float32)
        hi = jnp.asarray(np.where(np.isfinite(env.action_space.high),
                                  env.action_space.high, 10.0), jnp.float32)

        def correct_one(state, a_i, key):
            xy_now = state.data.xpos[env.body_robot][:2]
            xy_prev = state.robot_pos_last[:2]
            phi_now = self._phi(env, state, xy_now, xy_prev)

            def chk_safe(a_c):
                ctrl = env.convert_action(state.data, a_c)
                d = state.data.replace(ctrl=ctrl)

                def f(dd, _):
                    return physics.step(env.model, dd), None

                d, _ = jax.lax.scan(
                    f, d, (), env.physics_steps_per_control_step
                )
                xy_f = d.xpos[env.body_robot][:2]
                phi_f = self._phi(env, state, xy_f, xy_now)
                return phi_f < jnp.maximum(0.0, phi_now)

            a_safe, _ = adamba_sc(a_i, chk_safe, lo, hi, key,
                                  int(self.hp['vec_num']))
            return a_safe

        B = a.shape[0]
        keys = jax.random.split(rng, B)
        a_safe = jax.vmap(correct_one)(env_state, a, keys)
        n_corr = jnp.sum(jnp.any(jnp.abs(a_safe - a) > 1e-9, axis=-1))
        return a_safe, {'issa_corrected': jnp.broadcast_to(
            n_corr.astype(jnp.float32) / B, (B,))}


class DropoutDynamics(nn.Module):
    """(obs, act) -> (d_min, ddot) with dropout for MC uncertainty
    (uaissa_core DynamicsModel: hidden [64,128,256,512], dropout 0.1)."""

    hidden: tuple = (64, 128, 256, 512)
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
            x = nn.Dropout(rate=self.dropout_prob,
                           deterministic=not train)(x)
        return nn.Dense(2)(x)


class UAISSA(TRPO):
    """Uncertainty-aware ISSA (uaissa.py): AdamBA checks the L_beta upper
    confidence bound of the dropout-dynamics-predicted future safety
    index instead of probing the simulator."""

    name = "uaissa"

    def __init__(self, **hp):
        hp.setdefault('adaptive_k', 3.0)
        hp.setdefault('adaptive_n', 1.0)
        hp.setdefault('adaptive_sigma', 0.04)
        hp.setdefault('vec_num', 5)
        hp.setdefault('l_beta', 2.0)          # UCB multiplier L_beta
        hp.setdefault('mc_samples', 5)        # uaissa.py:456 'for _ in range(5)'
        hp.setdefault('dyn_lr', 1e-4)         # build_dynamics lr
        hp.setdefault('dyn_iters', 50)        # per-epoch Adam steps
        hp.setdefault('dyn_lam', 1e-2)        # L2 'model_lam'
        hp.setdefault('warmup_ratio', 0.1)    # correction off until trained
        super().__init__(**hp)
        self.needs_cost_critic = False
        self._dyn = DropoutDynamics()
        self._dyn_opt = optax.adam(self.hp['dyn_lr'])

    def init_extra(self, rng, nets):
        dummy = jnp.zeros((1, nets.obs_dim + nets.act_dim), jnp.float32)
        params = self._dyn.init({'params': rng}, dummy, train=False)
        return {'dyn': params, 'dyn_opt': self._dyn_opt.init(params)}

    # ---- rollout: collect (d, ddot) targets + correct actions ----------

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        if env is None or not getattr(env, 'hazards_num', 0):
            return a, {}
        # ground-truth targets at the CURRENT state (uaissa get_d_and_ddot)
        xy = env_state.data.xpos[:, env.body_robot, :2]
        xy_prev = env_state.robot_pos_last[:, :2]
        vel = (xy - xy_prev) / env.dt
        rel = env_state.hazards_pos - xy[:, None, :]
        dists = jnp.linalg.norm(rel, axis=-1) + EPS
        near = jnp.argmin(dists, axis=-1)
        take = lambda x: jnp.take_along_axis(x, near[:, None], 1)[:, 0]
        d_min = take(dists)
        ddot = take(-jnp.sum(rel * vel[:, None, :], axis=-1) / dists)

        lo = jnp.asarray(np.where(np.isfinite(env.action_space.low),
                                  env.action_space.low, -10.0), jnp.float32)
        hi = jnp.asarray(np.where(np.isfinite(env.action_space.high),
                                  env.action_space.high, 10.0), jnp.float32)
        k_n, sig, n_ = (self.hp['adaptive_k'], self.hp['adaptive_sigma'],
                        self.hp['adaptive_n'])
        size = env.hazards_size

        def phi_of(d, dd):
            return sig + size ** n_ - d ** n_ - k_n * dd

        def correct_one(o_i, a_i, phi_now, key):
            def chk_safe(a_c):
                x = jnp.concatenate([o_i, a_c])[None, :]
                ks = jax.random.split(key, int(self.hp['mc_samples']))

                def one(kk):
                    out = self._dyn.apply(s.extra['dyn'], x, train=True,
                                          rngs={'dropout': kk})[0]
                    return phi_of(out[0], out[1])

                phis = jax.vmap(one)(ks)
                ucb = jnp.mean(phis) + self.hp['l_beta'] * jnp.std(phis)
                return ucb < jnp.maximum(0.0, phi_now)

            a_safe, _ = adamba_sc(a_i, chk_safe, lo, hi, key,
                                  int(self.hp['vec_num']))
            return a_safe

        phi_now = phi_of(d_min, ddot)
        keys = jax.random.split(rng, a.shape[0])
        corrected = jax.vmap(correct_one)(obs, a, phi_now, keys)
        use = epoch_frac > self.hp['warmup_ratio']
        a_safe = jnp.where(use, corrected, a)
        return a_safe, {'dyn_d': d_min, 'dyn_ddot': ddot}

    # ---- update: TRPO + dynamics-model fitting -------------------------

    def update(self, nets, s: AlgoState, data, aux, opts):
        s, metrics = super().update(nets, s, data, aux, opts)
        x = jnp.concatenate([data['obs'], data['act']], axis=-1)
        y = jnp.stack([data['dyn_d'], data['dyn_ddot']], axis=-1)
        w = data['valid']
        lam = self.hp['dyn_lam']

        def loss_fn(p):
            pred = self._dyn.apply(p, x, train=False)
            mse = wmean(jnp.sum((pred - y) ** 2, axis=-1), w)
            l2 = sum(jnp.sum(q ** 2) for q in jax.tree_util.tree_leaves(p))
            return mse + lam * l2

        def body(_, carry):
            p, os_ = carry
            grads = jax.grad(loss_fn)(p)
            updates, os_ = self._dyn_opt.update(grads, os_, p)
            return (optax.apply_updates(p, updates), os_)

        dyn, dyn_opt = jax.lax.fori_loop(
            0, int(self.hp['dyn_iters']), body,
            (s.extra['dyn'], s.extra['dyn_opt']),
        )
        s = s.replace(extra={**s.extra, 'dyn': dyn, 'dyn_opt': dyn_opt})
        metrics['LossDyn'] = loss_fn(dyn)
        return s, metrics
