"""Adversarial Motion Priors (AMP) + latent-steering HRL.

TPU-native counterpart of the reference's rl_games-based learning suite
(reference: IsaacGymEnvs/isaacgymenvs/learning/amp_continuous.py — PPO +
a transition discriminator trained demo-vs-policy with gradient penalty,
style reward blended into the task reward; hrl_continuous.py — a
high-level policy emitting latents consumed by a pretrained conditional
low-level controller).

AMP here is PPO plus:
  - a discriminator D(s, s') over consecutive observation pairs, trained
    least-squares (demo -> +1, policy -> -1) with a gradient penalty on
    demo samples (amp_continuous.py _disc_loss structure)
  - style reward r_s = max(0, 1 - 0.25 (D - 1)^2)  (the AMP paper /
    amp_continuous.py disc_reward), blended
    r = task_reward_w * r_task + disc_reward_w * r_s
    BEFORE GAE via the runner's shape_rewards hook
  - demo transitions supplied as an (N, 2, obs_dim) array (`demos=`);
    `record_demo_transitions` builds one from any policy/env pair (the
    reference loads mocap .npy clips — data this rebuild does not vendor)

HRL: the high-level policy's "action" is a latent z in R^latent_dim; the
env action comes from a frozen conditional low-level controller
a = llc_apply(llc_params, obs, z) through the correct_action rollout hook.
PPO trains the high-level policy on the env task reward. (The reference's
LLC is an AMP-pretrained conditional policy; any (obs, z) -> action
callable works here.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from guardx_tpu.algos import core
from guardx_tpu.algos.base import wmean
from guardx_tpu.algos.algorithms.pg_family import PPO


def record_demo_transitions(env, policy_fn, steps: int, seed: int = 0):
    """Roll `policy_fn(obs) -> action` in the (stateful batched) env and
    record consecutive observation pairs: (steps*B, 2, obs_dim) numpy.

    Stands in for the reference's mocap demo datasets
    (amp_continuous.py fetch_amp_obs_demo)."""
    obs = np.asarray(env.reset())
    pairs = []
    for _ in range(steps):
        act = policy_fn(obs)
        nxt, rew, done, info = env.step(jnp.asarray(act))
        nxt = np.asarray(nxt)
        keep = np.asarray(done) < 0.5
        if keep.any():
            pairs.append(np.stack([obs[keep], nxt[keep]], axis=1))
        env.reset_done()
        obs = np.asarray(env._obs)
    return np.concatenate(pairs, axis=0)


class AMP(PPO):
    """PPO + adversarial style reward (amp_continuous.py)."""

    name = "amp"
    # under Trainer obs_norm the policy sees normalized observations, but
    # the discriminator features must live in the same space as the RAW
    # demo transitions — the runner stores batch['obs_raw'] for us
    wants_raw_obs = True

    def __init__(self, demos=None, feature_idx=None, **hp):
        hp.setdefault('disc_lr', 1e-3)
        hp.setdefault('disc_iters', 8)
        hp.setdefault('disc_batch', 4096)
        hp.setdefault('disc_grad_penalty', 5.0)
        hp.setdefault('disc_logit_reg', 0.01)
        hp.setdefault('task_reward_w', 0.5)
        hp.setdefault('disc_reward_w', 0.5)
        hp.setdefault('disc_hidden', (256, 128))
        # discriminator REPLAY buffer (amp_continuous.py:185-191,240,
        # 513-521): the policy side of the disc batch is half current
        # policy, half a replay of PAST policies, so D cannot saturate
        # against the current policy alone. Reference: 1M-row ring with
        # bernoulli keep_prob=0.01 trickle once full; here a fixed-size
        # device ring (raw pairs, normalized at sample time, like the
        # reference which stores raw amp_obs and _preproc_amp_obs's the
        # sample) with static store count K per update — ring while
        # filling, random-replacement once full (the jittable equivalent
        # of the keep_prob trickle: both leave an exponentially-decaying
        # window over past policies).
        hp.setdefault('amp_replay', 1)
        hp.setdefault('amp_replay_size', 262144)
        hp.setdefault('amp_replay_store', 8192)
        # CLI surface: --algo_hp disc_hidden=1024x512 (comma already
        # separates entries)
        if isinstance(hp['disc_hidden'], str):
            hp['disc_hidden'] = tuple(
                int(x) for x in hp['disc_hidden'].split('x')
            )
        super().__init__(**hp)
        if demos is None:
            raise ValueError(
                "AMP requires demo transitions: pass demos=(N, 2, obs_dim) "
                "(see record_demo_transitions)"
            )
        self.demos = jnp.asarray(demos, jnp.float32)
        # discriminate in a feature subspace of the observation (AMP joint
        # features, utils/motion.py) when given; None = whole-obs pairs
        self.feature_idx = (None if feature_idx is None
                            else jnp.asarray(feature_idx, jnp.int32))
        if self.feature_idx is not None and \
                self.demos.shape[-1] != self.feature_idx.shape[0]:
            raise ValueError(
                f"demo feature dim {self.demos.shape[-1]} != "
                f"feature_idx dim {self.feature_idx.shape[0]}"
            )
        self.disc = core.MLP(
            sizes=tuple(self.hp['disc_hidden']) + (1,), activation='relu'
        )
        self._disc_opt = optax.adam(self.hp['disc_lr'])

    def _features(self, obs):
        if self.feature_idx is None:
            return obs
        return obs[..., self.feature_idx]

    # -- discriminator plumbing -------------------------------------------

    def _disc_apply(self, params, pairs):
        """pairs (..., 2, obs_dim) -> logits (...)"""
        x = pairs.reshape(pairs.shape[:-2] + (-1,))
        return self.disc.apply(params, x)[..., 0]

    def _logit_kernel(self, params):
        """The final (logit) Dense layer's kernel — the only weights the
        reference's disc_logit_reg decays."""
        last = f"Dense_{len(self.hp['disc_hidden'])}"
        return params['params'][last]['kernel']

    def init_extra(self, rng, nets):
        k1, k2, k3 = jax.random.split(rng, 3)
        feat_dim = (nets.obs_dim if self.feature_idx is None
                    else int(self.feature_idx.shape[0]))
        dummy = jnp.zeros((1, 2 * feat_dim), jnp.float32)
        disc = self.disc.init(k1, dummy)
        extra = {**super().init_extra(k3, nets),
                 'disc': disc, 'disc_opt': self._disc_opt.init(disc),
                 'disc_rng': k2,
                # running AMP-feature statistics shared by demo and policy
                # discriminator inputs (rl_games normalize_amp_input —
                # HumanoidAMPPPO.yaml; the 105-dim features span two orders
                # of magnitude, and the gradient penalty otherwise acts in
                # raw units)
                 'amp_rms': {'mu': jnp.zeros(feat_dim, jnp.float32),
                             'var': jnp.ones(feat_dim, jnp.float32),
                             'count': jnp.float32(1e-4)}}
        if int(self.hp['amp_replay']):
            R = int(self.hp['amp_replay_size'])
            extra['amp_replay_buf'] = jnp.zeros((R, 2, feat_dim),
                                                jnp.float32)
            extra['amp_replay_count'] = jnp.int32(0)
            extra['amp_replay_head'] = jnp.int32(0)
        return extra

    def _norm_amp(self, rms, pairs):
        """Normalize (..., 2, F) AMP pairs with the running stats."""
        if not self.hp.get('amp_input_norm', True):
            return pairs
        return jnp.clip(
            (pairs - rms['mu']) / jnp.sqrt(rms['var'] + 1e-8), -10.0, 10.0
        )

    def style_reward(self, disc_params, pairs):
        """LSGAN AMP reward: max(0, 1 - 0.25 (D - 1)^2)."""
        d = self._disc_apply(disc_params, pairs)
        return jnp.maximum(0.0, 1.0 - 0.25 * (d - 1.0) ** 2)

    # -- runner hook: blend style reward before GAE ------------------------

    def shape_rewards(self, nets, s, batch):
        obs = self._features(batch.get('obs_raw', batch['obs']))  # (T, B, F)
        nxt = jnp.concatenate([obs[1:], obs[-1:]], axis=0)
        pairs = jnp.stack([obs, nxt], axis=2)  # (T, B, 2, F)
        r_style = self.style_reward(
            s.extra['disc'], self._norm_amp(s.extra['amp_rms'], pairs)
        )
        # a transition across a reset is not a policy transition: fall back
        # to the task reward alone there (done masks the pair)
        done = batch['done']
        w_t, w_s = self.hp['task_reward_w'], self.hp['disc_reward_w']
        blended = w_t * batch['rew'] + w_s * r_style
        # validity of each pair as a genuine policy transition: a done step
        # crosses a reset, and the final timestep's pair is a degenerate
        # self-pair (obs[-1], obs[-1]) — both are masked out of
        # discriminator training AND of the reward blend (mirrors
        # amp_continuous.py, which only collects within-episode transitions)
        pair_valid = (1.0 - done).at[-1, :].set(0.0)
        rew = jnp.where(pair_valid > 0.0, blended, batch['rew'])
        return dict(batch, rew=rew, amp_pairs=pairs, amp_pair_valid=pair_valid)

    # -- update: PPO + discriminator --------------------------------------

    def update(self, nets, s, data, aux, opts):
        s, metrics = super().update(nets, s, data, aux, opts)

        bs = int(self.hp['disc_batch'])
        pairs = data['amp_pairs']  # (T*B, 2, O) after flattening
        pair_valid = data['amp_pair_valid']  # (T*B,) 1 = genuine transition
        rng = s.extra['disc_rng']
        rng, k_pol, k_demo, k_rep, k_store, k_slot = jax.random.split(rng, 6)
        # merge this batch's raw frame statistics into the running AMP
        # input normalizer (Welford), then normalize both sides with the
        # PRE-update stats (rl_games RunningMeanStd train-mode semantics)
        rms = s.extra['amp_rms']
        frames = pairs.reshape(-1, pairs.shape[-1])
        nb = jnp.float32(frames.shape[0])
        fm = jnp.mean(frames, axis=0)
        fv = jnp.var(frames, axis=0)
        tot = rms['count'] + nb
        delta = fm - rms['mu']
        amp_rms_new = {
            'mu': rms['mu'] + delta * nb / tot,
            'var': (rms['var'] * rms['count'] + fv * nb
                    + delta ** 2 * rms['count'] * nb / tot) / tot,
            'count': tot,
        }

        idx_p = jax.random.randint(k_pol, (bs,), 0, pairs.shape[0])
        idx_d = jax.random.randint(k_demo, (bs,), 0, self.demos.shape[0])
        pol = self._norm_amp(rms, pairs[idx_p])
        # cross-reset / final-self pairs are not policy transitions: weight
        # them out of the least-squares loss (same masking the reward blend
        # already applies)
        w_pol = pair_valid[idx_p]
        demo = self._norm_amp(rms, self.demos[idx_d])
        gp_w = self.hp['disc_grad_penalty']
        logit_reg = self.hp['disc_logit_reg']

        # -- discriminator replay: sample PAST-policy pairs, then store a
        # slice of this batch. Sample-before-store mirrors the reference's
        # prepare_dataset (replay drawn at line 191) running before
        # _store_replay_amp_obs (line 240), so the replay half never
        # contains the current policy; the very first update falls back to
        # the current batch (amp_continuous.py:188-189).
        use_replay = bool(int(self.hp['amp_replay']))
        replay_state = {}
        if use_replay:
            buf = s.extra['amp_replay_buf']
            cnt = s.extra['amp_replay_count']
            head = s.extra['amp_replay_head']
            R = buf.shape[0]
            idx_r = jax.random.randint(k_rep, (bs,), 0, jnp.maximum(cnt, 1))
            rep_raw = jnp.where(cnt > 0, buf[idx_r], pairs[idx_p])
            rep = self._norm_amp(rms, rep_raw)
            K = int(self.hp['amp_replay_store'])
            idx_in = jax.random.randint(k_store, (K,), 0, pairs.shape[0])
            ring_slots = (head + jnp.arange(K, dtype=jnp.int32)) % R
            rand_slots = jax.random.randint(k_slot, (K,), 0, R)
            slots = jnp.where(cnt < R, ring_slots, rand_slots)
            ok = pair_valid[idx_in] > 0.0  # cross-reset pairs stay out
            buf = buf.at[slots].set(
                jnp.where(ok[:, None, None], pairs[idx_in], buf[slots])
            )
            replay_state = {
                'amp_replay_buf': buf,
                'amp_replay_count': jnp.minimum(cnt + K, R).astype(jnp.int32),
                'amp_replay_head': ((head + K) % R).astype(jnp.int32),
            }

        def disc_loss(p):
            d_demo = self._disc_apply(p, demo)
            d_pol = self._disc_apply(p, pol)
            # least-squares GAN targets (amp_continuous.py: demo 1, pol -1);
            # with replay the agent side averages the current-policy and
            # replay halves equally (disc_agent_cat_logit, line 313)
            agent_sq = wmean((d_pol + 1.0) ** 2, w_pol)
            if use_replay:
                d_rep = self._disc_apply(p, rep)
                agent_sq = 0.5 * (agent_sq + jnp.mean((d_rep + 1.0) ** 2))
            loss = 0.5 * (jnp.mean((d_demo - 1.0) ** 2) + agent_sq)
            # gradient penalty on demo samples
            g = jax.vmap(jax.grad(
                lambda x: self._disc_apply(p, x[None])[0]
            ))(demo)
            gp = jnp.mean(jnp.sum(g.reshape(bs, -1) ** 2, axis=-1))
            # logit weight decay on the FINAL layer's kernel only
            # (amp_continuous.py regularizes just the logit weights)
            reg = jnp.sum(self._logit_kernel(p) ** 2)
            return loss + gp_w * gp + logit_reg * reg, (loss, gp)

        def body(_, carry):
            p, os_ = carry
            grads, _ = jax.grad(disc_loss, has_aux=True)(p)
            updates, os_ = self._disc_opt.update(grads, os_, p)
            return (optax.apply_updates(p, updates), os_)

        disc, disc_opt = jax.lax.fori_loop(
            0, int(self.hp['disc_iters']), body,
            (s.extra['disc'], s.extra['disc_opt']),
        )
        _, (d_loss, gp) = disc_loss(disc)
        s = s.replace(extra={**s.extra, 'disc': disc, 'disc_opt': disc_opt,
                             'disc_rng': rng, 'amp_rms': amp_rms_new,
                             **replay_state})
        # separation evidence (amp_continuous.py disc_agent_acc/
        # disc_demo_acc): mean logit per side + classification accuracy at
        # the LSGAN decision boundary D = 0
        d_demo = self._disc_apply(disc, demo)
        d_pol = self._disc_apply(disc, pol)
        metrics = dict(metrics, LossDisc=d_loss, DiscGradPenalty=gp,
                       DiscDemoLogit=jnp.mean(d_demo),
                       DiscPolicyLogit=wmean(d_pol, w_pol),
                       DiscDemoAcc=jnp.mean(d_demo > 0.0),
                       DiscPolicyAcc=wmean(
                           (d_pol < 0.0).astype(jnp.float32), w_pol
                       ),
                       StyleReward=jnp.mean(
                           self.style_reward(disc, pol)
                       ))
        if use_replay:
            metrics['DiscReplayLogit'] = jnp.mean(self._disc_apply(disc, rep))
        return s, metrics


class HRL(PPO):
    """High-level policy over a frozen conditional low-level controller
    (hrl_continuous.py structure): policy action = latent z, env action =
    llc_apply(llc_params, obs, z)."""

    name = "hrl"

    def __init__(self, llc_apply=None, llc_params=None, latent_dim: int = 8,
                 **hp):
        super().__init__(**hp)
        if llc_apply is None:
            raise ValueError(
                "HRL requires a low-level controller: "
                "llc_apply(llc_params, obs, z) -> action"
            )
        self.llc_apply = llc_apply
        self.llc_params = llc_params
        self.act_dim_override = latent_dim

    def correct_action(self, nets, s, obs, a, carry, epoch_frac, rng,
                       env=None, env_state=None):
        env_a = self.llc_apply(self.llc_params, obs, a)
        return env_a, {}
