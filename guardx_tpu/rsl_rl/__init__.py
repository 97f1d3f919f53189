"""rsl_rl-compatible on-policy runner surface, TPU-native.

The reference ships stock Isaac Lab RSL-RL entry scripts
(reference: safe_rl_libX/rsl_rl/{train.py,play.py,cli_args.py} —
rsl_rl.runners.OnPolicyRunner over an Isaac Lab env). On a TPU host the
Isaac stack does not exist, so this package provides the same runner
surface backed by the guardx PPO trainer:

    runner = OnPolicyRunner(env, cfg_dict, log_dir)
    runner.learn(num_learning_iterations)
    policy = runner.get_inference_policy()
    runner.save(path) / runner.load(path)

`env` is anything with the GUARD batched surface (a native bench task, a
GUARD Engine, or an ExternalEnvWrapper around a real Isaac env when one is
available). The cfg dict accepts the rsl_rl keys that matter here
(policy.actor_hidden_dims, algorithm.gamma/lam/desired_kl,
num_steps_per_env, save_interval, experiment_name); unknown keys are
ignored, like rsl_rl tolerates extras.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

__all__ = ["OnPolicyRunner", "DEFAULT_CFG", "resolve_task"]

DEFAULT_CFG = {
    "num_steps_per_env": 24,
    "save_interval": 50,
    "experiment_name": "guardx_rsl",
    "policy": {"actor_hidden_dims": [64, 64]},
    "algorithm": {"gamma": 0.99, "lam": 0.95, "desired_kl": 0.01},
}

# Isaac Lab gym ids -> native guardx bench tasks (used when the Isaac
# stack is absent; substring match on the canonical robot/task token)
_NATIVE_MAP = {
    # order matters: more specific tokens first (dicts keep insertion order)
    "velocity-rough": "AnymalTerrain",
    "anymalterrain": "AnymalTerrain",
    "velocity-flat": "Anymal",
    "cartpole": "Cartpole",
    "humanoid": "Humanoid",
    "anymal": "Anymal",
    "quadcopter": "Quadcopter",
    "franka": "FrankaCabinet",
    "cabinet": "FrankaCabinet",
    "ball": "BallBalance",
    "ant": "Ant",
}


def resolve_task(task: str) -> str | None:
    """Map an Isaac Lab task id (e.g. Isaac-Velocity-Rough-Anymal-C-v0) to
    a native bench task name, or None if no native equivalent exists."""
    from guardx_tpu.envs.bench_tasks import NATIVE_BENCH_TASKS

    if task in NATIVE_BENCH_TASKS:
        return task
    t = task.lower()
    for token, native in _NATIVE_MAP.items():
        if token in t:
            return native
    return None


class OnPolicyRunner:
    """PPO on-policy runner with the rsl_rl surface (reference:
    rsl_rl/train.py:105 `runner.learn(...)`, play.py inference path)."""

    def __init__(self, env, train_cfg: dict | None = None,
                 log_dir: str | None = None, device: str | None = None):
        from guardx_tpu.algos.algorithms import REGISTRY
        from guardx_tpu.algos.runner import Trainer

        cfg = dict(DEFAULT_CFG)
        cfg.update(train_cfg or {})
        self.cfg = cfg
        self.env = env
        self.log_dir = log_dir
        alg = cfg.get("algorithm", {})
        pol = cfg.get("policy", {})
        hid = pol.get("actor_hidden_dims", [64, 64])
        # rsl_rl marks recurrence via policy.class_name=ActorCriticRecurrent
        # (+ rnn_type/rnn_hidden_size); map that onto the LSTM actor-critic
        recurrent = (pol.get("class_name") == "ActorCriticRecurrent"
                     or "rnn_type" in pol)
        algo = REGISTRY["ppo"](
            gamma=alg.get("gamma", 0.99), lam=alg.get("lam", 0.95),
            target_kl=alg.get("desired_kl", 0.01),
        )
        self.trainer = Trainer(
            env, algo, seed=int(cfg.get("seed", 0)), epochs=1,
            hidden_sizes=tuple(hid), recurrent=recurrent,
            lstm_size=int(pol.get("rnn_hidden_size", 64)),
        )
        self.it = 0

    def learn(self, num_learning_iterations: int,
              init_at_random_ep_len: bool = False):
        self.trainer.epochs = num_learning_iterations
        last = None
        for it in range(num_learning_iterations):
            last = self.trainer.run_epoch(self.it)
            self.it += 1
            if self.log_dir and self.it % self.cfg["save_interval"] == 0:
                self.save(os.path.join(self.log_dir, f"model_{self.it}.pkl"))
        return last

    # -- checkpointing (rsl_rl saves model_<it>.pt; here a params pickle) --

    def save(self, path: str):
        import jax

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        algo = jax.device_get(self.trainer.state.algo)
        with open(path, "wb") as f:
            pickle.dump({"it": self.it, "pi": algo.pi, "v": algo.v,
                         "vc": algo.vc}, f)

    def load(self, path: str):
        import jax.numpy as jnp
        import jax

        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.it = blob["it"]
        st = self.trainer.state
        algo = st.algo.replace(
            pi=jax.tree_util.tree_map(jnp.asarray, blob["pi"]),
            v=jax.tree_util.tree_map(jnp.asarray, blob["v"]),
            vc=jax.tree_util.tree_map(jnp.asarray, blob["vc"]),
        )
        self.trainer.state = st.replace(algo=algo)
        return blob

    def get_inference_policy(self, device=None):
        """Deterministic (mean-action) policy fn obs -> action. Recurrent
        policies thread their LSTM carry statefully inside the closure.

        The returned policy accepts an optional ``dones`` argument
        (``policy(obs, dones)``) and zeroes the carry rows where done
        before stepping, mirroring the rollout's mask_carry semantics —
        training always resets the carry at episode boundaries, so
        inference must too or it acts on stale cross-episode memory.
        A ``policy.reset()`` hook clears the whole carry."""
        import jax
        import jax.numpy as jnp

        nets = self.trainer.nets
        params = self.trainer.state.algo.pi

        if getattr(nets, 'recurrent', False):
            from guardx_tpu.algos import core as _core

            carry = {'h': None}

            @jax.jit
            def step(p, obs, h, done):
                h = _core.mask_carry(h, jnp.asarray(done, jnp.float32))
                (mu, _), h = nets.pi_apply(p, obs, h)
                return mu, h

            def policy(obs, dones=None):
                obs = jnp.asarray(obs)
                if carry['h'] is None:
                    carry['h'] = _core.zero_carry(
                        obs.shape[:-1], nets.lstm_size
                    )
                done = (jnp.zeros(obs.shape[:-1], jnp.float32)
                        if dones is None else jnp.asarray(dones))
                mu, carry['h'] = step(params, obs, carry['h'], done)
                return mu

            def reset():
                carry['h'] = None

            policy.reset = reset
            return policy

        @jax.jit
        def policy(obs):
            mu, _ = nets.pi_apply(params, jnp.asarray(obs))
            return mu

        return policy
