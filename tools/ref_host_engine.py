"""Batched, host-physics build of the ACTUAL reference engine.

The reference Engine (/root/reference/safe_rl_envs/safe_rl_envs/envs/
engine.py) is mjx-jitted end to end; this image has no mjx. For the
algorithm side-by-side (VERDICT.md round-3 "Weak #2") we need the
reference *trainers* to run against the reference *environment semantics*,
so this module rebuilds the Engine's public torch API (reset / step /
reset_done, engine.py:454-505) by:

- importing the reference engine UNMODIFIED via tools/ref_shims.py and
  executing its own layout sampler, layout2qpos, obs(), reward_done() and
  cost() JAX code (vmapped+jitted on CPU), and
- driving host MuJoCo (mujoco.mj_step) for the physics in place of
  mjx.step — the same substitution the recorded goldens use
  (tools/record_reference_golden.py), validated in
  tests/test_golden_parity.py.

Host-loop bookkeeping mirrors engine.py exactly:
- update_data() history rotation + per-step key split (engine.py:426-431)
- point-robot action rotation on the PRE-step xmat (engine.py:672-687)
- NaN/Inf => reward 0 / done 1 guards (engine.py:696-699)
- post-step time limit `done |= steps > num_steps`, counter reset
  (engine.py:492-493)
- reset_done(): where(done) merge of qpos/qvel/ctrl, one physics step on a
  SCRATCH copy only to compute the reset observation, persistent state
  keeps the merged pre-step fields — including the reference's stale
  xpos/xmat for just-reset envs (engine.py:702-731 returns `obs, data`
  with `data` the merged, un-stepped pytree)
- reset(): full pool resample + randint pick with the SAME key
  (engine.py:433-452); pool size is configurable (the reference's 1e6 is
  a CPU-hostile constant; n_pool_keys=65536 keeps the `layout_size >
  env_num` invariant at reference success rates ~45%+).

No reference code is copied — it is imported from /root/reference
(read-only) and executed.
"""

from __future__ import annotations

import os
import sys
import tempfile
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_shims import load_reference_engine, GOAL_POINT_8HAZARDS  # noqa: E402


def _ns(d):
    return None if d is None else SimpleNamespace(**d)


class HostRefEngine:
    """Reference Engine semantics, batched, host-MuJoCo physics, torch API."""

    def __init__(self, env_num=200, num_steps=200, seed=0,
                 robot="point", n_pool_keys=65536):
        import jax
        import mujoco

        jax.config.update("jax_platforms", "cpu")
        eng_mod = load_reference_engine()

        config = dict(GOAL_POINT_8HAZARDS)
        config["robot_base"] = f"xmls/{robot}.xml"
        config.update({"env_num": env_num, "num_steps": num_steps,
                       "_seed": seed})

        old_cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as td:
            os.chdir(td)  # reference World dumps result.xml into CWD
            try:
                self.engine = eng_mod.Engine(config)
            finally:
                os.chdir(old_cwd)

        eng = self.engine
        self.env_num = env_num
        self.num_steps = num_steps
        self.robot = robot
        self.mj_model = eng.mj_model
        self.nq, self.nv, self.nu = (self.mj_model.nq, self.mj_model.nv,
                                     self.mj_model.nu)
        self.nbody = self.mj_model.nbody
        self.robot_id = eng.body_name2xpos_id["robot"]
        self.psps = eng.physics_steps_per_control_step
        self.observation_space = eng.observation_space
        self.action_space = eng.action_space
        self.key = jax.random.PRNGKey(seed)
        self._n_pool_keys = n_pool_keys

        # one persistent MjData per env (physics state of record)
        self._mj = [mujoco.MjData(self.mj_model) for _ in range(env_num)]
        self._scratch = mujoco.MjData(self.mj_model)

        # ---- jitted batched wrappers over the reference's own jax code ----
        def outs1(data, last, last2, ld, lld):
            d, l1, l2 = _ns(data), _ns(last), _ns(last2)
            obs, _ = eng.obs(d, l1, l2, ld, lld)
            reward, done = eng.reward_done(d, l1, ld)
            cost = eng.cost(d)
            import jax.numpy as jp

            bad = (jp.isnan(obs).any() | jp.isinf(obs).any())
            reward = jp.where(bad, 0.0, reward)
            done = jp.where(bad, 1.0, done)
            return obs, reward, done, cost

        def obs_reset1(data):
            obs, _ = eng.obs(_ns(data), None, None, None, None)
            return obs

        self._outs_b = jax.jit(jax.vmap(outs1))
        self._obs_reset_b = jax.jit(jax.vmap(obs_reset1))
        self._layout2qpos_b = jax.jit(jax.vmap(eng.layout2qpos))
        self._sample_layout_b = jax.jit(
            lambda key: jax.vmap(eng.sample_layout)(
                jax.random.split(key, n_pool_keys)))

        self._data = None
        self._last_data = None
        self._last_last_data = None
        self._done = None
        self._last_done = None
        self._last_last_done = None
        self._obs = None
        self._steps = None
        self.layout = None
        self.layout_size = 0

    # ------------------------------------------------------------------
    def _snapshot(self, i):
        """Freeze env i's MjData into the duck-typed dict the reference
        obs/reward/cost code indexes (record_reference_golden.snapshot)."""
        d = self._mj[i]
        return dict(
            qpos=np.array(d.qpos), qvel=np.array(d.qvel),
            qacc=np.array(d.qacc), ctrl=np.array(d.ctrl),
            xpos=np.array(d.xpos),
            xmat=np.array(d.xmat).reshape(-1, 3, 3),
        )

    def _stack(self, snaps):
        import jax.numpy as jp

        return {k: jp.asarray(np.stack([s[k] for s in snaps]))
                for k in snaps[0]}

    # ------------------------------------------------------------------
    # reference host API (engine.py:426-505)
    # ------------------------------------------------------------------
    def reset_layout(self):
        layout, success = self._sample_layout_b(self.key)
        idx = np.where(np.asarray(success) > 0.0)[0]
        self.layout = {k: np.asarray(v)[idx] for k, v in layout.items()}
        self.layout_size = len(idx)
        assert self.layout_size > self.env_num
        return self.layout

    def get_layout(self):
        import jax

        idx = np.asarray(jax.random.randint(
            self.key, (self.env_num,), minval=0, maxval=self.layout_size))
        return {k: v[idx] for k, v in self.layout.items()}

    def reset(self):
        import mujoco

        self.reset_layout()
        layout = self.get_layout()
        qpos0 = np.asarray(self._layout2qpos_b(
            {k: np.asarray(v) for k, v in layout.items()}))
        snaps = []
        for i in range(self.env_num):
            d = self._mj[i]
            d.qpos[:] = qpos0[i]
            d.qvel[:] = 0.0
            d.ctrl[:] = 0.0
            mujoco.mj_forward(self.mj_model, d)
            snaps.append(self._snapshot(i))
        self._data = self._stack(snaps)
        obs = self._obs_reset_b(self._data)
        self._steps = np.zeros(self.env_num)
        self._obs = obs
        self._last_data = None
        self._last_last_data = None
        self._done = None
        self._last_done = None
        self._last_last_done = None
        return self._to_torch(obs)

    def update_data(self):
        import jax

        self._last_last_data = self._last_data
        self._last_data = self._data
        self._last_last_done = self._last_done
        self._last_done = self._done
        self.key, _ = jax.random.split(self.key, 2)

    def step(self, action):
        import jax.numpy as jp
        import mujoco

        act = np.asarray(self._from_torch(action), dtype=np.float64)
        self.update_data()

        # convert_action (engine.py:672-687): point rotates body-frame x
        # thrust into the world on the PRE-step xmat
        if "point" in self.robot:
            xmat = np.asarray(self._data["xmat"])[:, self.robot_id]
            world = np.einsum("bij,bj->bi", xmat,
                              np.stack([act[:, 0],
                                        np.zeros(self.env_num),
                                        np.zeros(self.env_num)], axis=1))
            ctrl = np.stack([world[:, 0], world[:, 1], act[:, 1]], axis=1)
        else:
            ctrl = act

        snaps = []
        for i in range(self.env_num):
            d = self._mj[i]
            d.ctrl[:] = ctrl[i]
            for _ in range(self.psps):
                mujoco.mj_step(self.mj_model, d)
            snaps.append(self._snapshot(i))
        self._data = self._stack(snaps)

        obs, reward, done, cost = self._outs_b(
            self._data, self._last_data, self._last_last_data,
            self._last_done, self._last_last_done)

        self._obs = obs
        # post-step time limit + counter (engine.py:492-493)
        done = jp.where(jp.asarray(self._steps) > self.num_steps, 1.0, done)
        self._done = done
        self._steps = np.where(np.asarray(done) > 0.0, 0.0, self._steps + 1.0)

        info = {"cost": self._to_torch(cost)}
        return (self._to_torch(obs), self._to_torch(reward),
                self._to_torch(done), info)

    def reset_done(self):
        import jax.numpy as jp
        import mujoco

        layout = self.get_layout()
        qpos_reset = np.asarray(self._layout2qpos_b(
            {k: np.asarray(v) for k, v in layout.items()}))
        done = np.asarray(self._done)

        reset_idx = np.where(done > 0.0)[0]
        snaps = []
        for i in reset_idx:
            d = self._mj[int(i)]
            d.qpos[:] = qpos_reset[i]
            d.qvel[:] = 0.0
            d.ctrl[:] = 0.0
            # scratch step only to compute the reset observation
            # (engine.py:713-727: persistent data keeps merged pre-step
            # fields, incl. stale xpos/xmat)
            mujoco.mj_copyData(self._scratch, self.mj_model, d)
            for _ in range(self.psps):
                mujoco.mj_step(self.mj_model, self._scratch)
            s = self._scratch
            snaps.append(dict(
                qpos=np.array(s.qpos), qvel=np.array(s.qvel),
                qacc=np.array(s.qacc), ctrl=np.array(s.ctrl),
                xpos=np.array(s.xpos),
                xmat=np.array(s.xmat).reshape(-1, 3, 3),
            ))

        # merge persistent (un-stepped) state for done envs
        if len(reset_idx):
            data = {k: np.asarray(v).copy() for k, v in self._data.items()}
            data["qpos"][reset_idx] = qpos_reset[reset_idx]
            data["qvel"][reset_idx] = 0.0
            data["ctrl"][reset_idx] = 0.0
            self._data = {k: jp.asarray(v) for k, v in data.items()}

            obs_reset = np.asarray(self._obs_reset_b(self._stack(snaps)))
            obs = np.asarray(self._obs).copy()
            obs[reset_idx] = obs_reset
            obs = jp.asarray(obs)
        else:
            obs = self._obs
        return self._to_torch(obs)

    # ------------------------------------------------------------------
    @staticmethod
    def _to_torch(x):
        import torch

        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    @staticmethod
    def _from_torch(x):
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
        return np.asarray(x)
