"""Population-based training: decentralized exploit/explore over a shared
workspace directory.

Re-implements the capability of the reference's PBT subsystem
(IsaacGymEnvs/isaacgymenvs/pbt/pbt.py:200-690, mutation.py:33-97) for this
framework. The protocol is the same decentralized design — there is no
coordinator process:

- every population member periodically writes an iteration summary
  (objective + hyperparams) and a full-AlgoState snapshot into
  ``<workspace>/policy_<idx>/``;
- at each PBT interval a member reads every other member's latest summary
  and decides for itself whether to keep going or to *exploit*: restore the
  snapshot of a random top-``replace_fraction_best`` member and *explore*
  by mutating its own hyperparameters (reference decision rule: replace
  only if the gap to the population's best exceeds
  ``max(frac_std * std(objectives), frac_absolute * |best|)``,
  pbt.py:300-470);
- mutation multiplies/divides each selected float by
  ``uniform(change_min, change_max)`` with a ``mutation_rate`` coin per
  param; discount-like params mutate conservatively in (1 - x) space
  (mutation.py:33-69).

Differences from the reference, by design: the reference *restarts the
whole OS process* with new hydra args to apply mutated hyperparams
(pbt.py:123-177); here exploit rebuilds the member's jitted trainer
in-process and grafts the restored AlgoState into it, so a population can
run round-robin on one chip (``run_pbt``) or as one member per
host/process against a shared filesystem workspace (``PbtMember`` used
from ``guardx_tpu.train``-style scripts). Snapshots restore the complete
learnable state (params + both critic optimizers + algo extras), not just
model weights.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

_UNINITIALIZED = -1e9
KEEP_SNAPSHOTS = 3  # per-member .npz snapshots retained on disk


# ---------------------------------------------------------------------------
# Mutation (reference mutation.py:33-97)
# ---------------------------------------------------------------------------

def mutate_float(rng: np.random.Generator, x: float, change_min: float,
                 change_max: float) -> float:
    """x */÷ uniform(change_min, change_max), direction by coin flip."""
    amount = rng.uniform(change_min, change_max)
    return x / amount if rng.random() < 0.5 else x * amount


def mutate_discount(rng: np.random.Generator, x: float, change_min: float,
                    change_max: float) -> float:
    """Mutate gamma-like params in (1 - x) space, conservatively capped
    (reference mutation.py:62-69)."""
    inv = mutate_float(rng, 1.0 - x, change_min, min(change_max, 1.2))
    return 1.0 - inv


#: name -> (kind, lo, hi). kind 'float' is multiplicative; 'discount'
#: mutates 1-x; 'int' steps by ±1. Bounds clamp after mutation.
DEFAULT_MUTATION: dict[str, tuple[str, float, float]] = {
    'vf_lr': ('float', 1e-5, 1e-2),
    'vcf_lr': ('float', 1e-5, 1e-2),
    'pi_lr': ('float', 1e-5, 1e-2),
    'target_kl': ('float', 1e-4, 0.1),
    'lam': ('discount', 0.8, 0.9999),
    'gamma': ('discount', 0.9, 0.9999),
    'clip_ratio': ('float', 0.01, 0.3),
    'train_v_iters': ('int', 1, 200),
    'train_vc_iters': ('int', 1, 200),
}


def mutate(rng: np.random.Generator, params: dict[str, Any],
           mutation_rate: float = 0.15, change_min: float = 1.1,
           change_max: float = 1.5,
           spec: dict[str, tuple[str, float, float]] | None = None,
           ) -> dict[str, Any]:
    """Return a mutated copy of `params` (only keys present in `spec`)."""
    spec = DEFAULT_MUTATION if spec is None else spec
    out = dict(params)
    for name, value in params.items():
        if name not in spec:
            continue
        if rng.random() > mutation_rate:
            continue
        kind, lo, hi = spec[name]
        if kind == 'float':
            new = mutate_float(rng, float(value), change_min, change_max)
        elif kind == 'discount':
            new = mutate_discount(rng, float(value), change_min, change_max)
        elif kind == 'int':
            new = int(value) + (1 if rng.random() < 0.5 else -1)
        else:
            raise ValueError(f"unknown mutation kind '{kind}'")
        out[name] = type(value)(np.clip(new, lo, hi)) if kind != 'int' \
            else int(np.clip(new, lo, hi))
    return out


# ---------------------------------------------------------------------------
# Workspace protocol
# ---------------------------------------------------------------------------

def _policy_dir(workspace: str, idx: int) -> str:
    return os.path.join(workspace, f'policy_{idx:02d}')


def save_snapshot(workspace: str, policy_idx: int, iteration: int,
                  objective: float, hp: dict, algo_state) -> str:
    """Write <iter>.json summary + <iter>.npz AlgoState leaves."""
    import jax

    d = _policy_dir(workspace, policy_idx)
    os.makedirs(d, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(jax.device_get(algo_state))
    np.savez(os.path.join(d, f'{iteration:06d}.npz'),
             **{f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)})
    summary = dict(
        policy_idx=policy_idx, iteration=iteration,
        objective=float(objective),
        hp={k: v for k, v in hp.items()
            if isinstance(v, (int, float, bool, str))},
        ts=time.time(),
    )
    path = os.path.join(d, f'{iteration:06d}.json')
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(summary, f)
    os.replace(tmp, path)  # atomic for concurrent readers

    # bound disk use: drop this member's snapshots older than the last
    # KEEP_SNAPSHOTS iterations (the reference runs _cleanup per PBT
    # iteration; a couple are kept for in-flight readers)
    npzs = sorted(glob.glob(os.path.join(d, '[0-9]*.npz')))
    for old in npzs[:-KEEP_SNAPSHOTS]:
        try:
            os.remove(old)
        except OSError:
            pass
    return path


def load_population(workspace: str, num_policies: int) -> list[dict | None]:
    """Latest summary per policy (None where a member has not reported)."""
    out: list[dict | None] = []
    for i in range(num_policies):
        files = sorted(glob.glob(os.path.join(_policy_dir(workspace, i),
                                              '[0-9]*.json')))
        if not files:
            out.append(None)
            continue
        try:
            with open(files[-1]) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            out.append(None)  # mid-write by another process; skip this round
    return out


def restore_snapshot(workspace: str, policy_idx: int, iteration: int,
                     algo_state_like):
    """Load a snapshot into the structure of `algo_state_like`."""
    import jax
    import jax.numpy as jnp

    d = _policy_dir(workspace, policy_idx)
    with np.load(os.path.join(d, f'{iteration:06d}.npz')) as z:
        loaded = [z[f'leaf_{i}'] for i in range(len(z.files))]
    leaves, treedef = jax.tree_util.tree_flatten(algo_state_like)
    if len(loaded) != len(leaves):
        raise ValueError(
            f'snapshot has {len(loaded)} leaves, expected {len(leaves)} — '
            'population members must share algorithm + network shapes')
    cast = [jnp.asarray(x, dtype=like.dtype)
            for x, like in zip(loaded, leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)


# ---------------------------------------------------------------------------
# Exploit decision (reference pbt.py:300-470)
# ---------------------------------------------------------------------------

@dataclass
class PbtConfig:
    workspace: str
    policy_idx: int
    num_policies: int
    interval_epochs: int = 10
    start_after_epochs: int = 10     # no replacement before this many epochs
    replace_fraction_best: float = 0.3
    replace_threshold_frac_std: float = 0.5
    replace_threshold_frac_absolute: float = 0.05
    mutation_rate: float = 0.15
    change_min: float = 1.1
    change_max: float = 1.5
    objective_key: str = 'EpRet'
    mutable: dict[str, tuple[str, float, float]] = field(
        default_factory=lambda: dict(DEFAULT_MUTATION))


def decide_exploit(cfg: PbtConfig, population: list[dict | None],
                   my_objective: float, rng: np.random.Generator,
                   ) -> dict | None:
    """Return the summary of the member to restore from, or None to keep
    training. Pure function of the population snapshot — unit-testable.

    Mirrors the reference's selection pressure (pbt.py:300-470):
    - warm-up: no replacements until more than max(2, num_policies/2)
      members have reported (noisy two-sample stds otherwise);
    - the per-candidate objective delta must exceed the threshold — a
      skewed population must not let a middling member adopt a WORSE
      donor just because the population best is far ahead.
    """
    known = [p for p in population
             if p is not None and p['objective'] > _UNINITIALIZED]
    if len(known) <= max(2, cfg.num_policies // 2):
        return None
    objectives = np.array([p['objective'] for p in known])
    best = float(objectives.max())
    threshold = max(
        cfg.replace_threshold_frac_std * float(objectives.std()),
        cfg.replace_threshold_frac_absolute * abs(best),
    )
    if my_objective >= best - threshold:
        return None
    n_best = max(1, int(round(cfg.replace_fraction_best * len(known))))
    top = sorted(known, key=lambda p: p['objective'], reverse=True)[:n_best]
    # never "exploit" yourself, and only adopt donors that beat this
    # member by the same threshold (reference objective_delta check)
    top = [p for p in top
           if p['policy_idx'] != cfg.policy_idx
           and p['objective'] - my_objective > threshold]
    if not top:
        return None
    return top[int(rng.integers(len(top)))]


# ---------------------------------------------------------------------------
# Member driver
# ---------------------------------------------------------------------------

class PbtMember:
    """Hooks PBT into a training loop. Call `after_epoch` once per epoch;
    when it returns a (donor_summary, restored_algo_state, mutated_hp)
    triple the caller applies the exploit (see `run_pbt`)."""

    def __init__(self, cfg: PbtConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed * 7919 + cfg.policy_idx)
        self.iteration = 0
        self._objs: list[float] = []

    def after_epoch(self, epoch: int, metrics: dict, hp: dict, algo_state):
        cfg = self.cfg
        if cfg.objective_key in metrics:
            self._objs.append(float(metrics[cfg.objective_key]))
        if (epoch + 1) % cfg.interval_epochs != 0:
            return None
        # interval mean over the epochs that actually reported the
        # objective; _UNINITIALIZED only when none did (the reference
        # filters uninitialized values the same way) — one missing epoch
        # must not poison the mean with -1e9
        window = self._objs[-cfg.interval_epochs:]
        objective = float(np.mean(window)) if window else _UNINITIALIZED
        self.iteration += 1
        save_snapshot(cfg.workspace, cfg.policy_idx, self.iteration,
                      objective, hp, algo_state)
        if epoch + 1 < cfg.start_after_epochs:
            return None
        population = load_population(cfg.workspace, cfg.num_policies)
        donor = decide_exploit(cfg, population, objective, self.rng)
        if donor is None:
            return None
        restored = restore_snapshot(cfg.workspace, donor['policy_idx'],
                                    donor['iteration'], algo_state)
        new_hp = mutate(self.rng, dict(hp, **donor.get('hp', {})),
                        cfg.mutation_rate, cfg.change_min, cfg.change_max,
                        cfg.mutable)
        return donor, restored, new_hp


def run_pbt(make_trainer: Callable[[int, dict], Any], num_policies: int,
            epochs: int, workspace: str, seed: int = 0,
            interval_epochs: int = 10, start_after_epochs: int | None = None,
            objective_key: str = 'EpRet', log_fn=print,
            **cfg_kwargs) -> list[dict]:
    """In-process round-robin PBT driver.

    make_trainer(policy_idx, hp_overrides) -> a Trainer-like object with
    `.run_epoch(e) -> metrics`, `.state.algo`, `.state.replace`, and
    `.algo.hp`. Returns the final per-member summaries.

    The reference applies mutated hyperparams by restarting the OS process
    (pbt.py:123-177); here exploit rebuilds the member's trainer with the
    new hyperparams and grafts the donor's AlgoState in.
    """
    os.makedirs(workspace, exist_ok=True)
    if start_after_epochs is None:
        start_after_epochs = interval_epochs
    members, trainers, hps = [], [], []
    for i in range(num_policies):
        cfg = PbtConfig(
            workspace=workspace, policy_idx=i, num_policies=num_policies,
            interval_epochs=interval_epochs,
            start_after_epochs=start_after_epochs,
            objective_key=objective_key, **cfg_kwargs,
        )
        members.append(PbtMember(cfg, seed=seed))
        trainers.append(make_trainer(i, {}))
        hps.append(dict(trainers[i].algo.hp))

    for epoch in range(epochs):
        for i in range(num_policies):
            metrics = trainers[i].run_epoch(epoch)
            out = members[i].after_epoch(
                epoch, metrics, hps[i], trainers[i].state.algo)
            if out is None:
                continue
            donor, restored, new_hp = out
            log_fn(f"[pbt] policy {i} exploits policy "
                   f"{donor['policy_idx']} (objective "
                   f"{donor['objective']:.3f}); mutated hp applied")
            hps[i] = new_hp
            trainers[i] = make_trainer(i, new_hp)
            trainers[i].state = trainers[i].state.replace(algo=restored)

    return load_population(workspace, num_policies)
