"""Domain randomization + Automatic Domain Randomization (ADR).

TPU-native counterpart of the reference's randomization stack:
- generic DR: `apply_randomizations` randomizes actor/sim params and adds
  obs/action noise on env resets
  (reference: IsaacGymEnvs/isaacgymenvs/tasks/base/vec_task.py:610)
- ADR: per-parameter boundaries expand when performance at the boundary
  stays high and contract when it drops, with a fraction of envs pinned at
  a boundary as evaluators
  (reference: IsaacGymEnvs/isaacgymenvs/tasks/dextreme/adr_vec_task.py,
  tasks/dextreme/allegro_hand_dextreme.py — the AllegroHandDextremeADR
  registry name)

Design (redesigned for the jitted-epoch runner, not a translation):
- Each env carries its own DR *ranges* (lo, hi per parameter) and the
  *multipliers* sampled from them, inside ``BenchState.dr`` — so fresh
  multipliers are drawn ON DEVICE at every reset (reference per-reset
  semantics), while the ranges themselves are host-writable between
  epochs without recompiling anything.
- ``ADRManager`` runs at epoch boundaries: it pins small probe groups of
  envs at the current lo/hi boundary of one parameter, compares their
  mean full-epoch return (runner ``PerEnvRet``) against the
  free-sampling population, and widens/narrows the global bounds —
  boundary-evaluator semantics at epoch granularity instead of the
  reference's per-episode queues (documented deviation; the jitted epoch
  is the natural scheduling quantum here).

DR parameter vector (DR_NDIM dims, all static-shape):
  0 mass_scale      multiplies body_mass and body_inertia
  1 damping_scale   multiplies dof_damping
  2 friction_scale  multiplies pair_friction and con_friction
  3 gain_scale      multiplies actuator_gear
  4 gravity_scale   multiplies gravity
  5 obs_noise       additive N(0, std) on observations
  6 act_noise       additive N(0, std) on actions
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DR_NDIM = 7
DR_NAMES = ['mass', 'damping', 'friction', 'gain', 'gravity',
            'obs_noise', 'act_noise']

# starting DR ranges (multiplier dims around 1.0, noise dims are stds);
# roughly the reference dextreme starting ranges
# (cfg/task/AllegroHandDextremeADR.yaml randomization blocks)
DEFAULT_LO = np.array([0.9, 0.8, 0.8, 0.9, 0.95, 0.0, 0.0], np.float32)
DEFAULT_HI = np.array([1.1, 1.2, 1.2, 1.1, 1.05, 0.002, 0.002], np.float32)

# hard limits ADR may never exceed
LIMIT_LO = np.array([0.3, 0.3, 0.2, 0.5, 0.5, 0.0, 0.0], np.float32)
LIMIT_HI = np.array([3.0, 3.0, 3.0, 2.0, 2.0, 0.10, 0.10], np.float32)

IDENTITY = np.array([1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0], np.float32)


def init_dr(enabled: bool):
    """Per-env DR block for a fresh BenchState (single env; the engine's
    reset paths resample `mult` from [lo, hi] on device)."""
    if not enabled:
        z = jnp.asarray(IDENTITY)
        return {'lo': z, 'hi': z, 'mult': z}
    return {'lo': jnp.asarray(DEFAULT_LO), 'hi': jnp.asarray(DEFAULT_HI),
            'mult': jnp.asarray(IDENTITY)}


def sample_mult(rng, dr):
    """Fresh multipliers from this env's own ranges (per-reset DR draw,
    vec_task.py:610 semantics)."""
    u = jax.random.uniform(rng, (DR_NDIM,))
    return dict(dr, mult=dr['lo'] + u * (dr['hi'] - dr['lo']))


def apply_to_model(model, mult):
    """Per-env randomized physics model (consumed under vmap: `mult` is
    this env's vector, the model pytree broadcasts)."""
    return model.replace(
        body_mass=model.body_mass * mult[0],
        body_inertia=model.body_inertia * mult[0],
        dof_damping=model.dof_damping * mult[1],
        pair_friction=(None if model.pair_friction is None
                       else model.pair_friction * mult[2]),
        con_friction=model.con_friction * mult[2],
        actuator_gear=model.actuator_gear * mult[3],
        gravity=model.gravity * mult[4],
    )


class ADRManager:
    """Boundary-evaluator ADR at epoch granularity.

    Each epoch: for `n_probe_dims` parameters, pin `probe_frac` of the
    env batch at that parameter's current lo (and another group at hi) by
    setting that env's [lo, hi] range to the boundary point; all other
    envs sample freely from the global bounds. After the epoch, a
    boundary whose probe group performs at least `perf_ratio` of the
    free-population mean return expands outward by `step_frac` of the
    current width; below `contract_ratio` it contracts. Bounds are
    clamped to [LIMIT_LO, LIMIT_HI] and kept ordered.

    Mirrors adr_vec_task.py's expand/contract rule with the performance
    queue replaced by the epoch's PerEnvRet group means.
    """

    def __init__(self, env_num: int, seed: int = 0, probe_frac: float = 0.08,
                 n_probe_dims: int = 2, perf_ratio: float = 0.8,
                 contract_ratio: float = 0.5, step_frac: float = 0.1):
        self.env_num = env_num
        self.rs = np.random.RandomState(seed)
        self.lo = DEFAULT_LO.copy()
        self.hi = DEFAULT_HI.copy()
        self.probe_frac = probe_frac
        self.n_probe_dims = n_probe_dims
        self.perf_ratio = perf_ratio
        self.contract_ratio = contract_ratio
        self.step_frac = step_frac
        self._groups = []  # [(dim, 'lo'|'hi', env indices)]

    # -- epoch hooks -------------------------------------------------------

    def before_epoch(self, env_state):
        """Assign probe groups and write per-env ranges into env_state.dr.
        Returns the updated (batched) env_state."""
        B = self.env_num
        n_group = max(1, int(B * self.probe_frac))
        # the 2*n_probe_dims probe groups must fit inside env_num — with
        # small env counts the permutation slice would otherwise run dry,
        # yielding empty groups and NaN probe means. Shrink the group size
        # first, then the number of probed dims, keeping ≥1 free env.
        n_dims = self.n_probe_dims
        if 2 * n_dims * n_group >= B:
            n_group = max(1, (B - 1) // max(1, 2 * n_dims))
            n_dims = min(n_dims, max(1, (B - 1) // (2 * n_group)))
        dims = self.rs.choice(DR_NDIM, size=n_dims, replace=False)
        perm = self.rs.permutation(B)
        lo = np.broadcast_to(self.lo, (B, DR_NDIM)).copy()
        hi = np.broadcast_to(self.hi, (B, DR_NDIM)).copy()
        self._groups = []
        ptr = 0
        for d in dims:
            for side in ('lo', 'hi'):
                idx = perm[ptr:ptr + n_group]
                ptr += n_group
                v = self.lo[d] if side == 'lo' else self.hi[d]
                lo[idx, d] = v
                hi[idx, d] = v
                self._groups.append((int(d), side, idx))
        dr = dict(env_state.dr)
        dr['lo'] = jnp.asarray(lo)
        dr['hi'] = jnp.asarray(hi)
        # resample multipliers so the pinned ranges take effect now, not
        # only at the next in-episode reset
        u = self.rs.uniform(size=(B, DR_NDIM)).astype(np.float32)
        dr['mult'] = jnp.asarray(lo + u * (hi - lo))
        return env_state.replace(dr=dr)

    def after_epoch(self, per_env_ret: np.ndarray) -> dict:
        """Expand/contract bounds from the probe groups' mean returns.
        Returns an ADR metrics dict."""
        per_env_ret = np.asarray(per_env_ret)
        probe_mask = np.zeros(self.env_num, bool)
        for _, _, idx in self._groups:
            probe_mask[idx] = True
        pop = per_env_ret[~probe_mask]
        pop_mean = float(pop.mean()) if pop.size else 0.0
        # FIXED metric schema (the TSV logger pins its header on the
        # first epoch): per-dim widths always, probe performances as a
        # mean over this epoch's groups
        metrics = {}
        probe_perfs = []
        for d, side, idx in self._groups:
            if idx.size == 0:  # belt-and-braces: never mean an empty slice
                continue
            g = float(per_env_ret[idx].mean())
            width = self.hi[d] - self.lo[d]
            step = self.step_frac * max(width, 1e-3)
            # performance ratio vs the free population (guard small/negative
            # denominators by comparing differences when pop_mean <= 0)
            if pop_mean > 1e-6:
                ratio = g / pop_mean
            else:
                ratio = 1.0 if g >= pop_mean else 0.0
            if ratio >= self.perf_ratio:
                if side == 'lo':
                    self.lo[d] -= step
                else:
                    self.hi[d] += step
            elif ratio < self.contract_ratio:
                if side == 'lo':
                    self.lo[d] += step
                else:
                    self.hi[d] -= step
            probe_perfs.append(g)
        self.lo = np.clip(self.lo, LIMIT_LO, LIMIT_HI)
        self.hi = np.clip(self.hi, LIMIT_LO, LIMIT_HI)
        # keep ordered with a minimum width around the identity point
        swap = self.lo > self.hi
        mid = 0.5 * (self.lo + self.hi)
        self.lo[swap] = mid[swap]
        self.hi[swap] = mid[swap]
        for d in range(DR_NDIM):
            metrics[f'ADR_width_{DR_NAMES[d]}'] = float(self.hi[d] - self.lo[d])
        metrics['ADR_mean_width'] = float((self.hi - self.lo).mean())
        metrics['ADR_pop_ret'] = pop_mean
        metrics['ADR_probe_ret'] = (float(np.mean(probe_perfs))
                                    if probe_perfs else 0.0)
        return metrics
