"""PBT subsystem: mutation semantics, the exploit decision rule, the
workspace snapshot protocol, and the in-process population driver
(capability parity with IsaacGymEnvs/isaacgymenvs/pbt — SURVEY.md §2.5)."""

import numpy as np
import pytest

import jax

from guardx_tpu import pbt
from guardx_tpu.algos.algorithms import REGISTRY
from guardx_tpu.algos.runner import Trainer
from guardx_tpu.envs import Engine


# ---------------------------------------------------------------------------
# mutation
# ---------------------------------------------------------------------------

def test_mutate_rate_zero_is_identity():
    rng = np.random.default_rng(0)
    hp = {'vf_lr': 1e-3, 'gamma': 0.99, 'target_kl': 0.01}
    assert pbt.mutate(rng, hp, mutation_rate=0.0) == hp


def test_mutate_bounds_and_kinds():
    rng = np.random.default_rng(1)
    hp = {'vf_lr': 1e-3, 'gamma': 0.99, 'train_v_iters': 80,
          'not_mutable': 42.0}
    changed = 0
    for _ in range(200):
        out = pbt.mutate(rng, hp, mutation_rate=1.0)
        assert out['not_mutable'] == 42.0
        assert 1e-5 <= out['vf_lr'] <= 1e-2
        # discount-space mutation keeps gamma < 1 and conservative
        assert 0.9 <= out['gamma'] < 1.0
        assert isinstance(out['train_v_iters'], int)
        assert abs(out['train_v_iters'] - 80) == 1
        changed += out['vf_lr'] != hp['vf_lr']
    assert changed == 200  # rate=1 always perturbs
    # multiplicative change stays within [x/1.5, x*1.5]
    rng = np.random.default_rng(2)
    for _ in range(100):
        out = pbt.mutate(rng, {'vf_lr': 1e-3}, mutation_rate=1.0)
        assert 1e-3 / 1.5 - 1e-12 <= out['vf_lr'] <= 1e-3 * 1.5 + 1e-12


# ---------------------------------------------------------------------------
# exploit decision (reference pbt.py:300-470 semantics)
# ---------------------------------------------------------------------------

def _cfg(tmp_path, idx=0, n=4, **kw):
    return pbt.PbtConfig(workspace=str(tmp_path), policy_idx=idx,
                         num_policies=n, **kw)


def _pop(objs):
    return [dict(policy_idx=i, iteration=1, objective=o, hp={})
            for i, o in enumerate(objs)]


def test_leader_never_replaced(tmp_path):
    cfg = _cfg(tmp_path, idx=0)
    rng = np.random.default_rng(0)
    assert pbt.decide_exploit(cfg, _pop([10.0, 1.0, 2.0, 3.0]), 10.0,
                              rng) is None


def test_laggard_exploits_a_top_member(tmp_path):
    cfg = _cfg(tmp_path, idx=3, replace_threshold_frac_std=0.0,
               replace_threshold_frac_absolute=0.0)
    rng = np.random.default_rng(0)
    donors = {pbt.decide_exploit(cfg, _pop([10.0, 9.0, 8.0, 0.0]), 0.0,
                                 rng)['policy_idx'] for _ in range(50)}
    assert donors == {0}  # top 30% of 4 rounds to the single best member


def test_within_threshold_keeps_training(tmp_path):
    cfg = _cfg(tmp_path, idx=1, replace_threshold_frac_absolute=0.5)
    rng = np.random.default_rng(0)
    # gap 2 < 0.5*|10| = 5 -> no replacement
    assert pbt.decide_exploit(cfg, _pop([10.0, 8.0, 9.0, 9.5]), 8.0,
                              rng) is None


def test_never_adopts_worse_donor(tmp_path):
    """ADVICE r1 (medium): in a skewed population [100, 1, 1, ..., me=50]
    the gap-to-best check passes, but every candidate donor except the
    best is WORSE than this member — the per-candidate delta must reject
    them, never inverting selection pressure."""
    cfg = _cfg(tmp_path, idx=9, n=10, replace_threshold_frac_std=0.5,
               replace_threshold_frac_absolute=0.05)
    rng = np.random.default_rng(0)
    objs = [100.0] + [1.0] * 8 + [50.0]
    for _ in range(100):
        donor = pbt.decide_exploit(cfg, _pop(objs), 50.0, rng)
        assert donor is None or donor['objective'] > 50.0


def test_warmup_requires_half_population(tmp_path):
    """No replacements until more than max(2, num_policies/2) members
    report (ADVICE r1: two-sample stds are noise)."""
    cfg = _cfg(tmp_path, idx=3, n=8,
               replace_threshold_frac_std=0.0,
               replace_threshold_frac_absolute=0.0)
    rng = np.random.default_rng(0)
    pop = _pop([10.0, 9.0, 0.0]) + [None] * 5
    assert pbt.decide_exploit(cfg, pop, 0.0, rng) is None
    pop = _pop([10.0, 9.0, 8.0, 0.0, 7.0]) + [None] * 3
    assert pbt.decide_exploit(cfg, pop, 0.0, rng) is not None


def test_unreported_members_ignored(tmp_path):
    cfg = _cfg(tmp_path, idx=0)
    rng = np.random.default_rng(0)
    assert pbt.decide_exploit(cfg, [None, None, None,
                                    dict(policy_idx=3, iteration=1,
                                         objective=1.0, hp={})],
                              0.0, rng) is None  # <2 known -> keep going


# ---------------------------------------------------------------------------
# snapshot protocol + end-to-end population
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_env():
    return Engine({'env_num': 4, 'num_steps': 8, 'hazards_num': 8,
                   '_seed': 0, 'gx_layout_pool': 4096})


def test_snapshot_roundtrip(tmp_path, tiny_env):
    tr = Trainer(tiny_env, REGISTRY['ppo'](train_v_iters=2), seed=0)
    pbt.save_snapshot(str(tmp_path), 0, 1, 3.5, tr.algo.hp, tr.state.algo)
    pop = pbt.load_population(str(tmp_path), 2)
    assert pop[0]['objective'] == 3.5 and pop[1] is None
    restored = pbt.restore_snapshot(str(tmp_path), 0, 1, tr.state.algo)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(tr.state.algo)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_run_pbt_population(tmp_path, tiny_env):
    """3-member population, exploit forced on (zero thresholds): laggards
    adopt the leader's params and mutate hp; training keeps running."""

    def make_trainer(idx, hp_overrides):
        hp = dict(train_v_iters=2, train_vc_iters=2, backtrack_iters=5)
        hp.update(hp_overrides)
        return Trainer(tiny_env, REGISTRY['ppo'](**hp), seed=idx)

    summaries = pbt.run_pbt(
        make_trainer, num_policies=3, epochs=4, workspace=str(tmp_path),
        seed=0, interval_epochs=2, start_after_epochs=2,
        replace_threshold_frac_std=0.0, replace_threshold_frac_absolute=0.0,
        mutation_rate=1.0,
    )
    assert all(s is not None for s in summaries)
    assert all(np.isfinite(s['objective']) for s in summaries)
    # every member wrote 2 iterations of snapshots
    import glob, os
    for i in range(3):
        files = glob.glob(os.path.join(str(tmp_path), f'policy_{i:02d}',
                                       '*.npz'))
        assert len(files) == 2
