"""Domain randomization + ADR tests (guardx_tpu.envs.randomize;
reference: IsaacGymEnvs vec_task.py:610 apply_randomizations +
tasks/dextreme/adr_vec_task.py boundary loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guardx_tpu.envs import randomize
from guardx_tpu.envs.bench_tasks import NativeBenchEngine
from guardx_tpu.envs.randomize import ADRManager, DR_NDIM


@pytest.fixture(scope="module")
def env():
    return NativeBenchEngine('AllegroHandDextremeADR', env_num=6,
                             num_steps=12, seed=0)


@pytest.mark.slow
def test_dr_params_vary_per_env_and_per_reset(env):
    """Randomized multipliers must differ across envs AND change when an
    env resets (the reference draws on every reset event)."""
    env.reset()
    m0 = np.asarray(env._state.dr['mult'])
    # vary across envs
    assert np.std(m0[:, 0]) > 1e-4, "mass multipliers identical across envs"
    # within the configured ranges
    assert (m0 >= randomize.DEFAULT_LO - 1e-6).all()
    assert (m0 <= randomize.DEFAULT_HI + 1e-6).all()

    # force env 0 done -> reset_done draws fresh multipliers for it only
    done = jnp.zeros(6).at[0].set(1.0)
    env._done = done
    env.reset_done()
    m1 = np.asarray(env._state.dr['mult'])
    assert not np.allclose(m0[0], m1[0]), "reset did not redraw env 0's DR"
    np.testing.assert_allclose(m0[1:], m1[1:], atol=0,
                               err_msg="non-done envs' DR changed")


@pytest.mark.slow
def test_dr_changes_dynamics(env):
    """A heavier-gravity multiplier must change the physics outcome for
    the same state and actions."""
    env.reset()
    st = env._state
    light = dict(st.dr, mult=st.dr['mult'].at[:, 4].set(0.6))
    heavy = dict(st.dr, mult=st.dr['mult'].at[:, 4].set(1.8))
    a = jnp.zeros((6,) + env.action_space.shape)

    env._state = st.replace(dr=light)
    env.step(a)
    z_light = np.asarray(env._state.data.qpos[:, env._cube_adr + 2]).copy()

    env._state = st.replace(dr=heavy)
    env.step(a)
    z_heavy = np.asarray(env._state.data.qpos[:, env._cube_adr + 2])
    assert not np.allclose(z_light, z_heavy), (
        "gravity multiplier had no effect on the cube"
    )


def test_adr_expands_and_contracts():
    """Boundary groups performing at population level expand the bounds;
    groups performing badly contract them (adr_vec_task.py rule)."""
    B = 64
    adr = ADRManager(B, seed=1, probe_frac=0.1, n_probe_dims=2)
    lo0, hi0 = adr.lo.copy(), adr.hi.copy()

    class _S:
        dr = {'lo': jnp.zeros((B, DR_NDIM)), 'hi': jnp.zeros((B, DR_NDIM)),
              'mult': jnp.zeros((B, DR_NDIM))}

        def replace(self, **kw):
            s = _S()
            s.dr = kw.get('dr', self.dr)
            return s

    st = adr.before_epoch(_S())
    lo = np.asarray(st.dr['lo'])
    hi = np.asarray(st.dr['hi'])
    # probe groups are pinned (lo == hi) at a boundary
    pinned = (lo == hi).any(axis=-1)
    assert pinned.sum() >= 4 * 1  # 2 dims x 2 sides x >=1 env

    # all probe groups do as well as the population -> all probed bounds
    # expand
    metrics = adr.after_epoch(np.full(B, 5.0))
    probed = {d for d, _, _ in adr._groups}
    for d in probed:
        assert adr.lo[d] <= lo0[d] + 1e-9
        assert adr.hi[d] >= hi0[d] - 1e-9
    assert (adr.hi - adr.lo)[list(probed)].sum() > (hi0 - lo0)[list(probed)].sum() - 1e-9
    assert 'ADR_mean_width' in metrics

    # probe groups collapse to zero performance -> contraction
    lo1, hi1 = adr.lo.copy(), adr.hi.copy()
    adr.before_epoch(_S())
    rets = np.full(B, 5.0)
    for _, _, idx in adr._groups:
        rets[idx] = 0.0
    adr.after_epoch(rets)
    probed = sorted({d for d, _, _ in adr._groups})
    assert ((adr.hi - adr.lo)[probed] <= (hi1 - lo1)[probed] + 1e-9).all()
    assert ((adr.hi - adr.lo)[probed] < (hi1 - lo1)[probed]).any()


@pytest.mark.slow
def test_dextreme_adr_trainer_epoch():
    """AllegroHandDextremeADR end-to-end: trainer epoch with the ADR
    hooks produces PerEnvRet and updates bounds."""
    from guardx_tpu.algos.runner import Trainer
    from guardx_tpu.algos.algorithms import REGISTRY

    env = NativeBenchEngine('AllegroHandDextremeADR', env_num=8,
                            num_steps=10, seed=0)
    tr = Trainer(env, REGISTRY['ppo'](), seed=0)
    adr = ADRManager(8, seed=0, probe_frac=0.25, n_probe_dims=1)
    tr.state = tr.state.replace(env_state=adr.before_epoch(tr.state.env_state))
    m = tr.run_epoch(0)
    assert 'PerEnvRet' in m and np.shape(m['PerEnvRet']) == (8,)
    out = adr.after_epoch(m['PerEnvRet'])
    assert 'ADR_mean_width' in out


def test_adr_small_env_count_never_empty_groups():
    """ADVICE r3: with tiny env counts the probe-group slices used to run
    past the permutation, leaving empty groups and NaN probe metrics.
    Groups must always be non-empty and metrics finite."""
    for B in (2, 3, 4, 6):
        adr = ADRManager(B, seed=0, probe_frac=0.4, n_probe_dims=3)

        class _S:
            dr = {'lo': jnp.zeros((B, DR_NDIM)),
                  'hi': jnp.zeros((B, DR_NDIM)),
                  'mult': jnp.zeros((B, DR_NDIM))}

            def replace(self, **kw):
                s = _S()
                s.dr = kw.get('dr', self.dr)
                return s

        adr.before_epoch(_S())
        assert adr._groups, f"B={B}: no probe groups at all"
        for _, _, idx in adr._groups:
            assert idx.size >= 1, f"B={B}: empty probe group"
        metrics = adr.after_epoch(np.linspace(0.0, 1.0, B))
        for k, v in metrics.items():
            assert np.isfinite(v), f"B={B}: {k} non-finite ({v})"
