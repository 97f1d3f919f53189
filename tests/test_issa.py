"""ISSA / UAISSA behavioral tests: AdamBA boundary search on a synthetic
safe set, safety-index math, and real-engine action correction."""

import numpy as np
import jax
import jax.numpy as jnp

from guardx_tpu.algos.algorithms.issa_family import (
    adamba_one_direction, adamba_sc, safety_index,
)


def test_adamba_finds_safe_boundary():
    """Safe set = {|a| <= 1}. Starting from an unsafe action, outreach +
    bisection along a direction pointing back inside must return a point
    just inside the boundary."""
    chk_safe = lambda a: jnp.linalg.norm(a) <= 1.0
    a0 = jnp.array([2.0, 0.0])
    direction = jnp.array([-0.5, 0.0])  # half-unit, as adamba_directions
    lo, hi = jnp.full(2, -10.0), jnp.full(2, 10.0)
    cand, valid = jax.jit(
        lambda: adamba_one_direction(a0, direction, chk_safe, lo, hi)
    )()
    assert bool(valid)
    n = float(jnp.linalg.norm(cand))
    assert n <= 1.0 + 1e-5
    assert n >= 0.98  # boundary point, not deep interior


def test_adamba_sc_picks_min_norm():
    # half-space safe set (the realistic shape of a safety-index level
    # set in action space — the doubling outreach cannot overshoot it)
    chk_safe = lambda a: a[1] <= 0.0
    a0 = jnp.array([0.0, 0.8])
    lo, hi = jnp.full(2, -10.0), jnp.full(2, 10.0)
    a_safe, found = jax.jit(
        lambda k: adamba_sc(a0, chk_safe, lo, hi, k, vec_num=5)
    )(jax.random.PRNGKey(0))
    assert bool(found)
    assert float(a_safe[1]) <= 1e-4  # boundary point
    # min-norm among the directions that reached the boundary
    assert float(jnp.linalg.norm(a_safe)) < float(jnp.linalg.norm(a0))


def test_adamba_fallback_when_no_safe_action():
    chk_safe = lambda a: jnp.bool_(False)
    a0 = jnp.array([0.3, -0.2])
    lo, hi = jnp.full(2, -1.0), jnp.full(2, 1.0)
    a_safe, found = adamba_sc(a0, chk_safe, lo, hi,
                              jax.random.PRNGKey(0), vec_num=5)
    assert not bool(found)
    np.testing.assert_allclose(np.asarray(a_safe), np.asarray(a0))


def test_safety_index_signs():
    """phi > 0 when inside/approaching a hazard, < 0 when far and
    receding."""
    hz = jnp.array([[0.0, 0.0]])
    # robot far away, moving away: safe
    phi_far = safety_index(jnp.array([5.0, 0.0]), jnp.array([1.0, 0.0]),
                           hz, 0.3, 3.0, 0.04, 1.0)
    assert float(phi_far) < 0
    # robot at the hazard edge, driving in: unsafe
    phi_in = safety_index(jnp.array([0.35, 0.0]), jnp.array([-1.0, 0.0]),
                          hz, 0.3, 3.0, 0.04, 1.0)
    assert float(phi_in) > 0


def test_issa_corrects_toward_safety():
    """On a point robot aimed at a hazard, the executed action after ISSA
    correction must not increase the adaptive safety index as much as the
    raw action would."""
    from guardx_tpu.envs import Engine
    from guardx_tpu.algos.algorithms import REGISTRY
    from guardx_tpu.algos.base import Networks
    from guardx_tpu import physics

    env = Engine({'env_num': 2, 'num_steps': 8, 'hazards_num': 8,
                  '_seed': 0, 'gx_layout_pool': 2048})
    algo = REGISTRY['issa']()
    nets = Networks(env.obs_flat_size, env.action_space.shape[0])

    pool = jax.jit(env.make_layout_pool)(jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    obs, state = jax.jit(jax.vmap(env.reset_single, in_axes=(0, None)))(
        keys, pool
    )
    # aim straight at the nearest hazard at full thrust
    xy = state.data.xpos[:, env.body_robot, :2]
    rel = state.hazards_pos - xy[:, None, :]
    d = jnp.linalg.norm(rel, axis=-1)
    near = jnp.argmin(d, axis=-1)
    a_raw = jnp.stack([jnp.full((2,), 1.0), jnp.zeros((2,))], axis=-1)

    import flax

    dummy = flax.core.freeze({})  # AlgoState stand-in pieces unused by hook
    from guardx_tpu.algos.base import AlgoState

    s = AlgoState(pi=None, v=None, vc=None, v_opt=None, vc_opt=None, extra={})
    a_safe, extra = jax.jit(
        lambda st, a, k: algo.correct_action(
            nets, s, obs, a, {}, 0.5, k, env=env, env_state=st
        )
    )(state, a_raw, jax.random.PRNGKey(3))
    assert a_safe.shape == a_raw.shape
    assert np.all(np.isfinite(np.asarray(a_safe)))

    def phi_after(action):
        def one(st, ac):
            ctrl = env.convert_action(st.data, ac)
            data = physics.step(env.model, st.data.replace(ctrl=ctrl))
            xy_n = st.data.xpos[env.body_robot][:2]
            xy_f = data.xpos[env.body_robot][:2]
            vel = (xy_f - xy_n) / env.dt
            return safety_index(xy_f, vel, st.hazards_pos,
                                env.hazards_size, 3.0, 0.04, 1.0)

        return jax.vmap(one)(state, action)

    phi_raw = np.asarray(phi_after(a_raw))
    phi_safe = np.asarray(phi_after(a_safe))
    assert np.all(phi_safe <= phi_raw + 1e-5)
