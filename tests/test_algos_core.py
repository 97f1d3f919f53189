"""Unit tests for GAE buffers and the trust-region core (SURVEY.md §4:
kernel-level tests for GAE scan, CG/FVP, CPO QP cases on synthetic
quadratics)."""

import numpy as np
import scipy.signal
import pytest

import jax
import jax.numpy as jnp

from guardx_tpu.algos import buffer, trust_region, core


def ref_discount_cumsum(x, discount):
    return scipy.signal.lfilter([1], [1, float(-discount)], x[::-1], axis=0)[::-1]


def test_discount_cumsum_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.randn(50).astype(np.float32)
    ours = np.asarray(buffer.discount_cumsum(jnp.asarray(x), 0.97))
    np.testing.assert_allclose(ours, ref_discount_cumsum(x, 0.97), rtol=1e-5, atol=1e-5)


def test_gae_matches_reference_segments():
    """Masked (T,B) GAE must equal the reference's per-segment scipy GAE with
    zero bootstrap at every done (cpo.py:104-137 with last_val=0)."""
    rng = np.random.RandomState(1)
    T, B = 20, 3
    rew = rng.randn(T, B).astype(np.float32)
    val = rng.randn(T, B).astype(np.float32)
    done = np.zeros((T, B), np.float32)
    done[7, 0] = 1
    done[14, 0] = 1
    done[3, 1] = 1
    done[-1, :] = 1  # epoch end: all finished (timeout semantics)
    gamma, lam = 0.99, 0.97

    adv, ret = buffer.gae(jnp.asarray(rew), jnp.asarray(val), jnp.asarray(done), gamma, lam)
    adv, ret = np.asarray(adv), np.asarray(ret)

    for b in range(B):
        start = 0
        for t in range(T):
            if done[t, b] == 1:
                sl = slice(start, t + 1)
                rews = np.append(rew[sl, b], 0.0)
                vals = np.append(val[sl, b], 0.0)
                deltas = rews[:-1] + gamma * vals[1:] - vals[:-1]
                adv_ref = ref_discount_cumsum(deltas, gamma * lam)
                ret_ref = ref_discount_cumsum(rews, gamma)[:-1]
                np.testing.assert_allclose(adv[sl, b], adv_ref, rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(ret[sl, b], ret_ref, rtol=1e-4, atol=1e-4)
                start = t + 1


def test_one_episode_mask():
    done = jnp.asarray(
        np.array([[0, 0], [0, 1], [1, 0], [0, 0]], dtype=np.float32)
    )
    valid = np.asarray(buffer.one_episode_mask(done))
    np.testing.assert_array_equal(valid, [[1, 1], [1, 1], [1, 0], [0, 0]])


def test_cg_solves_spd():
    rng = np.random.RandomState(2)
    A_ = rng.randn(12, 12)
    A_ = A_ @ A_.T + 12 * np.eye(12)
    b = rng.randn(12).astype(np.float32)
    A = jnp.asarray(A_, dtype=jnp.float32)
    x = trust_region.cg(lambda v: A @ v, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(A @ x), b, rtol=1e-3, atol=1e-3)


def test_fvp_is_hessian_vector_product():
    """FVP of the gaussian KL at theta0 must equal the explicit Hessian."""
    rng = np.random.RandomState(3)
    obs = jnp.asarray(rng.randn(32, 5).astype(np.float32))
    actor = core.GaussianActor(act_dim=2, hidden_sizes=(8,))
    params = actor.init(jax.random.PRNGKey(0), obs)
    mu_old, log_std_old = actor.apply(params, obs)
    theta0, unravel = trust_region.flatten(params)

    def kl_flat(theta):
        mu, log_std = actor.apply(unravel(theta), obs)
        return core.diagonal_gaussian_kl(mu_old, log_std_old, mu, log_std)

    fvp = trust_region.make_fvp(kl_flat, theta0)
    H = jax.hessian(kl_flat)(theta0)
    v = jnp.asarray(rng.randn(theta0.shape[0]).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fvp(v)), np.asarray(H @ v), rtol=1e-3, atol=1e-4
    )


def _ref_cpo_qp(Hinv_g, Hinv_b, approx_g, Hx_Hinv_b, b, c, target_kl):
    """Direct numpy transcription of the reference QP (cpo.py:459-525)."""
    EPS = 1e-8
    q = Hinv_g @ approx_g
    if b @ b <= 1e-8 and c < 0:
        optim_case = 4
        r = s = A = B = 0
    else:
        r = Hinv_b @ approx_g
        s = Hinv_b @ Hx_Hinv_b
        A = q - r ** 2 / (s + EPS)
        B = 2 * target_kl - c ** 2 / (s + EPS)
        if c < 0 and B < 0:
            optim_case = 3
        elif c < 0 and B >= 0:
            optim_case = 2
        elif c >= 0 and B >= 0:
            optim_case = 1
        else:
            optim_case = 0
    if optim_case in [3, 4]:
        lam = np.sqrt(q / (2 * target_kl))
        nu = 0
    elif optim_case in [1, 2]:
        LA, LB = [0, r / c], [r / c, np.inf]
        LA, LB = (LA, LB) if c < 0 else (LB, LA)
        proj = lambda x, L: max(L[0], min(L[1], x))
        lam_a = proj(np.sqrt(A / B), LA)
        lam_b = proj(np.sqrt(q / (2 * target_kl)), LB)
        f_a = lambda lam: -0.5 * (A / (lam + EPS) + B * lam) - r * c / (s + EPS)
        f_b = lambda lam: -0.5 * (q / (lam + EPS) + 2 * target_kl * lam)
        lam = lam_a if f_a(lam_a) >= f_b(lam_b) else lam_b
        nu = max(0, lam * c - r) / (s + EPS)
    else:
        lam = 0
        nu = np.sqrt(2 * target_kl / (s + EPS))
    x = (1.0 / (lam + EPS)) * (Hinv_g + nu * Hinv_b) if optim_case > 0 else nu * Hinv_b
    return x, optim_case


@pytest.mark.parametrize("case_target,c_sign,b_scale", [
    (4, -1.0, 0.0),     # zero cost grad, feasible
    (3, -1.0, 0.01),    # feasible, boundary outside TR
    (2, -0.05, 1.0),    # feasible, boundary intersects
    (1, 0.05, 1.0),     # infeasible, recovery possible
    (0, 3.0, 1.0),      # infeasible, TR outside
])
def test_cpo_qp_cases(case_target, c_sign, b_scale):
    rng = np.random.RandomState(case_target)
    n = 10
    H_ = rng.randn(n, n)
    H_ = H_ @ H_.T + n * np.eye(n)
    g = rng.randn(n)
    b = b_scale * rng.randn(n)
    c = c_sign
    target_kl = 0.01
    Hinv_g = np.linalg.solve(H_, g)
    Hinv_b = np.linalg.solve(H_, b)
    approx_g = H_ @ Hinv_g
    Hx_Hinv_b = H_ @ Hinv_b

    x_ref, case_ref = _ref_cpo_qp(Hinv_g, Hinv_b, approx_g, Hx_Hinv_b, b, c, target_kl)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    x, case, lam, nu = trust_region.cpo_direction(
        f32(Hinv_g), f32(Hinv_b), f32(approx_g), f32(Hx_Hinv_b), f32(b),
        jnp.float32(c), target_kl,
    )
    assert int(case) == case_ref == case_target
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=2e-4)


def test_line_search_accepts_and_rejects():
    theta0 = jnp.zeros(3)
    direction = jnp.ones(3)

    # accept when the step is small enough: |theta|_inf <= 0.3
    def eval_fn(theta):
        return (jnp.max(jnp.abs(theta)),)

    accept = lambda m: m <= 0.3
    theta, ok, j = trust_region.backtracking_line_search(
        eval_fn, accept, theta0, direction, backtrack_coeff=0.5, backtrack_iters=10
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(theta), -0.25 * np.ones(3), atol=1e-6)

    # impossible criterion: keep old params
    theta, ok, _ = trust_region.backtracking_line_search(
        eval_fn, lambda m: m < -1.0, theta0, direction, backtrack_iters=5
    )
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(theta), np.zeros(3))
