"""Jitted trust-region machinery: FVP, CG, line search, CPO QP.

The reference runs conjugate gradient in numpy with a torch double-backward
Fisher-vector product per iteration and a Python backtracking loop of full-
batch evaluations (safe_rl_libX/cpo/cpo.py:188-222,459-560). Here the whole
update is one XLA program:
- FVP = jvp-of-grad of the mean diagonal-gaussian KL (no second graph)
- CG as a lax.while_loop with the reference's iteration cap and early stop
- backtracking line search as a lax.while_loop over full-batch evaluations
- the CPO QP case analysis (optim_case 0-4) with branch-free selects

All vectors are flat float32; pytrees flatten via jax.flatten_util.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

EPS = 1e-8


def flatten(params):
    """params pytree -> (flat vector, unravel fn)."""
    return ravel_pytree(params)


def make_fvp(kl_flat_fn, theta0):
    """Fisher/Hessian-vector product of the KL at theta0.

    kl_flat_fn: flat params -> scalar mean KL vs the frozen old policy.
    Equivalent to the reference's auto_hession_x (cpo.py:216-222) without
    materializing the intermediate graph. If the closure carries a
    `fvp_fn` attribute (a capped-curvature-batch KL —
    base.make_curvature_kl), the FVP differentiates that instead.
    """
    grad_fn = jax.grad(getattr(kl_flat_fn, 'fvp_fn', kl_flat_fn))

    def fvp(v):
        return jax.jvp(grad_fn, (theta0,), (v,))[1]

    return fvp


def cg(Ax, b, iters: int = 100):
    """Conjugate gradient solve Ax = b (reference cg, cpo.py:188-204:
    fixed 100 iterations, early stop when ||p|| < EPS)."""

    def cond(carry):
        _, _, p, _, i = carry
        return jnp.logical_and(i < iters, jnp.linalg.norm(p) >= EPS)

    def body(carry):
        x, r, p, r_dot_old, i = carry
        z = Ax(p)
        alpha = r_dot_old / (jnp.dot(p, z) + EPS)
        x = x + alpha * p
        r = r - alpha * z
        r_dot_new = jnp.dot(r, r)
        p = r + (r_dot_new / r_dot_old) * p
        return x, r, p, r_dot_new, i + 1

    x0 = jnp.zeros_like(b)
    carry = (x0, b, b, jnp.dot(b, b), jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return x


def backtracking_line_search(
    eval_fn, accept_fn, theta_old, x_direction,
    backtrack_coeff: float = 0.8, backtrack_iters: int = 100,
):
    """Find the largest step theta_old - coeff^j * x_direction accepted by
    accept_fn (reference cpo.py:528-560).

    eval_fn: flat theta -> tuple of scalars (e.g. (kl, pi_loss, surr_cost)).
    accept_fn: (*eval results) -> bool.
    Returns (theta_new, accepted, j) — theta_old if the search fails, like
    the reference's 'Line search failed! Keeping old params.'
    """

    def cond(carry):
        j, accepted, _ = carry
        return jnp.logical_and(j < backtrack_iters, jnp.logical_not(accepted))

    def body(carry):
        j, _, _ = carry
        theta = theta_old - (backtrack_coeff ** j.astype(jnp.float32)) * x_direction
        accepted = accept_fn(*eval_fn(theta))
        return j + 1, accepted, theta

    j, accepted, theta = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), theta_old)
    )
    theta_new = jnp.where(accepted, theta, theta_old)
    return theta_new, accepted, j - 1


def cpo_direction(Hinv_g, Hinv_b, approx_g, Hx_Hinv_b, b, c, target_kl):
    """CPO QP solution: optim_case + (lam, nu) + update direction
    (reference cpo.py:459-525), with branch-free selects.

    Args:
      Hinv_g:  H^-1 g           (CG solve of the policy gradient)
      Hinv_b:  H^-1 b           (CG solve of the cost gradient)
      approx_g: H @ Hinv_g      (reconstructed g)
      Hx_Hinv_b: H @ Hinv_b
      b: flat cost gradient
      c: scalar rescaled constraint violation (EpCost - target)/EpLen
      target_kl: trust-region radius
    Returns (x_direction, optim_case, lam, nu).
    """
    q = jnp.dot(Hinv_g, approx_g)
    b_small = jnp.dot(b, b) <= 1e-8

    r = jnp.dot(Hinv_b, approx_g)
    s = jnp.dot(Hinv_b, Hx_Hinv_b)
    A = q - r ** 2 / (s + EPS)
    B = 2 * target_kl - c ** 2 / (s + EPS)

    # optim_case (cpo.py:468-498)
    optim_case = jnp.where(
        jnp.logical_and(b_small, c < 0), 4,
        jnp.where(
            jnp.logical_and(c < 0, B < 0), 3,
            jnp.where(
                jnp.logical_and(c < 0, B >= 0), 2,
                jnp.where(B >= 0, 1, 0),
            ),
        ),
    )

    # lam/nu for each case family (cpo.py:504-521)
    lam_34 = jnp.sqrt(jnp.maximum(q, 0.0) / (2 * target_kl))
    # cases 1-2: projected optimum of the dual
    r_c = r / jnp.where(jnp.abs(c) < EPS, jnp.sign(c) * EPS + c, c)
    LA_lo, LA_hi = jnp.where(c < 0, 0.0, r_c), jnp.where(c < 0, r_c, jnp.inf)
    LB_lo, LB_hi = jnp.where(c < 0, r_c, 0.0), jnp.where(c < 0, jnp.inf, r_c)
    proj = lambda x, lo, hi: jnp.maximum(lo, jnp.minimum(hi, x))
    lam_a = proj(jnp.sqrt(jnp.maximum(A, 0.0) / jnp.maximum(B, EPS)), LA_lo, LA_hi)
    lam_b = proj(lam_34, LB_lo, LB_hi)
    f_a = -0.5 * (A / (lam_a + EPS) + B * lam_a) - r * c / (s + EPS)
    f_b = -0.5 * (q / (lam_b + EPS) + 2 * target_kl * lam_b)
    lam_12 = jnp.where(f_a >= f_b, lam_a, lam_b)
    nu_12 = jnp.maximum(0.0, lam_12 * c - r) / (s + EPS)
    nu_0 = jnp.sqrt(2 * target_kl / (s + EPS))

    lam = jnp.where(
        optim_case >= 3, lam_34, jnp.where(optim_case >= 1, lam_12, 0.0)
    )
    nu = jnp.where(
        optim_case >= 3, 0.0, jnp.where(optim_case >= 1, nu_12, nu_0)
    )

    # direction (cpo.py:525): recovery step for optim_case 0
    x_normal = (1.0 / (lam + EPS)) * (Hinv_g + nu * Hinv_b)
    x_recovery = nu * Hinv_b
    x = jnp.where(optim_case > 0, x_normal, x_recovery)
    return x, optim_case, lam, nu
