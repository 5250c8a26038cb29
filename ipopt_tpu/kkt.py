"""Augmented KKT system assembly, residuals, and primal-dual step recovery.

Reference parity:
- ``StdAugSystemSolver`` (``src/Algorithm/IpStdAugSystemSolver.hpp:140-172``):
  builds the 4-block augmented system

      [ W + D_x + delta_x I      0         J_c^T      J_d^T ]
      [        0            D_s + delta_s    0         -I   ]
      [       J_c                0       -delta_c I     0   ]
      [       J_d               -I           0     -delta_d I]

  where D_x = Sl_xL^{-1} Z_L + Sl_xU^{-1} Z_U and D_s likewise (the condensed
  bound-multiplier blocks).  Expected inertia: (n + mi, me + mi, 0)
  (``IpPDFullSpaceSolver.cpp:486,541``).
- ``PDFullSpaceSolver`` (``IpPDFullSpaceSolver.cpp``): reduction of the
  8-block primal-dual system to the augmented system, bound-multiplier step
  recovery from the Sigma back-substitution, and iterative refinement on the
  full 8-block residual (``:235-345``).

Everything here is dense jnp (XLA fuses assembly into the factorization input);
structured/sparse variants live in ``ipopt_tpu/linalg``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .types import Iterate, KKTResiduals
from .problem import CanonicalNLP


class Evals(NamedTuple):
    """Cached NLP evaluations at a point (OrigIpoptNLP cache equivalent).

    ``J_c``/``J_d`` are dense Jacobians — present for the dense KKT backend
    only.  All algorithm-level code uses the transpose-product closures
    ``jc_t(y)`` = J_c^T y and ``jd_t(y)`` = J_d^T y, which structured backends
    implement via VJPs without ever materializing a dense Jacobian.
    """

    f: jnp.ndarray
    grad_f: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray
    J_c: Any
    J_d: Any
    jc_t: Any
    jd_t: Any


def evaluate(nlp: CanonicalNLP, x: jnp.ndarray) -> Evals:
    if getattr(nlp, "chain", None) is not None:
        # Structured path: never materialize dense Jacobians — transpose
        # products via VJP through the stage-structured constraint function.
        if getattr(nlp.struct, "fd_jac_eps", 0.0):
            raise NotImplementedError(
                "jacobian_approximation='finite-difference-values' needs "
                "the dense backend (structured backends are matrix-free)")
        # All results pinned to the evaluation-point dtype: with x64 enabled
        # (mixed-precision modes) a model whose closures embed float64 numpy
        # constants would silently promote f32 evaluations and break
        # while-loop carry dtypes downstream.
        cdt = x.dtype
        f = nlp.eval_f(x).astype(cdt)
        grad_f = nlp.eval_grad_f(x).astype(cdt)
        c, c_vjp = jax.vjp(nlp.eval_c, x)
        d, d_vjp = jax.vjp(nlp.eval_d, x)
        return Evals(f=f.astype(cdt), grad_f=grad_f, c=c.astype(cdt),
                     d=d.astype(cdt), J_c=None, J_d=None,
                     jc_t=lambda y: c_vjp(y.astype(c.dtype))[0].astype(cdt),
                     jd_t=lambda y: d_vjp(y.astype(d.dtype))[0].astype(cdt))
    f, grad_f, c, d, J_c, J_d = nlp.eval_all(x)
    cdt = x.dtype
    f, grad_f, c, d = (f.astype(cdt), grad_f.astype(cdt), c.astype(cdt),
                       d.astype(cdt))
    if J_c is not None:
        J_c = J_c.astype(cdt)
    if J_d is not None:
        J_d = J_d.astype(cdt)
    return Evals(f=f, grad_f=grad_f, c=c, d=d, J_c=J_c, J_d=J_d,
                 jc_t=lambda y: J_c.T @ y, jd_t=lambda y: J_d.T @ y)


# ---------------------------------------------------------------------------
# Slacks and barrier quantities
# ---------------------------------------------------------------------------

def slacks(nlp: CanonicalNLP, it: Iterate):
    """Masked slack vectors; 1.0 where a bound is absent (so logs/divisions are
    safe and masked contributions vanish)."""
    one = jnp.ones((), it.x.dtype)
    sl_xL = jnp.where(nlp.has_xL, it.x - nlp.x_L, one)
    sl_xU = jnp.where(nlp.has_xU, nlp.x_U - it.x, one)
    sl_sL = jnp.where(nlp.has_dL, it.s - nlp.d_L, one)
    sl_sU = jnp.where(nlp.has_dU, nlp.d_U - it.s, one)
    return sl_xL, sl_xU, sl_sL, sl_sU


def barrier_obj(nlp: CanonicalNLP, it: Iterate, f_val, mu, kappa_d=1e-5):
    """phi_mu = f - mu * sum(log(slacks)) + kappa_d * mu * linear damping.

    The damping term (Ipopt's kappa_d, IpOrigIpoptNLP.cpp barrier term with
    linear damping for variables with only one bound) prevents the iterates
    from diverging along directions that only have a single bound.
    """
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    logs = (jnp.sum(jnp.where(nlp.has_xL, jnp.log(sl_xL), 0.0))
            + jnp.sum(jnp.where(nlp.has_xU, jnp.log(sl_xU), 0.0))
            + jnp.sum(jnp.where(nlp.has_dL, jnp.log(sl_sL), 0.0))
            + jnp.sum(jnp.where(nlp.has_dU, jnp.log(sl_sU), 0.0)))
    # damping: kappa_d * mu * sum over single-bounded vars of slack to that bound
    damp = (jnp.sum(jnp.where(nlp.has_xL & ~nlp.has_xU, sl_xL, 0.0))
            + jnp.sum(jnp.where(nlp.has_xU & ~nlp.has_xL, sl_xU, 0.0))
            + jnp.sum(jnp.where(nlp.has_dL & ~nlp.has_dU, sl_sL, 0.0))
            + jnp.sum(jnp.where(nlp.has_dU & ~nlp.has_dL, sl_sU, 0.0)))
    return f_val - mu * logs + kappa_d * mu * damp


def grad_barrier_x(nlp: CanonicalNLP, it: Iterate, grad_f, mu, kappa_d=1e-5):
    """d phi_mu / dx (without constraint terms)."""
    sl_xL, sl_xU, _, _ = slacks(nlp, it)
    g = grad_f
    g = g - jnp.where(nlp.has_xL, mu / sl_xL, 0.0)
    g = g + jnp.where(nlp.has_xU, mu / sl_xU, 0.0)
    g = g - jnp.where(nlp.has_xL & ~nlp.has_xU, kappa_d * mu, 0.0)
    g = g + jnp.where(nlp.has_xU & ~nlp.has_xL, kappa_d * mu, 0.0)
    return g


def grad_barrier_s(nlp: CanonicalNLP, it: Iterate, mu, kappa_d=1e-5):
    _, _, sl_sL, sl_sU = slacks(nlp, it)
    g = -jnp.where(nlp.has_dL, mu / sl_sL, 0.0)
    g = g + jnp.where(nlp.has_dU, mu / sl_sU, 0.0)
    g = g - jnp.where(nlp.has_dL & ~nlp.has_dU, kappa_d * mu, 0.0)
    g = g + jnp.where(nlp.has_dU & ~nlp.has_dL, kappa_d * mu, 0.0)
    return g


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------

def kkt_residuals(nlp: CanonicalNLP, it: Iterate, ev: Evals, mu) -> KKTResiduals:
    """Raw 8-block KKT residuals (IpoptCalculatedQuantities curr_*_resid)."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    grad_lag_x = (ev.grad_f + ev.jc_t(it.y_c) + ev.jd_t(it.y_d)
                  - it.z_L + it.z_U)
    grad_lag_s = -it.y_d - it.v_L + it.v_U
    return KKTResiduals(
        grad_lag_x=grad_lag_x,
        grad_lag_s=grad_lag_s,
        c=ev.c,
        d_minus_s=ev.d - it.s,
        compl_x_L=jnp.where(nlp.has_xL, sl_xL * it.z_L - mu, 0.0),
        compl_x_U=jnp.where(nlp.has_xU, sl_xU * it.z_U - mu, 0.0),
        compl_s_L=jnp.where(nlp.has_dL, sl_sL * it.v_L - mu, 0.0),
        compl_s_U=jnp.where(nlp.has_dU, sl_sU * it.v_U - mu, 0.0),
    )


def _norms(v, ord):
    if v.shape[0] == 0:
        return jnp.zeros((), v.dtype)
    if ord == jnp.inf:
        return jnp.max(jnp.abs(v))
    return jnp.sum(jnp.abs(v))


def optimality_error(nlp: CanonicalNLP, it: Iterate, res: KKTResiduals,
                     s_max=100.0):
    """E_mu per Waechter-Biegler eq. (5) with the s_d/s_c scaling of
    IpIpoptCalculatedQuantities::ComputeOptimalityErrorScaling
    (IpIpoptCalculatedQuantities.cpp:3664-3698).

    Returns (E, dual_inf, primal_inf, compl_inf) — all max-norms; dual and
    compl are divided by s_d / s_c respectively.
    """
    n_mults_c = (jnp.sum(nlp.has_xL) + jnp.sum(nlp.has_xU)
                 + jnp.sum(nlp.has_dL) + jnp.sum(nlp.has_dU))
    sum_z = (jnp.sum(jnp.abs(jnp.where(nlp.has_xL, it.z_L, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_xU, it.z_U, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_dL, it.v_L, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_dU, it.v_U, 0.0))))
    sum_y = jnp.sum(jnp.abs(it.y_c)) + jnp.sum(jnp.abs(it.y_d))
    n_mults_d = n_mults_c + it.y_c.shape[0] + it.y_d.shape[0]

    s_c = jnp.where(n_mults_c > 0,
                    jnp.maximum(s_max, sum_z / jnp.maximum(n_mults_c, 1)) / s_max,
                    1.0)
    s_d = jnp.where(n_mults_d > 0,
                    jnp.maximum(s_max, (sum_z + sum_y) / jnp.maximum(n_mults_d, 1)) / s_max,
                    1.0)

    dual_inf = jnp.maximum(_norms(res.grad_lag_x, jnp.inf),
                           _norms(res.grad_lag_s, jnp.inf))
    primal_inf = jnp.maximum(_norms(res.c, jnp.inf),
                             _norms(res.d_minus_s, jnp.inf))
    compl_inf = jnp.maximum(
        jnp.maximum(_norms(res.compl_x_L, jnp.inf), _norms(res.compl_x_U, jnp.inf)),
        jnp.maximum(_norms(res.compl_s_L, jnp.inf), _norms(res.compl_s_U, jnp.inf)))

    E = jnp.maximum(jnp.maximum(dual_inf / s_d, primal_inf), compl_inf / s_c)
    return E, dual_inf, primal_inf, compl_inf


def constraint_violation_1norm(res: KKTResiduals):
    """theta(x) in the filter: 1-norm of (c, d - s) (curr_constraint_violation)."""
    return _norms(res.c, 1) + _norms(res.d_minus_s, 1)


# ---------------------------------------------------------------------------
# Augmented system
# ---------------------------------------------------------------------------

class SigmaBlocks(NamedTuple):
    sigma_x: jnp.ndarray  # (n,)
    sigma_s: jnp.ndarray  # (mi,)


def sigmas(nlp: CanonicalNLP, it: Iterate) -> SigmaBlocks:
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    sigma_x = (jnp.where(nlp.has_xL, it.z_L / sl_xL, 0.0)
               + jnp.where(nlp.has_xU, it.z_U / sl_xU, 0.0))
    sigma_s = (jnp.where(nlp.has_dL, it.v_L / sl_sL, 0.0)
               + jnp.where(nlp.has_dU, it.v_U / sl_sU, 0.0))
    return SigmaBlocks(sigma_x, sigma_s)


def assemble_aug_system(W, J_c, J_d, sigma: SigmaBlocks,
                        delta_x, delta_s, delta_c, delta_d) -> jnp.ndarray:
    """Dense augmented KKT matrix, ordering [x, s, y_c, y_d]."""
    n = W.shape[0]
    mi = sigma.sigma_s.shape[0]
    me = J_c.shape[0]
    dtype = W.dtype
    N = n + mi + me + mi

    K = jnp.zeros((N, N), dtype)
    # (x,x)
    K = K.at[:n, :n].set(W + jnp.diag(sigma.sigma_x + delta_x))
    # (s,s)
    sl = slice(n, n + mi)
    K = K.at[sl, sl].set(jnp.diag(sigma.sigma_s + delta_s))
    # (y_c, x)
    cl = slice(n + mi, n + mi + me)
    K = K.at[cl, :n].set(J_c)
    K = K.at[:n, cl].set(J_c.T)
    K = K.at[cl, cl].set(-delta_c * jnp.eye(me, dtype=dtype))
    # (y_d, x) and (y_d, s)
    dl = slice(n + mi + me, N)
    K = K.at[dl, :n].set(J_d)
    K = K.at[:n, dl].set(J_d.T)
    eye_mi = jnp.eye(mi, dtype=dtype)
    K = K.at[dl, sl].set(-eye_mi)
    K = K.at[sl, dl].set(-eye_mi)
    K = K.at[dl, dl].set(-delta_d * eye_mi)
    return K


def condensed_rhs_parts(nlp: CanonicalNLP, it: Iterate, ev: Evals, mu,
                        kappa_d=1e-5):
    """The four (negated) RHS blocks of the augmented system:
    (-r_x, -r_s, -c, -(d - s)) where r_x/r_s are the barrier-gradient forms
    after eliminating the bound multipliers (PDFullSpaceSolver's reduction)."""
    r_x = (grad_barrier_x(nlp, it, ev.grad_f, mu, kappa_d)
           + ev.jc_t(it.y_c) + ev.jd_t(it.y_d))
    r_s = grad_barrier_s(nlp, it, mu, kappa_d) - it.y_d
    return -r_x, -r_s, -ev.c, -(ev.d - it.s)


def condensed_rhs(nlp: CanonicalNLP, it: Iterate, ev: Evals, mu,
                  kappa_d=1e-5) -> jnp.ndarray:
    """Flat dense-ordering RHS [x, s, y_c, y_d] of the augmented system."""
    return jnp.concatenate(condensed_rhs_parts(nlp, it, ev, mu, kappa_d))


def split_aug_solution(sol, n, mi, me):
    dx = sol[:n]
    ds = sol[n:n + mi]
    dy_c = sol[n + mi:n + mi + me]
    dy_d = sol[n + mi + me:]
    return dx, ds, dy_c, dy_d


def recover_bound_mult_steps(nlp: CanonicalNLP, it: Iterate, dx, ds, mu):
    """Back-substitute the eliminated complementarity rows:
        dz_L = mu/sl_xL - z_L - z_L/sl_xL * dx      (lower x bounds)
        dz_U = mu/sl_xU - z_U + z_U/sl_xU * dx      (upper x bounds)
    and likewise for v_L, v_U with ds."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    dz_L = jnp.where(nlp.has_xL, mu / sl_xL - it.z_L - it.z_L / sl_xL * dx, 0.0)
    dz_U = jnp.where(nlp.has_xU, mu / sl_xU - it.z_U + it.z_U / sl_xU * dx, 0.0)
    dv_L = jnp.where(nlp.has_dL, mu / sl_sL - it.v_L - it.v_L / sl_sL * ds, 0.0)
    dv_U = jnp.where(nlp.has_dU, mu / sl_sU - it.v_U + it.v_U / sl_sU * ds, 0.0)
    return dz_L, dz_U, dv_L, dv_U


def fraction_to_boundary(nlp: CanonicalNLP, it: Iterate, step: Iterate, tau):
    """alpha_max^pr for (x, s) and alpha_max^dual for (z, v): largest
    alpha in (0, 1] with var + alpha*d >= (1-tau)*slack preserved
    (IpIpoptCalculatedQuantities primal_frac_to_the_bound)."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    one = jnp.ones((), it.x.dtype)

    def limit(slack, d, active):
        # slack + alpha*d >= (1-tau)*slack  =>  alpha <= -tau*slack/d for d<0
        neg = active & (d < 0)
        safe_d = jnp.where(neg, d, -one)
        a = jnp.where(neg, -tau * slack / safe_d, one)
        return jnp.min(a, initial=1.0)

    a_x = jnp.minimum(limit(sl_xL, step.x, nlp.has_xL),
                      limit(sl_xU, -step.x, nlp.has_xU))
    a_s = jnp.minimum(limit(sl_sL, step.s, nlp.has_dL),
                      limit(sl_sU, -step.s, nlp.has_dU))
    alpha_primal = jnp.minimum(jnp.minimum(a_x, a_s), 1.0)

    a_z = jnp.minimum(limit(it.z_L, step.z_L, nlp.has_xL),
                      limit(it.z_U, step.z_U, nlp.has_xU))
    a_v = jnp.minimum(limit(it.v_L, step.v_L, nlp.has_dL),
                      limit(it.v_U, step.v_U, nlp.has_dU))
    alpha_dual = jnp.minimum(jnp.minimum(a_z, a_v), 1.0)
    return alpha_primal, alpha_dual
