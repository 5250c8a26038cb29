"""Matrix-free (inexact) step computation — the Inexact-algorithm capability
(SURVEY.md §2.5, src/Algorithm/Inexact/, Curtis-Schenk-Waechter) realized
TPU-natively.

For PDE-scale problems where even a structured factorization is infeasible,
the augmented system

    [ W + Sig_x + dx I    0        Jc^T   Jd^T ] [dx ]   [ r1 ]
    [ 0               Sig_s + dx    0     -I   ] [ds ] = [ r2 ]
    [ Jc                  0       -dc I    0   ] [dyc]   [ r3 ]
    [ Jd                 -I         0    -dc I ] [dyd]   [ r4 ]

is solved by MINRES with pure operator products: W@v is a Hessian-vector
product (forward-over-reverse jvp of the Lagrangian gradient), J@v / J^T@u
are jvp/vjp of the constraint functions — no matrix is ever materialized.
Instead of inertia (unavailable without a factorization), Ipopt's
*inertia-free* negative-curvature test is used
(``neg_curv_test_tol``, IpPDFullSpaceSolver.cpp:592-637):

    d_xs^T (W + Sig + dx I) d_xs  >=  neg_curv_test_tol * ||d_xs||^2

with the standard PDPerturbationHandler delta escalation on failure.
Enabled with ``linear_solver="minres"``.
"""
from __future__ import annotations

from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import Evals, sigmas, condensed_rhs_parts, recover_bound_mult_steps
from .step import StepResult


class _KKTOperator(NamedTuple):
    matvec: Callable          # flat (N,) -> (N,)
    n: int
    mi: int
    me: int


def _make_operator(nlp: CanonicalNLP, it: Iterate, delta_x, delta_c):
    """Build the augmented-system matvec from AD operator products."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    sig = sigmas(nlp, it)
    x = it.x

    def grad_lag(xx):
        g = nlp.eval_grad_f(xx)
        if me:
            _, vjp_c = jax.vjp(nlp.eval_c, xx)
            g = g + vjp_c(it.y_c)[0]
        if mi:
            _, vjp_d = jax.vjp(nlp.eval_d, xx)
            g = g + vjp_d(it.y_d)[0]
        return g

    def Wv(v):
        return jax.jvp(grad_lag, (x,), (v,))[1]

    def Jc(v):
        return jax.jvp(nlp.eval_c, (x,), (v,))[1] if me else jnp.zeros((0,), x.dtype)

    def JcT(u):
        if not me:
            return jnp.zeros((n,), x.dtype)
        _, vjp = jax.vjp(nlp.eval_c, x)
        return vjp(u)[0]

    def Jd(v):
        return jax.jvp(nlp.eval_d, (x,), (v,))[1] if mi else jnp.zeros((0,), x.dtype)

    def JdT(u):
        if not mi:
            return jnp.zeros((n,), x.dtype)
        _, vjp = jax.vjp(nlp.eval_d, x)
        return vjp(u)[0]

    def matvec(w):
        dx = w[:n]
        ds = w[n:n + mi]
        dyc = w[n + mi:n + mi + me]
        dyd = w[n + mi + me:]
        o_x = Wv(dx) + (sig.sigma_x + delta_x) * dx + JcT(dyc) + JdT(dyd)
        o_s = (sig.sigma_s + delta_x) * ds - dyd
        o_c = Jc(dx) - delta_c * dyc
        o_d = Jd(dx) - ds - delta_c * dyd
        return jnp.concatenate([o_x, o_s, o_c, o_d])

    return _KKTOperator(matvec=matvec, n=n, mi=mi, me=me), sig


def minres(matvec, b, maxiter: int, rtol):
    """Textbook MINRES (Paige-Saunders) as a bounded lax.while_loop.

    Solves symmetric (possibly indefinite) A x = b.  Returns (x, relres).
    """
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    bnorm = jnp.maximum(jnp.linalg.norm(b), eps)

    class C(NamedTuple):
        k: jnp.ndarray
        x: jnp.ndarray
        r1: jnp.ndarray       # v_{k-1} (unnormalized lanczos)
        r2: jnp.ndarray       # v_k
        w0: jnp.ndarray
        w1: jnp.ndarray
        beta: jnp.ndarray
        beta_prev: jnp.ndarray
        dbar: jnp.ndarray
        epsln: jnp.ndarray
        phibar: jnp.ndarray
        cs: jnp.ndarray
        sn: jnp.ndarray

    beta0 = jnp.linalg.norm(b)
    init = C(k=jnp.zeros((), jnp.int32), x=jnp.zeros_like(b),
             r1=jnp.zeros_like(b), r2=b,
             w0=jnp.zeros_like(b), w1=jnp.zeros_like(b),
             beta=beta0, beta_prev=jnp.ones((), dtype),
             dbar=jnp.zeros((), dtype), epsln=jnp.zeros((), dtype),
             phibar=beta0, cs=-jnp.ones((), dtype), sn=jnp.zeros((), dtype))

    def cond(c: C):
        return jnp.logical_and(c.k < maxiter,
                               c.phibar > rtol * bnorm)

    def body(c: C):
        v = c.r2 / jnp.maximum(c.beta, eps)
        y = matvec(v)
        y = y - (c.beta / jnp.maximum(c.beta_prev, eps)) * c.r1
        alpha = jnp.dot(v, y)
        y = y - (alpha / jnp.maximum(c.beta, eps)) * c.r2
        beta_next = jnp.linalg.norm(y)

        # previous rotation
        oldeps = c.epsln
        delta = c.cs * c.dbar + c.sn * alpha
        gbar = c.sn * c.dbar - c.cs * alpha
        epsln = c.sn * beta_next
        dbar = -c.cs * beta_next
        # current rotation
        gamma = jnp.sqrt(gbar * gbar + beta_next * beta_next)
        gamma = jnp.maximum(gamma, eps)
        cs = gbar / gamma
        sn = beta_next / gamma
        phi = cs * c.phibar
        phibar = sn * c.phibar

        w = (v - oldeps * c.w0 - delta * c.w1) / gamma
        x = c.x + phi * w
        return C(k=c.k + 1, x=x, r1=c.r2, r2=y, w0=c.w1, w1=w,
                 beta=beta_next, beta_prev=c.beta, dbar=dbar, epsln=epsln,
                 phibar=phibar, cs=cs, sn=sn)

    out = lax.while_loop(cond, body, init)
    return out.x, out.phibar / bnorm


def mf_search_direction(nlp: CanonicalNLP, opts: Options, it: Iterate,
                        ev: Evals, mu, delta_w_last) -> StepResult:
    """Matrix-free step with the inertia-free curvature test + delta loop."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = it.x.dtype
    parts = condensed_rhs_parts(nlp, it, ev, mu, opts.kappa_d)
    rhs = jnp.concatenate(parts)
    delta_cd = jnp.maximum(
        opts.jacobian_regularization_value
        * mu ** opts.jacobian_regularization_exponent,
        opts.jacobian_regularization_value)
    curv_tol = jnp.maximum(opts.neg_curv_test_tol, 1e-11)
    maxiter = min(4 * (n + 2 * mi + me), 400)

    def attempt(delta_x):
        op, sig = _make_operator(nlp, it, delta_x, delta_cd)
        sol, relres = minres(op.matvec, rhs, maxiter, opts.residual_ratio_singular)
        dx = sol[:n]
        ds = sol[n:n + mi]
        # inertia-free test: curvature of the (regularized) Hessian block
        def grad_lag(xx):
            g = nlp.eval_grad_f(xx)
            if me:
                g = g + jax.vjp(nlp.eval_c, xx)[1](it.y_c)[0]
            if mi:
                g = g + jax.vjp(nlp.eval_d, xx)[1](it.y_d)[0]
            return g
        Wdx = jax.jvp(grad_lag, (it.x,), (dx,))[1]
        curv = (jnp.dot(dx, Wdx) + jnp.dot((sig.sigma_x + delta_x) * dx, dx)
                + jnp.dot((sig.sigma_s + delta_x) * ds, ds))
        nrm2 = jnp.dot(dx, dx) + jnp.dot(ds, ds)
        ok = jnp.logical_and(curv >= curv_tol * nrm2,
                             relres <= opts.residual_ratio_singular)
        return sol, ok, relres

    zero = jnp.zeros((), dtype)
    sol0, ok0, rr0 = attempt(zero)

    def cond(carry):
        trial, dxv, sol, ok, rr, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body(carry):
        trial, dxv, sol, ok, rr, gave_up = carry
        first_try = (dxv == 0)
        start_val = jnp.where(delta_w_last == 0,
                              opts.first_hessian_perturbation,
                              jnp.maximum(opts.min_hessian_perturbation,
                                          delta_w_last * opts.perturb_dec_fact))
        inc_fact = jnp.where(delta_w_last == 0,
                             opts.perturb_inc_fact_first, opts.perturb_inc_fact)
        new_dx = jnp.where(first_try, start_val, dxv * inc_fact)
        gave_up = new_dx > opts.max_hessian_perturbation
        sol, ok, rr = attempt(new_dx)
        return trial + 1, new_dx, sol, ok, rr, gave_up

    trials, delta_x, sol, ok, rr, gave_up = lax.while_loop(
        cond, body, (jnp.ones((), jnp.int32), zero, sol0, ok0, rr0,
                     jnp.zeros((), bool)))

    failed = jnp.logical_not(ok)
    dx = sol[:n]
    ds = sol[n:n + mi]
    dyc = sol[n + mi:n + mi + me]
    dyd = sol[n + mi + me:]
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    step = Iterate(x=dx, s=ds, y_c=dyc, y_d=dyd,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    step = jax.tree.map(lambda v: jnp.where(failed, jnp.zeros_like(v), v), step)
    new_last = jnp.where(delta_x > 0, delta_x, delta_w_last)
    return StepResult(step=step, delta_x=delta_x, delta_c=delta_cd,
                      delta_w_last=new_last, failed=failed,
                      num_trials=trials, residual_ratio=rr,
                      fac=None, K=None)
