"""Derivative checker: FD-vs-AD verification of user callables.

Reference parity: ``TNLPAdapter::CheckDerivatives`` (``IpTNLPAdapter.cpp:2983``,
options ``derivative_test = first-order | second-order | only-second-order``,
``derivative_test_perturbation``, ``derivative_test_tol``).  In the reference
this guards hand-coded triplet derivatives; here autodiff makes gradients exact
*by construction*, so the checker's role shifts to catching non-smooth or
branching user functions (where AD and FD legitimately disagree) and custom
JVP/VJP overrides.

Relative error (IpTNLPAdapter.cpp approved formula):
    err = |ad - fd| / max(1, |fd|)
"""
from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .options import Options
from .problem import CanonicalNLP


class DerivCheckResult(NamedTuple):
    ok: bool
    max_rel_err_grad: float
    max_rel_err_jac: float
    max_rel_err_hess: float
    failures: List[str]


def check_derivatives(nlp: CanonicalNLP, opts: Options, x=None) -> DerivCheckResult:
    x = nlp.x0 if x is None else jnp.asarray(x, nlp.x0.dtype)
    # point_perturbation_radius (IpTNLPAdapter.cpp:3030-3037): random test
    # point uniform in [max(x_l, x0-r), min(x_u, x0+r)] (0 = exactly at x0).
    if opts.point_perturbation_radius > 0:
        rng = np.random.RandomState(42)
        r = opts.point_perturbation_radius
        xr = np.asarray(x)
        lo = np.where(np.asarray(nlp.has_xL),
                      np.maximum(np.asarray(nlp.x_L), xr - r), xr - r)
        hi = np.where(np.asarray(nlp.has_xU),
                      np.minimum(np.asarray(nlp.x_U), xr + r), xr + r)
        x = jnp.asarray(lo + rng.uniform(0.0, 1.0, nlp.n) * (hi - lo),
                        nlp.x0.dtype)
    h = opts.derivative_test_perturbation
    tol = opts.derivative_test_tol
    n = nlp.n
    failures: List[str] = []
    # derivative_test_first_index: -2 = all variables; otherwise only check
    # derivative entries with variable index >= the given value.
    first_idx = max(opts.derivative_test_first_index, 0)

    do_first = opts.derivative_test in ("first-order", "second-order")
    do_second = opts.derivative_test in ("second-order", "only-second-order")

    def fd_grad(fn, x0):
        g = np.zeros(n)
        f0 = np.asarray(fn(x0))
        for i in range(n):
            xp = x0.at[i].add(h)
            g[i] = (np.asarray(fn(xp)) - f0) / h
        return g

    max_g = max_j = max_h = 0.0

    if do_first:
        g_ad = np.asarray(nlp.eval_grad_f(x))
        g_fd = fd_grad(nlp.eval_f, x)
        rel = np.abs(g_ad - g_fd) / np.maximum(1.0, np.abs(g_fd))
        rel[:first_idx] = 0.0
        max_g = float(rel.max()) if n else 0.0
        for i in np.nonzero(rel > tol)[0]:
            failures.append(
                f"grad_f[{i}]: ad={g_ad[i]:.8e} fd={g_fd[i]:.8e} rel={rel[i]:.2e}")

        if nlp.struct.me + nlp.struct.mi > 0:
            def gall(xx):
                return jnp.concatenate([nlp.eval_c(xx), nlp.eval_d(xx)])
            J_ad = np.asarray(jax.jacfwd(gall)(x))
            g0 = np.asarray(gall(x))
            J_fd = np.zeros_like(J_ad)
            for i in range(n):
                xp = x.at[i].add(h)
                J_fd[:, i] = (np.asarray(gall(xp)) - g0) / h
            relJ = np.abs(J_ad - J_fd) / np.maximum(1.0, np.abs(J_fd))
            relJ[:, :first_idx] = 0.0
            max_j = float(relJ.max()) if relJ.size else 0.0
            thresh = -1.0 if opts.derivative_test_print_all else tol
            for r, c in zip(*np.nonzero(relJ > thresh)):
                failures.append(
                    f"jac_g[{r},{c}]: ad={J_ad[r, c]:.8e} fd={J_fd[r, c]:.8e} "
                    f"rel={relJ[r, c]:.2e}")

    if do_second:
        me, mi = nlp.struct.me, nlp.struct.mi
        y_c = jnp.ones((me,), x.dtype)
        y_d = jnp.ones((mi,), x.dtype)

        def grad_lag(xx):
            gl = nlp.eval_grad_f(xx)
            if me:
                gl = gl + nlp.eval_jac_c(xx).T @ y_c
            if mi:
                gl = gl + nlp.eval_jac_d(xx).T @ y_d
            return gl

        H_ad = np.asarray(nlp.eval_lag_hess(x, y_c, y_d))
        gl0 = np.asarray(grad_lag(x))
        H_fd = np.zeros_like(H_ad)
        for i in range(n):
            xp = x.at[i].add(h)
            H_fd[:, i] = (np.asarray(grad_lag(xp)) - gl0) / h
        relH = np.abs(H_ad - H_fd) / np.maximum(1.0, np.abs(H_fd))
        relH[:first_idx, :] = 0.0
        relH[:, :first_idx] = 0.0
        max_h = float(relH.max()) if relH.size else 0.0
        for r, c in zip(*np.nonzero(relH > tol)):
            failures.append(
                f"hess_lag[{r},{c}]: ad={H_ad[r, c]:.8e} fd={H_fd[r, c]:.8e} "
                f"rel={relH[r, c]:.2e}")

    ok = max(max_g, max_j, max_h) <= tol
    return DerivCheckResult(ok=ok, max_rel_err_grad=max_g,
                            max_rel_err_jac=max_j, max_rel_err_hess=max_h,
                            failures=failures)
