"""Inexact algorithm (normal/tangential decomposition, SURVEY.md §2.5,
src/Algorithm/Inexact/ Curtis-Schenk-Waechter).

End-to-end solves through inexact_algorithm=True: dogleg normal step,
MINRES tangential/total step with the tangential component condition,
penalty line search with the flexible [nu_low, nu] interval, and the
bounds-remover requirement (InexactAlgBuilder + NLPBoundsRemover).
"""
import numpy as np
import pytest

from ipopt_tpu import NLP, solve, SolverReturn

import problems

OK = (int(SolverReturn.SUCCESS), int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))


def test_hs071_inexact():
    res = solve(problems.hs071(), print_level=0, inexact_algorithm=True,
                max_iter=300)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR,
                               rtol=1e-7)


def test_hs006_inexact_infeasible_start():
    res = solve(problems.hs006(), print_level=0, inexact_algorithm=True,
                max_iter=300)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), 0.0, atol=1e-7)


def test_hs038_inexact_bounds_only():
    # Bounds-only problem: exercises the NLPBoundsRemover path (all barrier
    # terms move to the slack-scaled s-block).
    res = solve(problems.hs038(), print_level=0, inexact_algorithm=True,
                max_iter=500)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), 0.0, atol=1e-6)


def test_inexact_midsize_pde_like():
    # 1D discretized control problem: min sum (x - target)^2 + reg ||u||^2
    # s.t. tridiagonal state equation A x = u (n state + n control vars,
    # n equality rows) — the PDE-scale shape the inexact mode targets.
    import jax.numpy as jnp

    n = 60
    h = 1.0 / (n + 1)
    t = jnp.linspace(h, 1.0 - h, n)
    target = jnp.sin(jnp.pi * t)

    def f(z):
        x, u = z[:n], z[n:]
        return 0.5 * jnp.sum((x - target) ** 2) + 0.5e-3 * jnp.sum(u ** 2)

    def g(z):
        x, u = z[:n], z[n:]
        lap = (2.0 * x - jnp.concatenate([x[1:], jnp.zeros(1)])
               - jnp.concatenate([jnp.zeros(1), x[:-1]])) / h ** 2
        return lap - u

    nlp = NLP(f=f, g=g, g_L=np.zeros(n), g_U=np.zeros(n),
              x0=np.zeros(2 * n))
    res = solve(nlp, print_level=0, inexact_algorithm=True, max_iter=300,
                tol=1e-7)
    assert int(res.status) in OK, SolverReturn(int(res.status))
    # The optimal state tracks the target under light regularization.
    x_opt = np.asarray(res.x[:n])
    assert np.max(np.abs(x_opt - np.asarray(target))) < 0.15
