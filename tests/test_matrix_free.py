"""Matrix-free (MINRES) KKT mode tests — the inexact-algorithm capability."""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, SolverReturn
from ipopt_tpu.algorithm.matrix_free import minres

import problems


def test_minres_solves_indefinite():
    rng = np.random.default_rng(0)
    n, m = 12, 4
    H = rng.standard_normal((n, n))
    H = H @ H.T + np.eye(n)
    J = rng.standard_normal((m, n))
    K = np.block([[H, J.T], [J, -1e-8 * np.eye(m)]])
    Kj = jnp.asarray(K)
    b = jnp.asarray(rng.standard_normal(n + m))
    x, relres = minres(lambda v: Kj @ v, b, maxiter=200, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Kj @ x), np.asarray(b),
                               rtol=1e-8, atol=1e-8)


def test_hs071_minres():
    res = solve(problems.hs071(), print_level=0, linear_solver="minres",
                tol=1e-7)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT),
                               int(SolverReturn.STOP_AT_TINY_STEP)), \
        SolverReturn(int(res.status))
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-5)


def test_hs035_minres():
    res = solve(problems.hs035(), print_level=0, linear_solver="minres",
                tol=1e-7)
    np.testing.assert_allclose(float(res.obj), 1.0 / 9.0, rtol=1e-4)
