import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

import problems


def test_hs038_lbfgs():
    # Bounds-only Colville problem: classic L-BFGS territory.
    res = solve(problems.hs038(), print_level=0,
                hessian_approximation="limited-memory", max_iter=500)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(float(res.obj), 0.0, atol=1e-6)


def test_hs071_lbfgs():
    res = solve(problems.hs071(), print_level=0,
                hessian_approximation="limited-memory", max_iter=300)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT)), \
        (SolverReturn(int(res.status)), int(res.iter_count))
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-6)


def test_hs035_lbfgs():
    res = solve(problems.hs035(), print_level=0,
                hessian_approximation="limited-memory", max_iter=300)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(float(res.obj), 1.0 / 9.0, rtol=1e-5)
