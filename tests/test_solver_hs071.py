import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

from problems import hs071, HS071_F_STAR, HS071_X_STAR


def test_hs071_converges():
    res = solve(hs071(), print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS), SolverReturn(int(res.status))
    np.testing.assert_allclose(float(res.obj), HS071_F_STAR, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), HS071_X_STAR, atol=1e-6)
    # Ipopt needs ~8-10 iterations on hs071 at tol 1e-8.
    assert int(res.iter_count) <= 20


def test_hs071_multipliers():
    res = solve(hs071(), print_level=0)
    # lambda* approx (-0.552, 0.161) per published solutions (g1 >= 25 active).
    y = np.asarray(res.y)
    assert abs(y[0] - (-0.552)) < 5e-2
    assert abs(y[1] - 0.161) < 5e-2
