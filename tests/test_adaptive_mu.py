import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

import problems


@pytest.mark.parametrize("oracle", ["loqo", "probing", "quality-function"])
def test_hs071_adaptive(oracle):
    res = solve(problems.hs071(), print_level=0, mu_strategy="adaptive",
                mu_oracle=oracle)
    assert int(res.status) == int(SolverReturn.SUCCESS), \
        (oracle, SolverReturn(int(res.status)), int(res.iter_count))
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-7)


def test_hs071_mehrotra():
    res = solve(problems.hs071(), print_level=0, mehrotra_algorithm=True,
                accept_every_trial_step=True)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-7)


def test_hs035_adaptive_fast():
    # Convex QP: adaptive mu should converge quickly.
    res = solve(problems.hs035(), print_level=0, mu_strategy="adaptive")
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), 1.0 / 9.0, rtol=1e-6)


@pytest.mark.parametrize("glob", ["obj-constr-filter", "kkt-error",
                                  "never-monotone-mode"])
def test_hs071_adaptive_globalizations(glob):
    res = solve(problems.hs071(), print_level=0, mu_strategy="adaptive",
                adaptive_mu_globalization=glob)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT)), \
        (glob, SolverReturn(int(res.status)))
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-6)


def test_hs071_penalty_linesearch():
    res = solve(problems.hs071(), print_level=0, line_search_method="penalty")
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-7)
