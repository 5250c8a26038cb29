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


def test_quality_function_variants_converge():
    """quality_function_norm_type / centrality / balancing_term variants
    (IpQualityFunctionMuOracle.cpp:55-120) all drive hs071 to the optimum."""
    import itertools
    from ipopt_tpu.modellib import hs071, HS071_F_STAR
    for norm, cen, bal in [("1-norm", "none", "none"),
                           ("max-norm", "log", "none"),
                           ("2-norm", "reciprocal", "cubic"),
                           ("2-norm-squared", "cubed-reciprocal", "none")]:
        r = solve(hs071(), print_level=0, tol=1e-8, mu_strategy="adaptive",
                  mu_oracle="quality-function",
                  quality_function_norm_type=norm,
                  quality_function_centrality=cen,
                  quality_function_balancing_term=bal, max_iter=100)
        assert int(r.status) in (0, 5), (norm, cen, bal, int(r.status))
        assert abs(float(r.obj) - HS071_F_STAR) < 1e-5, (norm, cen, bal)
