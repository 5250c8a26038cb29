"""intermediate_callback parity (TNLP::intermediate_callback, IpTNLP.hpp:665)
including get_curr_iterate/get_curr_violations access (test/getcurr.cpp
regression equivalent) and premature stop."""
import numpy as np

from ipopt_tpu import solve, SolverReturn

import problems


def test_callback_invoked_each_iteration():
    seen = []

    def cb(**kw):
        seen.append(kw["iter_count"])
        return True

    res = solve(problems.hs071(), print_level=0, intermediate_callback=cb)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    assert seen == list(range(len(seen))) and len(seen) >= 5


def test_callback_premature_stop():
    def cb(**kw):
        return kw["iter_count"] < 3

    res = solve(problems.hs071(), print_level=0, intermediate_callback=cb)
    assert int(res.status) == int(SolverReturn.USER_REQUESTED_STOP)
    assert int(res.iter_count) <= 5


def test_callback_curr_iterate_and_violations():
    captured = []

    def cb(**kw):
        captured.append((kw["curr_iterate"], kw["curr_violations"]))
        return True

    res = solve(problems.hs071(), print_level=0, intermediate_callback=cb,
                callback_curr_iterate=True)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    it, viol = captured[-1]
    assert it["x"].shape == (4,)
    assert viol["grad_lag_x"].shape == (4,)
    # Near convergence: x close to the optimum, violations tiny.
    np.testing.assert_allclose(
        it["x"], [1.0, 4.74299963, 3.82114998, 1.37940829], atol=1e-3)
    assert np.max(np.abs(viol["c_violation"])) < 1e-3
    assert np.max(np.abs(viol["grad_lag_x"])) < 1e-2
