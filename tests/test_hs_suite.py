import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

import problems


@pytest.mark.parametrize("make", problems.ALL_SMALL, ids=lambda m: m.__name__)
def test_small_problem_converges(make):
    nlp = make()
    res = solve(nlp, print_level=0)
    status = SolverReturn(int(res.status))
    assert status in (SolverReturn.SUCCESS,
                      SolverReturn.STOP_AT_ACCEPTABLE_POINT), (status, int(res.iter_count))
    f_star = problems.KNOWN_OPTIMA[nlp.name]
    np.testing.assert_allclose(float(res.obj), f_star, rtol=1e-6, atol=1e-6)
