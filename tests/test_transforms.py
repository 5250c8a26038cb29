import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, SolverReturn
from ipopt_tpu.interfaces.transforms import remove_bounds, reduce_constraints

import problems


def test_remove_bounds_same_solution():
    nlp = problems.hs071()
    res_a = solve(nlp, print_level=0)
    res_b = solve(remove_bounds(nlp), print_level=0)
    assert int(res_b.status) in (int(SolverReturn.SUCCESS),
                                 int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(float(res_b.obj), float(res_a.obj), rtol=1e-6)


def test_reduce_constraints():
    nlp = problems.hs071()
    # dropping the (active) product constraint lowers the optimum
    red = reduce_constraints(nlp, [0])
    res = solve(red, print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    assert float(res.obj) < problems.HS071_F_STAR
