import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import NLP, solve, SolverReturn

import problems


def test_infeasible_problem_detected():
    # Inconsistent equalities: x = 1 and x = -1.
    nlp = NLP(
        f=lambda x: x[0] ** 2,
        g=lambda x: jnp.array([x[0] + 1.0, x[0] - 1.0]),
        g_L=jnp.zeros(2), g_U=jnp.zeros(2),
        x0=jnp.array([0.5]))
    res = solve(nlp, print_level=0)
    assert int(res.status) == int(SolverReturn.LOCAL_INFEASIBILITY), \
        SolverReturn(int(res.status))


def test_infeasible_bounds_vs_constraint():
    # x in [0, 1] but x >= 2 required through g.
    nlp = NLP(
        f=lambda x: x[0],
        g=lambda x: jnp.array([x[0]]),
        g_L=jnp.array([2.0]), g_U=jnp.array([jnp.inf]),
        x_L=jnp.array([0.0]), x_U=jnp.array([1.0]),
        x0=jnp.array([0.5]))
    res = solve(nlp, print_level=0)
    assert int(res.status) == int(SolverReturn.LOCAL_INFEASIBILITY), \
        SolverReturn(int(res.status))


def test_hs071_still_fast_with_resto_compiled():
    res = solve(problems.hs071(), print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    assert int(res.restoration_count if hasattr(res, "restoration_count") else 0) == 0
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-8)
