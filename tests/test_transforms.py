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


def test_dependency_detector_removes_duplicate_equalities():
    # min x^2+y^2 s.t. x+y=1 (twice) and x-y=0: the duplicate row is detected
    # and removed; the solve succeeds with the correct optimum.
    import jax.numpy as jnp
    from ipopt_tpu import NLP, solve, SolverReturn

    nlp = NLP(
        f=lambda x: x[0] ** 2 + x[1] ** 2,
        g=lambda x: jnp.array([x[0] + x[1], x[0] + x[1], x[0] - x[1]]),
        g_L=jnp.array([1.0, 1.0, 0.0]), g_U=jnp.array([1.0, 1.0, 0.0]),
        x0=jnp.array([0.0, 0.0]))
    from ipopt_tpu.interfaces.dependency import detect_dependent_constraints
    from ipopt_tpu.options import Options
    deps = detect_dependent_constraints(nlp, Options(dependency_detector="qr"))
    assert deps == [1]
    res = solve(nlp, print_level=0, dependency_detector="qr")
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-7)

    # with_rhs: an inconsistent duplicate (x+y=2) must be KEPT.
    nlp_bad = NLP(
        f=lambda x: x[0] ** 2 + x[1] ** 2,
        g=lambda x: jnp.array([x[0] + x[1], x[0] + x[1]]),
        g_L=jnp.array([1.0, 2.0]), g_U=jnp.array([1.0, 2.0]),
        x0=jnp.array([0.0, 0.0]))
    opts = Options(dependency_detector="qr", dependency_detection_with_rhs=True)
    assert detect_dependent_constraints(nlp_bad, opts) == []
    opts2 = Options(dependency_detector="qr")
    assert detect_dependent_constraints(nlp_bad, opts2) == [1]
