"""Edge-case regression parity with the reference's test drivers:

- test/emptynlp.cpp:28,368,680 — NLPs with zero variables / zero constraints
  and a ReOptimize cycle;
- test/getcurr.cpp:41,630 — get_curr_iterate/get_curr_violations from inside
  intermediate_callback under every fixed-variable treatment.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu.problem import NLP
from ipopt_tpu.options import Options
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.types import SolverReturn
from ipopt_tpu.modellib import hs071, HS071_F_STAR


def test_zero_constraints():
    """m = 0: pure bound-constrained problem (emptynlp NoConstraints)."""
    nlp = NLP(f=lambda x: jnp.sum((x - 2.0) ** 2),
              x0=jnp.zeros(3), x_L=-1.0, x_U=1.0)
    res = solve(nlp, print_level=0, tol=1e-8)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(3), atol=1e-6)


def test_zero_free_variables_all_fixed():
    """All variables fixed (x_L == x_U): with make_parameter the free space
    is empty; solve must return immediately with the fixed values
    (emptynlp zero-variables analog)."""
    nlp = NLP(f=lambda x: jnp.sum(x ** 2),
              x0=jnp.array([1.5, -2.0]),
              x_L=jnp.array([1.5, -2.0]), x_U=jnp.array([1.5, -2.0]))
    res = solve(nlp, print_level=0, fixed_variable_treatment="make_parameter")
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(np.asarray(res.x), [1.5, -2.0], atol=1e-10)
    np.testing.assert_allclose(float(res.obj), 1.5 ** 2 + 4.0, rtol=1e-12)


def test_zero_variables_zero_constraints():
    """n = 0, m = 0 — the empty NLP must not crash (emptynlp.cpp:28)."""
    nlp = NLP(f=lambda x: jnp.sum(x) * 0.0, x0=jnp.zeros(0))
    res = solve(nlp, print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    assert np.asarray(res.x).shape == (0,)


def test_zero_variables_mc19_scaling():
    """linear_system_scaling=mc19 must survive empty/zero-variable systems
    (r3 regression: the Ruiz scaler reduced over a zero-size axis)."""
    nlp = NLP(f=lambda x: jnp.sum(x) * 0.0, x0=jnp.zeros(0))
    res = solve(nlp, print_level=0, linear_system_scaling="mc19")
    assert int(res.status) == int(SolverReturn.SUCCESS)

    all_fixed = NLP(f=lambda x: jnp.sum(x ** 2), x0=jnp.array([1.5]),
                    x_L=jnp.array([1.5]), x_U=jnp.array([1.5]))
    res2 = solve(all_fixed, print_level=0, linear_system_scaling="mc19",
                 fixed_variable_treatment="make_parameter")
    assert int(res2.status) in (int(SolverReturn.SUCCESS),
                                int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))


def test_reoptimize_cycle():
    """ReOptimizeTNLP parity (emptynlp.cpp:680, IpIpoptApplication.cpp:476):
    repeated solves of the same structure reuse the compiled program; warm
    starting from the previous iterate converges in a few iterations."""
    base = solve(hs071(), print_level=0, tol=1e-8)
    assert int(base.status) == 0

    for shift in (0.02, 0.04, 0.06):
        nlp = hs071(rhs_shift=shift)
        cold = solve(nlp, print_level=0, tol=1e-8)
        warm = solve(nlp, print_level=0, tol=1e-8, it0=base.iterate,
                     warm_start_init_point=True, mu_init=1e-5,
                     warm_start_bound_push=1e-8, warm_start_bound_frac=1e-8,
                     warm_start_mult_bound_push=1e-8)
        assert int(cold.status) == 0 and int(warm.status) == 0
        assert int(warm.iter_count) <= int(cold.iter_count)
        np.testing.assert_allclose(float(warm.obj), float(cold.obj),
                                   rtol=1e-6)


@pytest.mark.parametrize("treatment", ["make_parameter",
                                       "make_parameter_nodual",
                                       "make_constraint", "relax_bounds"])
def test_getcurr_all_fixed_variable_modes(treatment):
    """getcurr.cpp parity: the intermediate callback's curr_iterate must be
    reported in the USER's full variable space under every fixed-variable
    treatment (x1 fixed at 2.0)."""
    nlp = NLP(
        f=lambda x: (x[0] - 1.0) ** 2 + (x[1] - 1.0) ** 2 + (x[2] + 2.0) ** 2,
        g=lambda x: jnp.array([x[0] + x[1] + x[2]]),
        g_L=jnp.array([1.0]), g_U=jnp.array([jnp.inf]),
        x_L=jnp.array([-5.0, 2.0, -5.0]), x_U=jnp.array([5.0, 2.0, 5.0]),
        x0=jnp.array([0.0, 2.0, 0.0]))

    seen = []

    def cb(**kw):
        it = kw.get("curr_iterate")
        if it is not None:
            seen.append((np.array(it["x"]), np.array(it["z_L"])))
        return True

    res = solve(nlp, print_level=0, tol=1e-8,
                fixed_variable_treatment=treatment,
                intermediate_callback=cb, callback_curr_iterate=True)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    assert len(seen) >= 1
    for x_cb, zl_cb in seen:
        assert x_cb.shape == (3,)         # full user space
        np.testing.assert_allclose(x_cb[1], 2.0, atol=1e-6)  # fixed value
    # solution: x1 stays fixed, optimum has x0 ~ 1, x2 from the tradeoff
    np.testing.assert_allclose(np.asarray(res.x)[1], 2.0, atol=1e-6)
