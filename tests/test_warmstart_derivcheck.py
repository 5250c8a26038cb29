import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, SolverReturn, Options, canonicalize
from ipopt_tpu.deriv_check import check_derivatives

import problems


def _hs071_shifted(d):
    return NLP(
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0 + d]), g_U=jnp.array([2e19, 40.0 + d]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))


def test_warm_start_fewer_iterations():
    """ReOptimizeTNLP pattern: warm-starting a perturbed problem from the
    previous solution must converge in fewer iterations than cold."""
    res_cold = solve(_hs071_shifted(0.0), print_level=0)
    res2_cold = solve(_hs071_shifted(0.01), print_level=0)
    res2_warm = solve(_hs071_shifted(0.01), print_level=0,
                      it0=res_cold.iterate, warm_start_init_point=True,
                      mu_init=1e-6, bound_mult_init_val=1e-3)
    assert int(res2_warm.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res2_warm.obj), float(res2_cold.obj),
                               rtol=1e-7)
    assert int(res2_warm.iter_count) < int(res2_cold.iter_count), \
        (int(res2_warm.iter_count), int(res2_cold.iter_count))


def test_derivative_checker_passes_smooth():
    opts = Options(derivative_test="second-order")
    nlp = canonicalize(problems.hs071(), opts)
    rep = check_derivatives(nlp, opts)
    assert rep.ok, rep.failures[:5]
    assert rep.max_rel_err_grad < 1e-4


def test_derivative_checker_catches_nonsmooth():
    # Kinked branch at x=0: AD follows the x<=0 branch (slope 0.1), forward
    # FD probes x>0 (slope 1.0) — a genuine AD/FD mismatch.
    opts = Options(derivative_test="first-order",
                   derivative_test_perturbation=1e-2, bound_relax_factor=0.0,
                   nlp_scaling_method="none",
                   # keep the test point exactly on the kink (the reference
                   # default perturbs randomly within point_perturbation_radius)
                   point_perturbation_radius=0.0)
    nlp = canonicalize(NLP(
        f=lambda x: jnp.sum(jnp.where(x > 0, x, 0.1 * x)),
        x0=jnp.array([0.0, 0.0])), opts)
    rep = check_derivatives(nlp, opts)
    assert not rep.ok
