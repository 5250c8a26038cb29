"""Sensitivity (sIPOPT parity) tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, Options, SolverReturn, canonicalize
from ipopt_tpu.sens import sensitivity_step, perturbed_solution, reduced_hessian


def parametric_qp(p_val):
    """min 0.5||x||^2 - p.x   s.t. x0 + x1 = 1.  Solution linear in p."""
    return NLP(
        f=lambda x, p: 0.5 * jnp.sum(x ** 2) - jnp.dot(p, x),
        g=lambda x, p: jnp.array([x[0] + x[1]]),
        g_L=np.array([1.0]), g_U=np.array([1.0]),
        x0=np.zeros(2),
        params=jnp.asarray(p_val))


def test_sensitivity_matches_resolve():
    opts = Options(print_level=0, nlp_scaling_method="none",
                   bound_relax_factor=0.0)
    p0 = np.array([1.0, 2.0])
    nlp0 = canonicalize(parametric_qp(p0), opts)
    res0 = solve(nlp0, opts)
    assert int(res0.status) == int(SolverReturn.SUCCESS)

    dp = jnp.asarray(np.array([0.1, -0.05]))
    sr = sensitivity_step(nlp0, opts, res0.iterate, dp)

    # re-solve with perturbed parameters and compare dx/dp
    nlp1 = canonicalize(parametric_qp(p0 + np.asarray(dp)), opts)
    res1 = solve(nlp1, opts)
    dx_true = np.asarray(res1.x) - np.asarray(res0.x)
    np.testing.assert_allclose(np.asarray(sr.dx), dx_true, rtol=1e-5, atol=1e-7)
    dy_true = np.asarray(res1.y) - np.asarray(res0.y)
    np.testing.assert_allclose(np.asarray(sr.dy_c), dy_true, rtol=1e-5, atol=1e-6)


def test_perturbed_solution_warm_start():
    opts = Options(print_level=0, nlp_scaling_method="none",
                   bound_relax_factor=0.0)
    p0 = np.array([1.0, 2.0])
    nlp0 = canonicalize(parametric_qp(p0), opts)
    res0 = solve(nlp0, opts)
    p1 = p0 + np.array([0.2, 0.1])
    it1 = perturbed_solution(nlp0, opts, res0.iterate, jnp.asarray(p1))
    nlp1 = canonicalize(parametric_qp(p1), opts)
    res1 = solve(nlp1, opts)
    # the first-order update should be very close for a QP (exact modulo
    # inactive-bound barrier terms)
    np.testing.assert_allclose(np.asarray(it1.x), np.asarray(res1.x),
                               rtol=1e-4, atol=1e-5)


def test_reduced_hessian_qp():
    # min 0.5 x^T Q x with Q diag(1, 4) and no constraints: reduced Hessian of
    # all variables is Q itself.
    opts = Options(print_level=0, nlp_scaling_method="none",
                   bound_relax_factor=0.0)
    nlp = canonicalize(NLP(
        f=lambda x: 0.5 * (x[0] ** 2 + 4.0 * x[1] ** 2),
        x0=np.array([1.0, 1.0])), opts)
    res = solve(nlp, opts)
    H = reduced_hessian(nlp, opts, res.iterate, np.array([0, 1]))
    np.testing.assert_allclose(np.asarray(H), np.diag([1.0, 4.0]),
                               rtol=1e-6, atol=1e-6)


def test_sensitivity_boundcheck_activation():
    """sens_boundcheck parity (SensStdStepCalc.cpp:92-260): a perturbation
    that drives a variable past its bound is corrected by pinning the
    violated coordinate to the bound through the bordered-KKT Schur solve."""
    from ipopt_tpu.sens import sensitivity_step_boundcheck

    def bounded_qp(p_val):
        return NLP(
            f=lambda x, p: 0.5 * jnp.sum(x ** 2) - jnp.dot(p, x),
            x_L=np.array([-2.0, -2.0]), x_U=np.array([0.8, 2.0]),
            x0=np.zeros(2), params=jnp.asarray(p_val))

    opts = Options(print_level=0, nlp_scaling_method="none",
                   bound_relax_factor=0.0)
    p0 = np.array([0.5, 0.5])
    nlp0 = canonicalize(bounded_qp(p0), opts)
    res0 = solve(nlp0, opts, tol=1e-10)
    assert int(res0.status) == int(SolverReturn.SUCCESS)

    dp = jnp.asarray(np.array([0.7, 0.0]))   # pushes x0 to 1.2 > 0.8
    plain = sensitivity_step(nlp0, opts, res0.iterate, dp)
    assert float(res0.x[0] + plain.dx[0]) > 0.8 + 1e-3  # violates

    bc = sensitivity_step_boundcheck(nlp0, opts, res0.iterate, dp,
                                     bound_eps=1e-4)
    assert int(bc.n_fixed) >= 1
    x_pred = np.asarray(res0.x) + np.asarray(bc.step.dx)
    # pinned to the bound; the true perturbed solution is (0.8, 0.5)
    np.testing.assert_allclose(x_pred, [0.8, 0.5], atol=1e-3)
    assert float(bc.max_violation) < 1e-3


def test_sensitivity_path_multistep():
    """n_sens_steps parity (SensAlgorithm.cpp:173): sequential parameter
    steps on the same saved factorization track the solution path."""
    from ipopt_tpu.sens import sensitivity_path

    opts = Options(print_level=0, nlp_scaling_method="none",
                   bound_relax_factor=0.0)
    p0 = np.array([1.0, 2.0])
    nlp0 = canonicalize(parametric_qp(p0), opts)
    res0 = solve(nlp0, opts)
    schedule = [jnp.asarray(p0 + np.array([0.1, -0.05])),
                jnp.asarray(p0 + np.array([0.2, -0.10])),
                jnp.asarray(p0 + np.array([0.3, -0.15]))]
    it_end = sensitivity_path(nlp0, opts, res0.iterate, schedule)
    nlp_end = canonicalize(parametric_qp(np.asarray(schedule[-1])), opts)
    res_end = solve(nlp_end, opts)
    np.testing.assert_allclose(np.asarray(it_end.x), np.asarray(res_end.x),
                               rtol=1e-4, atol=1e-5)
