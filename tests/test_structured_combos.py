"""Previously-NotImplementedError combinations, now closed (VERDICT r1
item 4): L-BFGS and cg-penalty over the structured KKT backends.

Reference: LowRankAugSystemSolver composes with any AugSystemSolver
(IpAlgBuilder.cpp:568-628); the CG penalty search only requires monotone mu
(IpCGSearchDirCalc.cpp:144), not a particular linear solver."""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu.modellib import luksan_vlcek1, luksan_vlcek5
from ipopt_tpu.chained import canonicalize_chained
from ipopt_tpu.options import Options
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.parallel.scenario import ScenarioNLP, canonicalize_scenario


def _scenario():
    S, ns = 4, 3
    rng = np.random.default_rng(0)
    theta = {"t": jnp.asarray(rng.standard_normal((S, ns))),
             "b": jnp.asarray(rng.standard_normal((S, 1)))}
    return ScenarioNLP(
        f_scen=lambda x0, xs, th: 0.5 * jnp.sum((xs - th["t"]) ** 2),
        g_scen=lambda x0, xs, th: jnp.array([x0[0] + jnp.sum(xs)]) - th["b"],
        f0=lambda x0: 0.5 * jnp.sum(x0 ** 2),
        x0_init=np.zeros(2), xs_init=np.zeros((S, ns)),
        g_L=np.zeros((S, 1)), g_U=np.zeros((S, 1)), xs_L=-5.0, theta=theta)


def test_lbfgs_chained():
    opts = Options(print_level=0, tol=1e-6, max_iter=300,
                   hessian_approximation="limited-memory")
    cn = canonicalize_chained(luksan_vlcek1(64, 4), opts)
    r = solve(cn, opts)
    assert int(r.status) in (0, 5), int(r.status)
    # LV1 optimum objective (reference: EXIT gate + known chained Rosenbrock
    # trig-exp structure); compare against the exact-Hessian solve
    r_exact = solve(cn, opts.replace(hessian_approximation="exact"))
    assert abs(float(r.obj) - float(r_exact.obj)) < 1e-4 * max(
        1.0, abs(float(r_exact.obj)))


def test_lbfgs_banded():
    r = solve(luksan_vlcek5(64), print_level=0, tol=1e-6, max_iter=300,
              hessian_approximation="limited-memory",
              linear_solver="banded-bcr")
    assert int(r.status) in (0, 5), int(r.status)
    assert float(r.obj) < 1e-6


def test_lbfgs_arrow():
    opts = Options(print_level=0, tol=1e-6, max_iter=300,
                   hessian_approximation="limited-memory")
    cn = canonicalize_scenario(_scenario(), opts)
    r = solve(cn, opts)
    assert int(r.status) in (0, 5), int(r.status)
    r_exact = solve(cn, opts.replace(hessian_approximation="exact"))
    assert abs(float(r.obj) - float(r_exact.obj)) < 1e-5 * max(
        1.0, abs(float(r_exact.obj)))


def test_cg_penalty_chained():
    opts = Options(print_level=0, tol=1e-6, line_search_method="cg-penalty")
    cn = canonicalize_chained(luksan_vlcek1(64, 4), opts)
    r = solve(cn, opts)
    assert int(r.status) in (0, 5), int(r.status)
