"""Restoration phase for the scenario (block-arrow) backend — VERDICT r1
item 3 / missing 3.  Reference: restoration is linear-solver-agnostic
(src/Algorithm/IpRestoMinC_1Nrm.cpp); algorithm/arrow_resto.py provides the
arrow-structured resto NLP (per-scenario p/n slack widening)."""
import numpy as np
import jax.numpy as jnp

from ipopt_tpu.parallel.scenario import ScenarioNLP, canonicalize_scenario
from ipopt_tpu.options import Options
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.types import SolverReturn


def _feasible_scenario(S=4, ns=3):
    rng = np.random.default_rng(0)
    theta = {"t": jnp.asarray(rng.standard_normal((S, ns))),
             "b": jnp.asarray(rng.standard_normal((S, 1)))}
    return ScenarioNLP(
        f_scen=lambda x0, xs, th: 0.5 * jnp.sum((xs - th["t"]) ** 2),
        g_scen=lambda x0, xs, th: jnp.array([x0[0] + jnp.sum(xs)]) - th["b"],
        f0=lambda x0: 0.5 * jnp.sum(x0 ** 2),
        x0_init=np.zeros(2), xs_init=np.zeros((S, ns)),
        g_L=np.zeros((S, 1)), g_U=np.zeros((S, 1)), xs_L=-5.0, theta=theta)


def test_arrow_solve_with_resto_traced():
    """The arrow path must still converge with the nested resto traced in."""
    opts = Options(print_level=0, tol=1e-8)
    cn = canonicalize_scenario(_feasible_scenario(), opts)
    r = solve(cn, opts)
    assert int(r.status) == int(SolverReturn.SUCCESS)


def test_arrow_infeasible_detected_via_restoration():
    """Inconsistent per-scenario equalities -> the arrow restoration phase
    must run and report LOCAL_INFEASIBILITY (previously the arrow backend
    had restoration disabled and returned RESTORATION_FAILURE)."""
    S, ns = 4, 3
    sn = ScenarioNLP(
        f_scen=lambda x0, xs, th: 0.5 * jnp.sum(xs ** 2),
        g_scen=lambda x0, xs, th: jnp.array([xs[0] - 1.0, xs[0] + 1.0]),
        x0_init=np.zeros(1), xs_init=np.zeros((S, ns)),
        g_L=np.zeros((S, 2)), g_U=np.zeros((S, 2)))
    opts = Options(print_level=0, tol=1e-8)
    cn = canonicalize_scenario(sn, opts)
    r = solve(cn, opts)
    assert int(r.status) == int(SolverReturn.LOCAL_INFEASIBILITY), \
        SolverReturn(int(r.status))
