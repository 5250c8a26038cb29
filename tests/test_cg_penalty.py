"""Chen-Goldfarb penalty line search (line_search_method=cg-penalty).

Reference parity: src/contrib/CGPenalty/ (CGSearchDirCalculator,
CGPenaltyLSAcceptor, PiecewisePenalty) — end-to-end solves must reach the
known optima, and the PLPF container must accept/reject per the breakpoint
rules.
"""
import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

import problems

OK = (int(SolverReturn.SUCCESS), int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))


def test_hs071_cg_penalty():
    res = solve(problems.hs071(), print_level=0,
                line_search_method="cg-penalty", max_iter=300)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR,
                               rtol=1e-6)


def test_hs035_cg_penalty():
    res = solve(problems.hs035(), print_level=0,
                line_search_method="cg-penalty", max_iter=300)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), 1.0 / 9.0, rtol=1e-5)


def test_hs006_cg_penalty_infeasible_start():
    # Equality-constrained with infeasible start: exercises the penalty
    # perturbation (delta_c = ||c||_2 / kkt_penalty) and the PLPF updates.
    res = solve(problems.hs006(), print_level=0,
                line_search_method="cg-penalty", max_iter=500)
    assert int(res.status) in OK
    np.testing.assert_allclose(float(res.obj), 0.0, atol=1e-6)


def test_piecewise_penalty_container():
    import jax.numpy as jnp
    from ipopt_tpu.options import Options
    from ipopt_tpu.algorithm.cg_penalty import (cg_init, pp_update,
                                                pp_acceptable)

    opts = Options(line_search_method="cg-penalty")
    cg = cg_init(opts, jnp.float64)
    # Seed entry (pen_r=0, barr=1.0, inf=2.0) — the InitPiecewisePenaltyList.
    cg = cg._replace(pp_pen_r=cg.pp_pen_r.at[0].set(0.0),
                     pp_barr=cg.pp_barr.at[0].set(1.0),
                     pp_inf=cg.pp_inf.at[0].set(2.0),
                     pp_size=jnp.asarray(1, jnp.int32))
    # Lower barrier at the breakpoint -> acceptable.
    assert bool(pp_acceptable(cg, jnp.asarray(0.5), jnp.asarray(2.0)))
    # Higher barrier, same infeasibility -> rejected.
    assert not bool(pp_acceptable(cg, jnp.asarray(1.5), jnp.asarray(2.5)))
    # Less infeasible than every entry -> acceptable regardless of barrier.
    assert bool(pp_acceptable(cg, jnp.asarray(5.0), jnp.asarray(1.0)))

    # Insert a non-dominated point (higher barrier, lower infeasibility).
    cg2 = pp_update(cg, jnp.asarray(1.5), jnp.asarray(1.0))
    assert int(cg2.pp_size) == 2
    inf = np.asarray(cg2.pp_inf)[:2]
    barr = np.asarray(cg2.pp_barr)[:2]
    assert inf[0] > inf[1] and barr[0] < barr[1]  # sorted frontier
    # Breakpoint slope = (barr_1 - barr_0) / (inf_0 - inf_1) = 0.5.
    np.testing.assert_allclose(np.asarray(cg2.pp_pen_r)[1], 0.5)

    # A dominated insertion collapses the list onto the dominating point.
    cg3 = pp_update(cg2, jnp.asarray(0.5), jnp.asarray(0.5))
    assert int(cg3.pp_size) == 1
    np.testing.assert_allclose(np.asarray(cg3.pp_barr)[0], 0.5)
