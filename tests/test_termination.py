"""Termination-option enforcement (VERDICT r1 item 5) and real counters
(item 7).

Reference parity:
- max_wall_time / max_cpu_time: IpOptErrorConvCheck.cpp:167-213
- INVALID_NUMBER_DETECTED: IpIpoptAlg.cpp:531-537 (Eval_Error handling)
- acceptable_obj_change_tol: IpOptErrorConvCheck.cpp:221-235
- eval counters: IpOrigIpoptNLP.hpp:316-342
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ipopt_tpu.problem import NLP
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.types import SolverReturn
from ipopt_tpu.modellib import hs071, HS071_F_STAR


def test_max_wall_time_enforced():
    res = solve(hs071(), print_level=0, max_wall_time=1e-9)
    assert int(res.status) == int(SolverReturn.WALLTIME_EXCEEDED)


def test_max_cpu_time_enforced():
    res = solve(hs071(), print_level=0, max_cpu_time=1e-9)
    assert int(res.status) == int(SolverReturn.CPUTIME_EXCEEDED)


def test_generous_time_limit_still_solves():
    res = solve(hs071(), print_level=0, max_wall_time=3600.0, tol=1e-8)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    assert abs(float(res.obj) - HS071_F_STAR) < 1e-6


def test_invalid_number_detected_fires():
    # f is finite everywhere, but for x > 2 its gradient is NaN (the classic
    # where/sqrt gradient leak: d/dx sqrt(max(2-x, 0)) = inf * 0 = NaN there).
    # Line-search trials only look at f (finite -> accepted), so the solver
    # walks into the bad region and the NaN surfaces in grad_f at the
    # accepted iterate -> INVALID_NUMBER_DETECTED (Eval_Error parity).
    def f(x):
        w = jnp.where(x[0] < 2.0, 0.0, 1.0)
        return -x[0] + w * jnp.sqrt(jnp.maximum(2.0 - x[0], 0.0))

    nlp = NLP(f=f, x0=jnp.array([1.0]),
              x_L=jnp.array([-10.0]), x_U=jnp.array([10.0]))
    res = solve(nlp, print_level=0, max_iter=50)
    assert int(res.status) == int(SolverReturn.INVALID_NUMBER_DETECTED), \
        SolverReturn(int(res.status))


def test_acceptable_obj_change_tol():
    # With a huge acceptable_tol, every iterate is "acceptable" as soon as
    # the objective stalls; acceptable_obj_change_tol gates on the relative
    # objective change so termination happens via STOP_AT_ACCEPTABLE_POINT.
    res = solve(hs071(), print_level=0, tol=1e-16,  # unreachably tight
                acceptable_tol=1e20, acceptable_iter=2,
                acceptable_dual_inf_tol=1e20,
                acceptable_constr_viol_tol=1e20,
                acceptable_compl_inf_tol=1e20,
                acceptable_obj_change_tol=1e-10,
                max_iter=60)
    assert int(res.status) == int(SolverReturn.STOP_AT_ACCEPTABLE_POINT)
    assert abs(float(res.obj) - HS071_F_STAR) < 1e-4


def test_counters_exact_hs071():
    """Real counters (VERDICT weak #3): exactly one gradient evaluation and
    one extra objective evaluation per iteration on hs071 (no backtracks)."""
    res = solve(hs071(), print_level=0, tol=1e-8)
    iters = int(res.iter_count)
    c = res.counters
    assert int(c.n_grad_evals) == iters            # one per accepted iterate
    assert int(c.n_hess_evals) == iters            # exact Hessian every iter
    assert int(c.n_obj_evals) == 2 * iters         # 1 trial + 1 accepted eval
    assert int(c.n_factorizations) == iters        # no inertia corrections
    assert int(c.n_kkt_solves) == iters            # no SOC on hs071


def test_option_file_fills_defaults(tmp_path, monkeypatch):
    """option_file_name: file values apply where the caller left defaults;
    explicit values win (IpoptApplication::Initialize allow_clobber=false)."""
    optfile = tmp_path / "ipopt.opt"
    optfile.write_text("# comment\nmax_iter 7\ntol 1e-3\n")
    monkeypatch.chdir(tmp_path)
    # explicit NON-default value wins over the file ('explicit' detection
    # compares against the registered default, so an explicit value equal to
    # the default is indistinguishable and the file fills it)
    res = solve(hs071(), print_level=0, tol=1e-9)
    # max_iter 7 from the file: hs071 needs 8 iters at tol 1e-9
    assert int(res.status) == int(SolverReturn.MAXITER_EXCEEDED)
    res2 = solve(hs071(), print_level=0)  # file tol 1e-3 + max_iter 7
    assert int(res2.status) == int(SolverReturn.SUCCESS)
