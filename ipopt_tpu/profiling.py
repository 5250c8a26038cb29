"""Profiling / tracing utilities — the TimingStatistics + jax.profiler bridge.

The reference wraps each algorithm phase in CPU timers
(``src/Algorithm/IpTimingStatistics.hpp:37-160``).  Under jit the phases fuse
into one device program, so per-phase host timers are meaningless; the
TPU-native equivalents are:

- solver counters (``SolveResult.counters``: evals, factorizations, solves),
- wall-clock via ``timing_statistics=True`` on :func:`ipopt_tpu.solve`,
- device-level traces via this module's :func:`trace` context manager, viewed
  in TensorBoard/Perfetto (kernel-level timing of the factorization, line
  search, and collective phases).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace around a block of solver work::

        with ipopt_tpu.profiling.trace("/tmp/ipopt_trace"):
            res = solve(nlp)
            jax.block_until_ready(res.x)

    Open the directory with TensorBoard (or xprof) to see per-kernel timing.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class TimingReport:
    """Per-phase wall times (TimingStatistics parity,
    IpTimingStatistics.hpp:37-160).  Times are seconds; ``iters`` is the
    number of outer IPM iterations measured."""

    def __init__(self):
        self.overall = 0.0
        self.search_direction = 0.0
        self.lin_factorization = 0.0
        self.lin_backsolve = 0.0
        self.function_evals = 0.0
        self.hessian = 0.0
        self.line_search = 0.0  # residual: step minus measured sub-phases
        self.compile = 0.0      # first-call tracing/compilation (excluded)
        self.iters = 0
        self.counters = None

    def print(self, out=print):
        """Reference-format dump (IpIpoptApplication print_timing_statistics,
        IpIpoptApplication.cpp:628-634)."""
        def row(label, t, depth=0):
            pad = " " * depth
            dots = "." * max(1, 36 - len(label) - depth)
            out(f"{pad}{label}{dots}: {t:10.3f} (wall)")

        out("")
        out("Timing Statistics:")
        out("")
        row("OverallAlgorithm", self.overall)
        row("ComputeSearchDirection", self.search_direction, 1)
        row("LinearSystemFactorization", self.lin_factorization, 2)
        row("LinearSystemBackSolve", self.lin_backsolve, 2)
        row("Function Evaluations", self.function_evals, 1)
        row("Hessian of Lagrangian function", self.hessian, 1)
        row("LineSearch/accept (residual)", self.line_search, 1)
        row("Compilation (one-time, excluded)", self.compile)
        if self.iters:
            row("per IPM iteration", self.overall / self.iters, 1)
        if self.counters is not None:
            c = self.counters
            out(f"Function evaluations (f,g)..........: "
                f"{int(c.n_obj_evals)}")
            out(f"Gradient evaluations................: "
                f"{int(c.n_grad_evals)}")
            out(f"Hessian evaluations.................: "
                f"{int(c.n_hess_evals)}")
            out(f"KKT factorizations..................: "
                f"{int(c.n_factorizations)}")
            out(f"KKT backsolve batches...............: "
                f"{int(c.n_kkt_solves)}")


def solve_timed(problem, options=None, print_report=True):
    """Solve with per-phase wall-clock timing — the TimingStatistics analog.

    Under jit the production solver fuses all phases into one device program
    (see module docstring), so this driver runs the *same* jitted outer step
    iteration-by-iteration from Python and measures, on the side, separately
    jitted phase programs (evaluate / Hessian / factorize / backsolve) at each
    iterate.  The phase measurements re-execute work the fused step also does,
    so ``overall`` (sum of real step times) is authoritative and the phase
    rows are representative per-phase costs, exactly like the reference's
    timers are (they also add overhead around each phase,
    IpIpoptAlg.cpp:299-416).  First-call compilation is measured separately
    and excluded from all rows.

    Returns ``(SolveResult, TimingReport)``.
    """
    import time

    from .options import Options
    from .problem import NLP, canonicalize
    from .kkt import evaluate, condensed_rhs_parts
    from .types import SolverReturn
    from .algorithm.solver import (initial_state, ipm_step_with_resto,
                                   finalize)

    opts = options if options is not None else Options()
    from .chained import ChainedNLP, canonicalize_chained
    from .parallel.scenario import ScenarioNLP, canonicalize_scenario
    if isinstance(problem, NLP):
        nlp = canonicalize(problem, opts)
    elif isinstance(problem, ChainedNLP):
        nlp = canonicalize_chained(problem, opts)
    elif isinstance(problem, ScenarioNLP):
        nlp = canonicalize_scenario(problem, opts)
    else:
        nlp = problem

    rep = TimingReport()
    exact_direct = (opts.hessian_approximation != "limited-memory"
                    and opts.linear_solver != "minres"
                    and not opts.inexact_algorithm)

    step_j = jax.jit(lambda s: ipm_step_with_resto(nlp, opts, s))
    # Evals carries VJP closures (CanonicalNLP contract) which cannot cross a
    # jit boundary, so every phase program recomputes ev = evaluate(...)
    # internally and the timing function returns only array leaves.
    eval_j = jax.jit(lambda x: [l for l in jax.tree.leaves(evaluate(nlp, x))
                                if not callable(l)])
    if exact_direct:
        from .algorithm.step import (compute_hessian, factorize_any,
                                     solve_any)
        hess_j = jax.jit(lambda it: compute_hessian(nlp, it))

        def _fact(it, W, mu, dwl):
            fr = factorize_any(nlp, opts, it, evaluate(nlp, it.x), W, mu, dwl)
            return fr.fac, fr.K
        fact_j = jax.jit(_fact)

        def _backsolve(it, fac, K, mu):
            ev = evaluate(nlp, it.x)
            parts = condensed_rhs_parts(nlp, it, ev, mu, opts.kappa_d)
            return solve_any(nlp, opts, fac, K, parts)
        solve_j = jax.jit(_backsolve)

    def timed(fn, *a):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        return out, time.perf_counter() - t0

    st = initial_state(nlp, opts)

    # Warm-up: compile every program once on the initial state (excluded).
    t0 = time.perf_counter()
    jax.block_until_ready(step_j(st))
    jax.block_until_ready(eval_j(st.it.x))
    if exact_direct:
        W = jax.block_until_ready(hess_j(st.it))
        fac, K = jax.block_until_ready(fact_j(st.it, W, st.mu,
                                              st.delta_w_last))
        jax.block_until_ready(solve_j(st.it, fac, K, st.mu))
    rep.compile = time.perf_counter() - t0

    while int(st.status) == int(SolverReturn.CONTINUE):
        _, t_ev = timed(eval_j, st.it.x)
        rep.function_evals += t_ev
        if exact_direct:
            W, t_h = timed(hess_j, st.it)
            rep.hessian += t_h
            (fac, K), t_f = timed(fact_j, st.it, W, st.mu, st.delta_w_last)
            rep.lin_factorization += t_f
            _, t_s = timed(solve_j, st.it, fac, K, st.mu)
            rep.lin_backsolve += t_s
            rep.search_direction += t_f + t_s
        st, t_step = timed(step_j, st)
        rep.overall += t_step
        rep.iters += 1

    rep.line_search = max(0.0, rep.overall - rep.search_direction
                          - rep.function_evals - rep.hessian)
    rep.counters = st.counters
    res = finalize(nlp, opts, st)
    if print_report:
        rep.print()
    return res, rep
