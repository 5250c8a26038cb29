"""The main interior-point driver: IpoptAlgorithm::Optimize equivalent.

Reference parity (``src/Algorithm/IpIpoptAlg.cpp:292-417``):

    InitializeIterates -> CheckConvergence -> loop {
        UpdateHessian; OutputIteration; UpdateBarrierParameter;
        ComputeSearchDirection; ComputeAcceptableTrialPoint;
        AcceptTrialPoint (kappa_sigma multiplier clipping, :260);
        CheckConvergence }

TPU-native design: the whole loop is one ``lax.while_loop`` over an ``IPMState``
carry; every strategy (mu rule, acceptor, perturbation schedule) is a pure
function; fallbacks are status flags in the carry instead of C++ exceptions.
The same ``ipm_step`` is reused by the batched (vmap) driver.

Iteration logging uses ``jax.debug.callback`` so the classic Ipopt iteration
line (``IpOrigIterationOutput.cpp:81``) prints even from inside jit.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate, SolverReturn
from ..problem import NLP, CanonicalNLP, canonicalize
from ..options import Options
from .. import kkt
from ..kkt import Evals, evaluate, kkt_residuals, optimality_error, slacks
from .step import compute_search_direction, StepResult
from .linesearch import (FilterState, filter_init, line_search,
                         LineSearchResult, filter_reset)
from .mu import (MuState, mu_init_state, monotone_mu_update_components,
                 AdaptiveMuState, adaptive_mu_init, adaptive_mu_update,
                 loqo_mu, probing_mu, quality_function_mu)
from .quasi_newton import lbfgs_init
from .cg_penalty import cg_init as _cg_init
from .inexact import decomposition_initial_cn as _inx_cn0
from .init import default_initialize, warm_start_initialize
from .convergence import check_convergence


class Counters(NamedTuple):
    """Evaluation/factorization counters (SolveStatistics eval counts,
    IpOrigIpoptNLP.hpp:316-342 + linear-solver call counts)."""

    n_obj_evals: jnp.ndarray        # f and g evaluations (line-search trials)
    n_grad_evals: jnp.ndarray
    n_hess_evals: jnp.ndarray
    n_factorizations: jnp.ndarray   # KKT factorization attempts
    n_kkt_solves: jnp.ndarray       # backsolves (incl. refinement batches)


def counters_init() -> Counters:
    z = jnp.zeros((), jnp.int32)
    return Counters(z, z, z, z, z)


def _add_opt(base, extra):
    """base + extra, tracing NO op when extra is None (trace-neutrality of
    optional counter terms — see tools/trace_fingerprint.py)."""
    return base if extra is None else base + extra


class EvCache(NamedTuple):
    """Cross-iteration evaluation cache — the functional analog of
    OrigIpoptNLP's tag-keyed caches (IpOrigIpoptNLP.hpp:316-342): f, grad_f,
    c, d (and the dense Jacobians, dense backend only) at the ACCEPTED iterate
    are carried into the next iteration instead of being re-evaluated, so one
    outer iteration costs exactly one full evaluation at the new point."""

    f: jnp.ndarray
    grad_f: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray
    J_c: Any   # dense backend only; None for structured/matrix-free backends
    J_d: Any


def _cache_from_evals(ev: Evals) -> EvCache:
    return EvCache(f=ev.f, grad_f=ev.grad_f, c=ev.c, d=ev.d,
                   J_c=ev.J_c, J_d=ev.J_d)


def _evals_from_cache(nlp: CanonicalNLP, x, cache: EvCache) -> Evals:
    """Rebuild the Evals view at ``x`` (the point the cache was filled at).
    Dense backend: the transpose products come from the cached Jacobians.
    Structured backends: rebuild the VJP closures (their forward pass is the
    only re-computation; f and grad_f are reused)."""
    if cache.J_c is not None:
        J_c, J_d = cache.J_c, cache.J_d
        return Evals(f=cache.f, grad_f=cache.grad_f, c=cache.c, d=cache.d,
                     J_c=J_c, J_d=J_d,
                     jc_t=lambda y: J_c.T @ y, jd_t=lambda y: J_d.T @ y)
    _, c_vjp = jax.vjp(nlp.eval_c, x)
    _, d_vjp = jax.vjp(nlp.eval_d, x)
    # dtype-tolerant cotangents: under the mixed-precision modes
    # (refinement_precision='double' / factorization_dtype) the multipliers
    # may be a different precision than the f64 evaluation point
    cdt = x.dtype
    return Evals(f=cache.f, grad_f=cache.grad_f, c=cache.c, d=cache.d,
                 J_c=None, J_d=None,
                 jc_t=lambda y: c_vjp(y.astype(cdt))[0],
                 jd_t=lambda y: d_vjp(y.astype(cdt))[0])


class IPMState(NamedTuple):
    it: Iterate
    mu: jnp.ndarray
    tau: jnp.ndarray
    iter_count: jnp.ndarray
    delta_w_last: jnp.ndarray
    fs: FilterState
    theta_min: jnp.ndarray
    theta_max: jnp.ndarray
    status: jnp.ndarray           # int32 SolverReturn; CONTINUE while running
    acceptable_count: jnp.ndarray
    # diagnostics of the last iteration (for logging / statistics)
    last_alpha_pr: jnp.ndarray
    last_alpha_du: jnp.ndarray
    last_ls_count: jnp.ndarray
    last_delta_x: jnp.ndarray
    last_step_norm: jnp.ndarray
    restoration_count: jnp.ndarray
    ams: AdaptiveMuState
    lbfgs: Any  # LBFGSState (zero-width history when hessian is exact)
    tiny_step_count: jnp.ndarray
    counters: Counters
    # Watchdog (IpBacktrackingLineSearch Start/StopWatchDog): after
    # watchdog_shortened_iter_trigger consecutive shortened steps, take full
    # steps on trust for up to watchdog_trial_iter_max iterations; restore the
    # reference iterate if no trial becomes acceptable w.r.t. it.
    wd_active: jnp.ndarray
    wd_trials: jnp.ndarray
    wd_shortened_count: jnp.ndarray
    wd_ref: Iterate
    wd_ref_theta: jnp.ndarray
    wd_ref_phi: jnp.ndarray
    penalty_nu: jnp.ndarray  # l1-penalty acceptor parameter (PenaltyLSAcceptor)
    soft_resto_count: jnp.ndarray  # consecutive soft-restoration steps
    cg: Any  # CGState (Chen-Goldfarb penalty carry; minimal when unused)
    tr_omega: jnp.ndarray   # inexact normal-step trust-region factor
    nu_low: jnp.ndarray     # flexible-penalty lower parameter (inexact)
    ev: Any = None  # EvCache at ``it`` (filled by initial_state / ipm_step)
    # Line-search robustness state (r4): expect_infeasible_problem heuristic
    # (IpBacktrackingLineSearch.cpp:341-652), filter-reset heuristic
    # (IpFilterLSAcceptor.cpp:402-420), adaptive-mu restore point
    # (IpAdaptiveMuUpdate.cpp:362-370,541-545).
    eip_active: Any = None        # bool: infeasibility heuristic still armed
    filter_rej_count: Any = None  # consecutive filter-caused rejections
    n_filter_resets: Any = None
    last_rej_filter: Any = None
    accepted_point: Any = None    # previous accepted iterate
    # Inexact adaptive step-decomposition bit (InexData::compute_normal,
    # IpInexactSearchDirCalc.cpp:54-106); None = statically decomposed.
    inx_cn: Any = None


def robust_state_init(opts: Options, it: Iterate) -> dict:
    """Initial values for the r4 robustness carry fields (shared by
    initial_state and the four restoration-phase state builders)."""
    return dict(
        eip_active=jnp.asarray(bool(opts.expect_infeasible_problem)),
        filter_rej_count=jnp.zeros((), jnp.int32),
        n_filter_resets=jnp.zeros((), jnp.int32),
        last_rej_filter=jnp.zeros((), bool),
        accepted_point=it)


class SolveResult(NamedTuple):
    """SolveStatistics equivalent (src/Interfaces/IpSolveStatistics.hpp:53)."""

    x: Any                 # solution in the user's full variable space
    obj: Any               # unscaled objective
    status: Any            # SolverReturn int
    iter_count: Any
    mu: Any
    g: Any                 # constraint values in user order (m,)
    y: Any                 # constraint multipliers in user order
    z_L: Any               # bound multipliers (full space)
    z_U: Any
    dual_inf: Any
    primal_inf: Any
    compl_inf: Any
    E_scaled: Any
    iterate: Any           # final internal Iterate (for warm starts)
    counters: Any          # Counters (eval/factorization counts)
    restoration_count: Any


def _compl_max_fn(nlp: CanonicalNLP, it: Iterate, s_c):
    """Returns f(mu) = max_i |slack_i*mult_i - mu| / s_c as a jnp closure."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    prods = jnp.concatenate([
        jnp.where(nlp.has_xL, sl_xL * it.z_L, jnp.nan),
        jnp.where(nlp.has_xU, sl_xU * it.z_U, jnp.nan),
        jnp.where(nlp.has_dL, sl_sL * it.v_L, jnp.nan),
        jnp.where(nlp.has_dU, sl_sU * it.v_U, jnp.nan)])
    has_any = jnp.any(jnp.logical_not(jnp.isnan(prods)))

    def f(mu):
        vals = jnp.where(jnp.isnan(prods), 0.0, jnp.abs(prods - mu))
        return jnp.where(has_any, jnp.max(vals, initial=0.0), 0.0) / s_c

    return f


def _scaling_s(nlp: CanonicalNLP, it: Iterate, s_max):
    """(s_d, s_c) of ComputeOptimalityErrorScaling."""
    n_mults_c = (jnp.sum(nlp.has_xL) + jnp.sum(nlp.has_xU)
                 + jnp.sum(nlp.has_dL) + jnp.sum(nlp.has_dU))
    sum_z = (jnp.sum(jnp.abs(jnp.where(nlp.has_xL, it.z_L, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_xU, it.z_U, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_dL, it.v_L, 0.0)))
             + jnp.sum(jnp.abs(jnp.where(nlp.has_dU, it.v_U, 0.0))))
    sum_y = jnp.sum(jnp.abs(it.y_c)) + jnp.sum(jnp.abs(it.y_d))
    n_mults_d = n_mults_c + it.y_c.shape[0] + it.y_d.shape[0]
    s_c = jnp.where(n_mults_c > 0,
                    jnp.maximum(s_max, sum_z / jnp.maximum(n_mults_c, 1)) / s_max,
                    1.0)
    s_d = jnp.where(n_mults_d > 0,
                    jnp.maximum(s_max, (sum_z + sum_y) / jnp.maximum(n_mults_d, 1)) / s_max,
                    1.0)
    return s_d, s_c


def _kappa_sigma_clip(nlp: CanonicalNLP, it: Iterate, mu, kappa_sigma):
    """AcceptTrialPoint bound-multiplier correction (IpIpoptAlg.cpp:260):
    z in [mu/(kappa_sigma*slack), kappa_sigma*mu/slack]."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)

    def clip(z, sl, has):
        lo = mu / (kappa_sigma * sl)
        hi = kappa_sigma * mu / sl
        return jnp.where(has, jnp.clip(z, lo, hi), 0.0)

    return it._replace(
        z_L=clip(it.z_L, sl_xL, nlp.has_xL),
        z_U=clip(it.z_U, sl_xU, nlp.has_xU),
        v_L=clip(it.v_L, sl_sL, nlp.has_dL),
        v_U=clip(it.v_U, sl_sU, nlp.has_dU))


# alpha_pr step-type tags (IpOrigIterationOutput.cpp:~383 "step summary"
# char): f/h = filter f-/h-type accepted (capitalized when a second-order
# correction produced the accepted point), w = watchdog backup restore,
# W = step taken on the watchdog trial, s = soft restoration step,
# R = restoration phase triggered, e = line-search failure.
_STEP_TAGS = "fFhHwWsRe"
# print_info_string diagnostic codes (IpPDFullSpaceSolver.cpp:557,576 and
# IpOrigIterationOutput.cpp info_string): q = iterative refinement ended
# above residual_ratio_max, d = inertia-perturbation retries happened,
# M = watchdog is armed/active.
_INFO_CODES = "qdM"


_LAST_PRINT_T = [0.0]  # print_frequency_time host-side state


def _print_iter(iter_count, f, inf_pr, inf_du, mu, dnorm, delta_x, alpha_du,
                alpha_pr, ls_count, output_file="", print_freq=1,
                tag_code=None, info_bits=None, print_info_string=False,
                print_freq_time=0.0):
    """The classic log line (IpOrigIterationOutput.cpp:81); optionally teed to
    ``output_file`` (FileJournal equivalent, IpJournalist.hpp:416)."""
    lg_mu = jnp.log10(jnp.maximum(mu, 1e-99))
    lg_rg = jnp.where(delta_x > 0, jnp.log10(jnp.maximum(delta_x, 1e-99)), jnp.nan)
    if tag_code is None:
        tag_code = jnp.full((), -1, jnp.int32)
    if info_bits is None:
        info_bits = jnp.zeros((), jnp.int32)

    def cb(i, f, pr, du, lgmu, dn, rg, adu, apr, ls, tag, bits):
        if print_freq > 1 and int(i) % print_freq != 0:
            return  # print_frequency_iter (IpOrigIterationOutput.cpp)
        if print_freq_time > 0 and int(i) != 0:
            # print_frequency_time (IpOrigIterationOutput.cpp:64-68)
            import time as _time
            if _time.monotonic() - _LAST_PRINT_T[0] < print_freq_time:
                return
        import time as _time
        _LAST_PRINT_T[0] = _time.monotonic()
        rg_s = f"{float(rg):5.1f}" if not jnp.isnan(rg) else "  - "
        tag_s = _STEP_TAGS[int(tag)] if 0 <= int(tag) < len(_STEP_TAGS) else " "
        line = (f"{int(i):4d} {float(f):16.7e} {float(pr):8.2e} {float(du):8.2e}"
                f" {float(lgmu):5.1f} {float(dn):8.2e} {rg_s} {float(adu):8.2e}"
                f" {float(apr):8.2e}{tag_s}{int(ls):3d}")
        if print_info_string:
            info = "".join(c for k, c in enumerate(_INFO_CODES)
                           if int(bits) & (1 << k))
            if info:
                line += f"  {info}"
        from ..journalist import (default_journalist, EJournalLevel,
                                  EJournalCategory)
        default_journalist().printf(EJournalLevel.J_ITERSUMMARY,
                                    EJournalCategory.J_MAIN, line + "\n")

    jax.debug.callback(cb, iter_count, f, inf_pr, inf_du, lg_mu, dnorm, lg_rg,
                       alpha_du, alpha_pr, ls_count, tag_code, info_bits,
                       ordered=True)


def ipm_step(nlp: CanonicalNLP, opts: Options, st: IPMState) -> IPMState:
    """One IPM iteration without restoration fallback (used inside the
    restoration phase itself, where a line-search failure is terminal —
    restoration-of-restoration is a later milestone)."""
    return _ipm_step_impl(nlp, opts, st, enable_resto=False)


def ipm_step_with_resto(nlp: CanonicalNLP, opts: Options, st: IPMState) -> IPMState:
    """One outer IPM iteration with the restoration-phase fallback."""
    return _ipm_step_impl(nlp, opts, st, enable_resto=True)


def _ipm_step_impl(nlp: CanonicalNLP, opts: Options, st: IPMState,
                   enable_resto: bool) -> IPMState:
    """One outer IPM iteration (the body of IpIpoptAlg.cpp:347-417)."""
    it = st.it
    # High-precision critical path (refinement_precision='double'): the
    # once-per-iteration evaluation at the accepted point runs in float64
    # (x cast up; the f32 iterate's residuals are then exact to ~1e-16),
    # so the convergence error E and the KKT right-hand side resolve below
    # the f32 noise floor while the factorization and line search stay in
    # the model dtype.  This is what lets an f32 TPU run reach tol <= 1e-7
    # (reference double-build default 1e-8, IpIpoptData.cpp:27-38).
    from .step import _backend as _be_fn
    _hp = (opts.refinement_precision == "double"
           and _be_fn(nlp) in ("dense", "btd", "banded")
           and not opts.inexact_algorithm
           and opts.line_search_method != "cg-penalty"
           and opts.linear_solver not in ("minres", "custom"))
    _acc = jnp.float64 if _hp else it.x.dtype
    _model = it.x.dtype
    # Reuse the evaluation cache filled at the end of the previous iteration
    # (or by initial_state) — no re-evaluation at the loop top.
    ev = _evals_from_cache(nlp, it.x.astype(_acc), st.ev)
    if _hp:
        # model-precision view for the factorization assembly, line search,
        # and quasi-Newton pairs (the f64 view feeds residuals + RHS only)
        ev_lo = Evals(
            f=ev.f.astype(_model), grad_f=ev.grad_f.astype(_model),
            c=ev.c.astype(_model), d=ev.d.astype(_model),
            J_c=None if ev.J_c is None else ev.J_c.astype(_model),
            J_d=None if ev.J_d is None else ev.J_d.astype(_model),
            jc_t=(lambda y: ev.jc_t(y.astype(_acc)).astype(_model)),
            jd_t=(lambda y: ev.jd_t(y.astype(_acc)).astype(_model)))
    else:
        ev_lo = ev

    # --- UpdateBarrierParameter -------------------------------------------
    s_d, s_c = _scaling_s(nlp, it, opts.s_max)
    res0 = kkt_residuals(nlp, it, ev, 0.0)
    dual_inf = jnp.maximum(
        jnp.max(jnp.abs(res0.grad_lag_x), initial=0.0),
        jnp.max(jnp.abs(res0.grad_lag_s), initial=0.0))
    primal_inf = jnp.maximum(
        jnp.max(jnp.abs(res0.c), initial=0.0),
        jnp.max(jnp.abs(res0.d_minus_s), initial=0.0))
    compl_fn = _compl_max_fn(nlp, it, s_c)
    # --- UpdateHessian (Exact | LimMemQuasiNewton, IpIpoptAlg.cpp:351) ----
    _exact_hessian = False  # static: did this iteration evaluate a real W?
    _nlv_masked = (opts.num_linear_variables > 0
                   and opts.hessian_approximation_space
                   == "nonlinear-variables")
    if opts.hessian_approximation == "limited-memory":
        if nlp.chain is not None or (
                opts.limited_memory_aug_solver == "sherman-morrison"
                and opts.linear_solver != "minres"):
            # LowRankAugSystemSolver path: keep W in compact form; the KKT
            # solve applies Sherman-Morrison-Woodbury around the base system
            # (dense condensation, or the structured factorization for the
            # chained/arrow/banded backends — lowrank_struct.py).
            if _nlv_masked:
                raise NotImplementedError(
                    "num_linear_variables with the nonlinear-variables "
                    "approximation space needs the dense low-rank path — "
                    "set limited_memory_aug_solver='extended'")
            from .quasi_newton import lbfgs_compact
            W = lbfgs_compact(st.lbfgs, opts)
        else:
            from .quasi_newton import lbfgs_dense_W
            if _nlv_masked:
                _nm_full = np.arange(nlp.struct.n_full) >= \
                    opts.num_linear_variables
                _nl_mask = jnp.asarray(
                    _nm_full[np.asarray(nlp.struct.free_idx)]
                    if nlp.struct.n != nlp.struct.n_full else _nm_full)
                W = lbfgs_dense_W(st.lbfgs, opts, nl_mask=_nl_mask)
            else:
                W = lbfgs_dense_W(st.lbfgs, opts)
    elif opts.linear_solver == "minres" or opts.inexact_algorithm:
        W = None  # matrix-free: Hessian only ever appears as HVPs
    else:
        from .step import compute_hessian
        W = compute_hessian(nlp, it)
        _exact_hessian = True
    _extra_solves = (2 if (opts.mu_strategy == "adaptive"
                           or opts.mehrotra_algorithm) else 0)
    ams = st.ams
    if opts.linear_solver == "minres" and (opts.mu_strategy == "adaptive"
                                           or opts.mehrotra_algorithm):
        raise NotImplementedError("adaptive mu with linear_solver='minres' "
                                  "is not supported yet")
    if opts.line_search_method == "cg-penalty" and (
            opts.mu_strategy == "adaptive" or opts.mehrotra_algorithm
            or opts.linear_solver == "minres"):
        # The reference asserts !FreeMuMode for the CG penalty search
        # (IpCGSearchDirCalc.cpp:144).
        raise NotImplementedError("cg-penalty requires monotone mu and a "
                                  "direct linear solver")
    if opts.inexact_algorithm and (opts.mu_strategy == "adaptive"
                                   or opts.mehrotra_algorithm):
        # The reference builds the inexact algorithm with monotone mu only
        # (IpInexactAlgBuilder.cpp).
        raise NotImplementedError("inexact_algorithm requires monotone mu")
    cg_state = st.cg
    cg_aux = None
    new_tr_omega = st.tr_omega
    nu_low_state = st.nu_low
    inaux = None

    if opts.mu_strategy == "adaptive" or opts.mehrotra_algorithm:
        # Free-mode mu from an oracle each iteration (AdaptiveMuUpdate).
        # One factorization serves the affine solve, the centering solve, and
        # the final step: rhs(mu) = rhs(0) + mu * drhs is affine in mu, and so
        # is the bound-multiplier recovery.
        from .step import factorize_any, solve_any, direction_from_parts
        from ..kkt import condensed_rhs_parts as _crhsp
        fr = factorize_any(nlp, opts, it, ev_lo, W, st.mu, st.delta_w_last)
        parts0 = _crhsp(nlp, it, ev, 0.0, opts.kappa_d)
        parts1 = _crhsp(nlp, it, ev, 1.0, opts.kappa_d)
        dparts = jax.tree.map(lambda a, b: b - a, parts0, parts1)
        split_aff, rr_a = solve_any(nlp, opts, fr.fac, fr.K, parts0)
        split_cent, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
        step_aff = direction_from_parts(nlp, it, split_aff, 0.0, fr.failed)
        step_at1 = direction_from_parts(
            nlp, it, jax.tree.map(lambda a, b: a + b, split_aff, split_cent),
            1.0, fr.failed)
        step_cent = jax.tree.map(lambda a, b: b - a, step_aff, step_at1)

        # mehrotra_probing (IpAlgBuilder.cpp:355-363): the Mehrotra mode
        # forces the probing oracle unless explicitly disabled
        oracle = ("probing"
                  if opts.mehrotra_algorithm and opts.mehrotra_probing
                  else opts.mu_oracle)
        if oracle == "loqo":
            mu_orc = loqo_mu(nlp, it, opts)
        elif oracle == "probing":
            mu_orc = probing_mu(nlp, it, opts, step_aff)
        else:
            mu_orc = quality_function_mu(nlp, it, opts, step_aff, step_cent,
                                         dual_inf / s_d, primal_inf, st.tau)
        theta_curr = jnp.sum(jnp.abs(ev.c)) + jnp.sum(jnp.abs(ev.d - it.s))
        # r4: safeguard/mu_max/fixed-oracle inputs (IpAdaptiveMuUpdate.cpp)
        from .mu import avg_complementarity as _avgc
        avg_compl_val, _ = _avgc(nlp, it)
        dual1_avg = ((jnp.sum(jnp.abs(res0.grad_lag_x))
                      + jnp.sum(jnp.abs(res0.grad_lag_s)))
                     / jnp.maximum(nlp.n + nlp.mi, 1)).astype(_model)
        primal1_avg = ((jnp.sum(jnp.abs(res0.c))
                        + jnp.sum(jnp.abs(res0.d_minus_s)))
                       / jnp.maximum(nlp.me + nlp.mi, 1)).astype(_model)
        if opts.fixed_mu_oracle == "loqo":
            fix_mu_val = loqo_mu(nlp, it, opts)
        elif opts.fixed_mu_oracle == "probing":
            fix_mu_val = probing_mu(nlp, it, opts, step_aff)
        elif opts.fixed_mu_oracle == "quality-function":
            fix_mu_val = quality_function_mu(nlp, it, opts, step_aff,
                                             step_cent, dual_inf / s_d,
                                             primal_inf, st.tau)
        else:  # "average_compl" (the reference default fallback)
            fix_mu_val = None
        ams, ms = adaptive_mu_update(opts, st.ams, MuState(st.mu, st.tau),
                                     mu_orc, dual_inf / s_d, primal_inf,
                                     compl_fn, theta_curr=theta_curr,
                                     f_curr=ev.f,
                                     avg_compl_val=avg_compl_val,
                                     dual1_avg=dual1_avg,
                                     primal1_avg=primal1_avg,
                                     fix_mu_val=fix_mu_val)
        mu, tau = ms.mu, ms.tau
        step = jax.tree.map(lambda a, c: a + mu * c, step_aff, step_cent)
        sr = StepResult(step=step, delta_x=fr.delta_x, delta_c=fr.delta_c,
                        delta_w_last=fr.delta_w_last, failed=fr.failed,
                        num_trials=fr.num_trials, residual_ratio=rr_a,
                        fac=fr.fac, K=fr.K)
    else:
        # Monotone Fiacco-McCormick (the default).
        # mu_allow_fast_monotone_decrease=no limits each update to a single
        # level except the very first (IpMonotoneMuUpdate.cpp:170-182).
        if opts.mu_allow_fast_monotone_decrease:
            _rounds_cap = None
        else:
            _rounds_cap = jnp.where(st.iter_count == 0, 30, 1).astype(jnp.int32)
        ms = monotone_mu_update_components(
            opts, MuState(st.mu, st.tau), dual_inf / s_d, primal_inf, compl_fn,
            max_rounds=_rounds_cap)
        mu, tau = ms.mu, ms.tau
        if opts.inexact_algorithm:
            from .inexact import inexact_search_direction
            sr, new_tr_omega, inaux = inexact_search_direction(
                nlp, opts, it, ev_lo, mu, st.delta_w_last, st.tr_omega,
                nu=st.penalty_nu, compute_normal=st.inx_cn,
                last_ls_count=st.last_ls_count)
        elif opts.linear_solver == "minres":
            from .matrix_free import mf_search_direction
            sr = mf_search_direction(nlp, opts, it, ev_lo, mu, st.delta_w_last)
        elif opts.line_search_method == "cg-penalty":
            from .cg_penalty import cg_search_direction
            sr, cg_state, cg_aux = cg_search_direction(
                nlp, opts, it, ev_lo, W, mu, st.delta_w_last, st.cg)
        else:
            sr = compute_search_direction(nlp, opts, it, ev_lo, W, mu,
                                          st.delta_w_last, ev_rhs=ev)

    # --- Tiny-step detection (BacktrackingLineSearch tiny_step_tol) -------
    # When the scaled step is at machine-precision level, further progress is
    # impossible; two consecutive tiny steps terminate with STOP_AT_TINY_STEP.
    eps = jnp.finfo(it.x.dtype).eps
    tiny_tol = jnp.where(opts.tiny_step_tol > 0, opts.tiny_step_tol, 10.0 * eps)
    step_scale = jnp.max(jnp.abs(sr.step.x) / (1.0 + jnp.abs(it.x)), initial=0.0)
    if nlp.mi:
        step_scale = jnp.maximum(
            step_scale,
            jnp.max(jnp.abs(sr.step.s) / (1.0 + jnp.abs(it.s)), initial=0.0))
    # Only treat a tiny step as terminal progress when the point is close to
    # feasible; a tiny step at large infeasibility means the regularized
    # system collapsed and the restoration phase should run instead
    # (IpBacktrackingLineSearch defers to the fallback in that case).
    near_feasible = primal_inf <= 10.0 * jnp.maximum(opts.constr_viol_tol,
                                                     opts.tol)
    is_tiny = jnp.logical_and(
        jnp.logical_and(step_scale <= tiny_tol, near_feasible),
        jnp.logical_not(sr.failed))
    # tiny_step_y_tol (IpBacktrackingLineSearch.cpp:408-419): only remember a
    # tiny step toward termination when the DUAL step is also insignificant.
    dy_norm = jnp.maximum(jnp.max(jnp.abs(sr.step.y_c), initial=0.0),
                          jnp.max(jnp.abs(sr.step.y_d), initial=0.0))
    tiny_count = jnp.where(
        jnp.logical_and(is_tiny, dy_norm < opts.tiny_step_y_tol),
        st.tiny_step_count + 1, 0)

    # --- Higher-order corrector (FilterLSAcceptor::TryCorrector,
    #     IpFilterLSAcceptor.cpp:655-880): build the corrected full step
    #     before the line search; the search tests it first.  The increment
    #     solves the SAME factorized system with a pure complementarity-block
    #     RHS, reduced onto the condensed system as
    #     (S_L^-1 r_zL - S_U^-1 r_zU, ...) with zero c/d rows.
    corr = None
    _corr_capable = (opts.corrector_type != "none"
                     and not opts.inexact_algorithm
                     and opts.line_search_method != "cg-penalty"
                     and opts.linear_solver != "minres")
    if _corr_capable:
        from .step import solve_any as _solve_any2
        from .step import direction_from_parts as _dfp2
        from ..kkt import slacks as _slacks
        from ..kkt import fraction_to_boundary as _ftb_corr
        free_flag = (ams.free_mode if (opts.mu_strategy == "adaptive"
                                       or opts.mehrotra_algorithm)
                     else jnp.zeros((), bool))
        active = jnp.logical_not(sr.failed)
        if opts.skip_corr_in_monotone_mode:
            # corrector only in free mu mode (IpFilterLSAcceptor.cpp:663)
            active = jnp.logical_and(active, free_flag)
        if opts.skip_corr_if_neg_curv:
            # skip when the Hessian was perturbed (info_regu_x != 0, :662)
            active = jnp.logical_and(active, sr.delta_x == 0.0)
        nb_total = (jnp.sum(nlp.has_xL) + jnp.sum(nlp.has_xU)
                    + jnp.sum(nlp.has_dL) + jnp.sum(nlp.has_dU))
        active = jnp.logical_and(active, nb_total > 0)
        if opts.mu_strategy == "adaptive" or opts.mehrotra_algorithm:
            d_aff = step_aff        # already computed for the oracle
        elif opts.corrector_type == "affine":
            from ..kkt import condensed_rhs_parts as _crhsp2
            parts_a = _crhsp2(nlp, it, ev, 0.0, opts.kappa_d)
            split_a, _ = _solve_any2(nlp, opts, sr.fac, sr.K, parts_a)
            d_aff = _dfp2(nlp, it, split_a, 0.0, sr.failed)
        else:
            d_aff = None
        sl_xL, sl_xU, sl_sL, sl_sU = _slacks(nlp, it)
        stp = sr.step
        if opts.corrector_type == "affine":
            # classic MPC second-order term (:689-748)
            r_zL = jnp.where(nlp.has_xL, -d_aff.x * d_aff.z_L, 0.0)
            r_zU = jnp.where(nlp.has_xU, d_aff.x * d_aff.z_U, 0.0)
            r_vL = jnp.where(nlp.has_dL, -d_aff.s * d_aff.v_L, 0.0)
            r_vU = jnp.where(nlp.has_dU, d_aff.s * d_aff.v_U, 0.0)
        else:
            # "primal-dual": full complementarity residual at the predicted
            # point, targeting mu (:751-798)
            r_zL = jnp.where(nlp.has_xL,
                             mu - (sl_xL + stp.x) * (it.z_L + stp.z_L), 0.0)
            r_zU = jnp.where(nlp.has_xU,
                             mu - (sl_xU - stp.x) * (it.z_U + stp.z_U), 0.0)
            r_vL = jnp.where(nlp.has_dL,
                             mu - (sl_sL + stp.s) * (it.v_L + stp.v_L), 0.0)
            r_vU = jnp.where(nlp.has_dU,
                             mu - (sl_sU - stp.s) * (it.v_U + stp.v_U), 0.0)
        parts_c = (jnp.where(nlp.has_xL, r_zL / sl_xL, 0.0)
                   - jnp.where(nlp.has_xU, r_zU / sl_xU, 0.0),
                   jnp.where(nlp.has_dL, r_vL / sl_sL, 0.0)
                   - jnp.where(nlp.has_dU, r_vU / sl_sU, 0.0),
                   jnp.zeros((nlp.me,), it.x.dtype),
                   jnp.zeros((nlp.mi,), it.x.dtype))
        split_c, _ = _solve_any2(nlp, opts, sr.fac, sr.K, parts_c)
        dx2, ds2, dyc2, dyd2 = split_c
        dz_L2 = jnp.where(nlp.has_xL, (r_zL - it.z_L * dx2) / sl_xL, 0.0)
        dz_U2 = jnp.where(nlp.has_xU, (r_zU + it.z_U * dx2) / sl_xU, 0.0)
        dv_L2 = jnp.where(nlp.has_dL, (r_vL - it.v_L * ds2) / sl_sL, 0.0)
        dv_U2 = jnp.where(nlp.has_dU, (r_vU + it.v_U * ds2) / sl_sU, 0.0)
        d_corr = Iterate(x=stp.x + dx2, s=stp.s + ds2,
                         y_c=stp.y_c + dyc2, y_d=stp.y_d + dyd2,
                         z_L=stp.z_L + dz_L2, z_U=stp.z_U + dz_U2,
                         v_L=stp.v_L + dv_L2, v_U=stp.v_U + dv_U2)
        a_pr_c, a_du_c = _ftb_corr(nlp, it, d_corr, tau)
        trial_c = Iterate(
            x=it.x + a_pr_c * d_corr.x, s=it.s + a_pr_c * d_corr.s,
            y_c=it.y_c + a_pr_c * d_corr.y_c,
            y_d=it.y_d + a_pr_c * d_corr.y_d,
            z_L=it.z_L + a_du_c * d_corr.z_L,
            z_U=it.z_U + a_du_c * d_corr.z_U,
            v_L=it.v_L + a_du_c * d_corr.v_L,
            v_U=it.v_U + a_du_c * d_corr.v_U)
        if opts.corrector_type == "affine":
            # reject when the trial complementarity did not shrink enough
            # (corrector_compl_avrg_red_fact, :826-840)
            from .mu import avg_complementarity as _avgc2
            avg_curr, _ = _avgc2(nlp, it)
            avg_trial, _ = _avgc2(nlp, trial_c)
            active = jnp.logical_and(
                active,
                avg_trial < opts.corrector_compl_avrg_red_fact * avg_curr)
        corr = dict(trial=trial_c, alpha_pr=a_pr_c, alpha_du=a_du_c,
                    active=active)
        _extra_solves += 1  # the corrector backsolve (TryCorrector timing)

    # --- Filter-reset heuristic (IpFilterLSAcceptor.cpp:402-420): when the
    # last trial rejection was filter-caused in filter_reset_trigger
    # successive iterations, clear the filter (at most max_filter_resets
    # times per solve).
    fs_in = st.fs
    frc_next = st.filter_rej_count
    nfr_next = st.n_filter_resets
    _filter_ls = not (opts.inexact_algorithm
                      or opts.line_search_method in ("cg-penalty", "penalty"))
    if opts.max_filter_resets > 0 and _filter_ls:
        frc_next = jnp.where(st.last_rej_filter, st.filter_rej_count + 1, 0)
        do_reset = jnp.logical_and(
            jnp.logical_and(frc_next >= opts.filter_reset_trigger,
                            st.n_filter_resets < opts.max_filter_resets),
            jnp.logical_not(st.wd_active))
        fs_in = jax.tree.map(lambda a, b: jnp.where(do_reset, b, a),
                             st.fs, filter_reset(st.fs))
        frc_next = jnp.where(do_reset, 0, frc_next)
        nfr_next = st.n_filter_resets + do_reset.astype(jnp.int32)

    # --- Line search ------------------------------------------------------
    inx_cn_next = st.inx_cn
    if opts.inexact_algorithm:
        from .inexact import inexact_line_search, decomposition_next_cn
        ls, _nu_new, nu_low_state = inexact_line_search(
            nlp, opts, it, ev_lo, sr, mu, tau, st.penalty_nu, st.nu_low, inaux)
        ls = ls._replace(filter=st.fs)  # penalty search keeps no filter
        # adaptive decomposition activation from the accepted step size, and
        # forced activation when an undecomposed round produced no usable
        # step (IpInexactSearchDirCalc.cpp:196-200)
        inx_cn_next = decomposition_next_cn(opts, st.inx_cn, ls.alpha_primal)
        if inx_cn_next is not None:
            inx_cn_next = jnp.where(sr.failed, True, inx_cn_next)
    elif opts.line_search_method == "cg-penalty":
        from .cg_penalty import cg_line_search
        ls, cg_state = cg_line_search(nlp, opts, it, ev_lo, sr, mu, tau,
                                      cg_state, cg_aux)
        ls = ls._replace(filter=st.fs)  # the CG method keeps no filter
        # MultipliersDiverged (IpCGPenaltyLSAcceptor.cpp:678-708): at a
        # still-infeasible point with exploding duals and a collapsing
        # primal step, reject the trial so the restoration fallback runs.
        curr_inf2 = jnp.sqrt(jnp.sum(ev_lo.c ** 2)
                             + jnp.sum((ev_lo.d - it.s) ** 2))
        trial_inf2 = jnp.sqrt(jnp.sum(ls.trial_c ** 2)
                              + jnp.sum((ls.trial_d - ls.trial.s) ** 2))
        y_amax = jnp.maximum(jnp.max(jnp.abs(it.y_c), initial=0.0),
                             jnp.max(jnp.abs(it.y_d), initial=0.0))
        n_bnd_mults = (jnp.sum(nlp.has_xL) + jnp.sum(nlp.has_xU)
                       + jnp.sum(nlp.has_dL) + jnp.sum(nlp.has_dU) + nlp.mi)
        alpha_pr = ls.alpha_primal
        big_y = jnp.logical_and(
            y_amax > opts.mult_diverg_y_tol,
            jnp.logical_or(n_bnd_mults == 0, alpha_pr < 1e-2))
        tiny_step_y = jnp.logical_and(alpha_pr < 1e-4, y_amax > 1e4)
        diverged = jnp.logical_and(
            jnp.logical_and(curr_inf2 > opts.mult_diverg_feasibility_tol,
                            trial_inf2 > opts.mult_diverg_feasibility_tol),
            jnp.logical_and(dual_inf > 1e4,
                            jnp.logical_or(big_y, tiny_step_y)))
        ls = ls._replace(accepted=jnp.logical_and(
            ls.accepted, jnp.logical_not(diverged)))
    else:
        ls = line_search(nlp, opts, it, ev_lo, sr, mu, tau, fs_in,
                         st.theta_min, st.theta_max, penalty_nu=st.penalty_nu,
                         corr=corr)
    lrf_next = (ls.last_rej_filter if ls.last_rej_filter is not None
                else jnp.zeros((), bool))

    # --- PerformDualStep: y step size per alpha_for_y ---------------------
    # (IpBacktrackingLineSearch.cpp:908-990; default 'primal' is what the
    # line search already applied; cg-penalty keeps its own acceptor rule.)
    if (opts.alpha_for_y not in ("primal", "acceptor")
            and opts.line_search_method != "cg-penalty"):
        from .linesearch import compute_alpha_for_y
        a_y = compute_alpha_for_y(nlp, opts, it, sr.step, ls.trial,
                                  ls.alpha_primal, ls.alpha_dual)
        ls = ls._replace(trial=ls.trial._replace(
            y_c=it.y_c + a_y * sr.step.y_c,
            y_d=it.y_d + a_y * sr.step.y_d))

    # --- Watchdog (Start/StopWatchDog, IpBacktrackingLineSearch) ----------
    # In watchdog mode the full fraction-to-boundary step is taken on trust;
    # the trial must become acceptable w.r.t. the stored reference point
    # within watchdog_trial_iter_max iterations, else the reference iterate
    # is restored and a regular search resumes from it.
    #
    # LAZY EVALUATION (IpBacktrackingLineSearch.cpp:71-237 activates the
    # watchdog only after shortened steps; the reference never pays an extra
    # trial evaluation when it is idle): the full fraction-to-boundary trial
    # point is exactly the line search's FIRST trial, so theta/phi/f/c/d are
    # reused from there; the extra gradient needed for the soft-restoration
    # primal-dual error is evaluated under lax.cond only when the line search
    # actually failed.
    in_wd = jnp.logical_and(st.wd_active, jnp.logical_not(sr.failed))
    ls_failed = jnp.logical_and(
        jnp.logical_not(jnp.logical_or(ls.accepted, is_tiny)),
        jnp.logical_not(sr.failed))
    from .linesearch import _theta as _theta_norm
    from ..kkt import barrier_obj as _bobj
    ls_has_first = not (opts.inexact_algorithm
                        or opts.line_search_method == "cg-penalty")
    if ls_has_first:
        wd_trial = ls.first_trial
        wd_f, wd_c, wd_d = ls.first_f, ls.first_c, ls.first_d
        wd_theta, wd_phi = ls.first_theta, ls.first_phi
    else:
        # cg-penalty / inexact keep their own acceptors; build + evaluate the
        # full step only when the watchdog or soft restoration needs it.
        from ..kkt import fraction_to_boundary as _ftb
        a_pr_max, a_du_max = _ftb(nlp, it, sr.step, tau)
        wd_trial = jax.tree.map(
            lambda c, d, ap=a_pr_max: c + ap * d, it, sr.step)
        wd_trial = wd_trial._replace(
            z_L=it.z_L + a_du_max * sr.step.z_L,
            z_U=it.z_U + a_du_max * sr.step.z_U,
            v_L=it.v_L + a_du_max * sr.step.v_L,
            v_U=it.v_U + a_du_max * sr.step.v_U)

        def _wd_eval(wt):
            f_w = nlp.eval_f(wt.x)
            c_w = nlp.eval_c(wt.x)
            d_w = nlp.eval_d(wt.x)
            th_w = _theta_norm(nlp, c_w, d_w, wt.s,
                               opts.constraint_violation_norm_type)
            ph_w = _bobj(nlp, wt, f_w, mu, opts.kappa_d)
            return f_w, c_w, d_w, th_w, ph_w

        def _wd_skip(wt):
            big = jnp.asarray(jnp.inf, it.x.dtype)
            return (big, jnp.full_like(ev_lo.c, jnp.inf),
                    jnp.full_like(ev_lo.d, jnp.inf), big, big)

        wd_f, wd_c, wd_d, wd_theta, wd_phi = lax.cond(
            jnp.logical_or(in_wd, ls_failed), _wd_eval, _wd_skip, wd_trial)
    wd_ok = jnp.logical_or(
        wd_theta <= (1.0 - opts.gamma_theta) * st.wd_ref_theta,
        wd_phi <= st.wd_ref_phi - opts.gamma_phi * st.wd_ref_theta)
    wd_exhausted = st.wd_trials + 1 >= opts.watchdog_trial_iter_max

    # --- AcceptTrialPoint -------------------------------------------------
    accepted = jnp.logical_and(ls.accepted, jnp.logical_not(sr.failed))
    # A tiny step is "accepted" as-is (full fraction-to-boundary step) so the
    # algorithm doesn't fall into restoration from a converged-to-roundoff
    # point (IpBacktrackingLineSearch.cpp tiny-step handling).
    accepted = jnp.logical_or(accepted, is_tiny)
    # Watchdog overrides: take the full step on trust, or restore reference.
    wd_restore = jnp.logical_and(in_wd,
                                 jnp.logical_and(jnp.logical_not(wd_ok),
                                                 wd_exhausted))
    accepted = jnp.logical_or(accepted, in_wd)

    # --- Soft restoration (IpBacktrackingLineSearch soft resto:
    #     soft_resto_pderror_reduction_factor): before the full nested
    #     restoration, accept the full fraction-to-boundary step if it reduces
    #     the primal-dual error enough; at most max_soft_resto_iters in a row.
    #     The gradient at the trial point is only evaluated when the line
    #     search actually failed (lax.cond below).
    curr_pd = jnp.maximum(dual_inf, primal_inf)

    def _soft_pd(args):
        wt, f_w, c_w, d_w = args
        res_wd = kkt_residuals(
            nlp, wt,
            Evals(f=f_w, grad_f=nlp.eval_grad_f(wt.x), c=c_w, d=d_w,
                  J_c=None, J_d=None,
                  jc_t=(lambda y, _x=wt.x: jax.vjp(nlp.eval_c, _x)[1](y)[0]),
                  jd_t=(lambda y, _x=wt.x: jax.vjp(nlp.eval_d, _x)[1](y)[0])),
            mu)
        return jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(res_wd.grad_lag_x), initial=0.0),
                        jnp.max(jnp.abs(res_wd.grad_lag_s), initial=0.0)),
            jnp.maximum(jnp.max(jnp.abs(res_wd.c), initial=0.0),
                        jnp.max(jnp.abs(res_wd.d_minus_s), initial=0.0)))

    def _soft_pd_skip(args):
        return jnp.asarray(jnp.inf, it.x.dtype)

    wd_pd = lax.cond(ls_failed, _soft_pd, _soft_pd_skip,
                     (wd_trial, wd_f, wd_c, wd_d))
    soft_ok = jnp.logical_and(
        jnp.logical_and(jnp.logical_not(accepted),
                        jnp.logical_not(sr.failed)),
        jnp.logical_and(
            wd_pd <= opts.soft_resto_pderror_reduction_factor * curr_pd,
            st.soft_resto_count < opts.max_soft_resto_iters))
    soft_count = jnp.where(soft_ok, st.soft_resto_count + 1, 0)
    accepted = jnp.logical_or(accepted, soft_ok)

    # --- Forced restoration entries (IpBacktrackingLineSearch.cpp:332-345,
    #     788-793): start_with_resto skips the first line search entirely;
    #     expect_infeasible_problem jumps to restoration when the multipliers
    #     blow past ytol, or after >= 5 consecutive shortened steps unless
    #     the first trial was just accepted in full.
    force_resto = jnp.zeros((), bool)
    if enable_resto and opts.start_with_resto:
        force_resto = jnp.logical_or(force_resto, st.iter_count == 0)
    if enable_resto and opts.expect_infeasible_problem:
        y_amax = jnp.maximum(jnp.max(jnp.abs(it.y_c), initial=0.0),
                             jnp.max(jnp.abs(it.y_d), initial=0.0))
        force_resto = jnp.logical_or(
            force_resto,
            jnp.logical_and(st.eip_active,
                            y_amax > opts.expect_infeasible_problem_ytol))
        full_first = jnp.logical_and(ls.accepted, ls.n_backtracks <= 1)
        force_resto = jnp.logical_or(
            force_resto,
            jnp.logical_and(
                jnp.logical_and(st.eip_active, st.wd_shortened_count >= 5),
                jnp.logical_not(full_first)))
    accepted = jnp.logical_and(accepted, jnp.logical_not(force_resto))
    new_it = jax.tree.map(lambda a, b: jnp.where(accepted, b, a), it, ls.trial)
    # watchdog mode / soft restoration: the trusted full step (suppressed
    # when a forced restoration entry fires)
    take_full = jnp.logical_and(jnp.logical_or(in_wd, soft_ok),
                                jnp.logical_not(force_resto))
    new_it = jax.tree.map(lambda a, b: jnp.where(take_full, b, a), new_it, wd_trial)
    new_it = jax.tree.map(lambda a, b: jnp.where(wd_restore, b, a),
                          new_it, st.wd_ref)
    # slack_move (IpIpoptCalculatedQuantities.cpp:164-171,520-528): if an
    # inequality slack became nonpositive through roundoff, push s back to a
    # small interior distance.  (x-bound slacks stay positive through
    # bound_relax_factor + fraction-to-boundary; s is ours to move.)
    if opts.slack_move > 0.0:
        move_L = opts.slack_move * jnp.maximum(1.0, jnp.abs(nlp.d_L))
        move_U = opts.slack_move * jnp.maximum(1.0, jnp.abs(nlp.d_U))
        s_fix = new_it.s
        s_fix = jnp.where(
            jnp.logical_and(nlp.has_dL, s_fix - nlp.d_L <= 0.0),
            nlp.d_L + move_L, s_fix)
        s_fix = jnp.where(
            jnp.logical_and(nlp.has_dU, nlp.d_U - s_fix <= 0.0),
            nlp.d_U - move_U, s_fix)
        new_it = new_it._replace(s=s_fix)
    new_it = _kappa_sigma_clip(nlp, new_it, mu, opts.kappa_sigma)

    # --- Fallback: restoration phase (IpIpoptAlg.cpp:384
    #     ActivateFallbackMechanism -> MinC_1NrmRestorationPhase) ----------
    need_resto = jnp.logical_not(accepted)
    status = st.status
    extra_iters = jnp.zeros((), jnp.int32)
    resto_obj_evals = None  # set only when the resto block traces the evals
    fs_after = ls.filter
    resto_count = st.restoration_count

    # Unconstrained problems cannot be infeasible — the restoration NLP would
    # be the original problem; skip tracing the nested solver entirely.
    if enable_resto and nlp.struct.me + nlp.struct.mi == 0:
        enable_resto = False
    from .step import _backend
    if not opts.resto_phase:
        enable_resto = False
    if enable_resto and _backend(nlp) in ("banded", "nd") and getattr(
            nlp.chain, "_resto_info", None) is None:
        # a hand-built banded CanonicalNLP without the resto symbolic
        # analysis (e.g. the resto NLP itself) cannot nest another resto
        enable_resto = False

    if enable_resto:
        from .linesearch import filter_augment

        resto_opts = opts.resto_options()
        # Entering restoration augments the outer filter with the current
        # point so the algorithm cannot return to it (A-9).
        fs_entry = filter_augment(fs_in, ls.theta_curr, ls.phi_curr,
                                  opts.gamma_theta, opts.gamma_phi)
        if _backend(nlp) == "btd":
            from .chained_resto import perform_restoration_chained
            rr = perform_restoration_chained(
                nlp, opts, resto_opts, it, ev_lo, mu, fs_entry,
                ls.theta_curr, ls.phi_curr, ipm_step, active=need_resto)
        elif _backend(nlp) == "arrow":
            from .arrow_resto import perform_restoration_arrow
            rr = perform_restoration_arrow(
                nlp, opts, resto_opts, it, ev_lo, mu, fs_entry,
                ls.theta_curr, ls.phi_curr, ipm_step, active=need_resto)
        elif _backend(nlp) in ("banded", "nd"):
            from .banded_resto import perform_restoration_banded
            rr = perform_restoration_banded(
                nlp, opts, resto_opts, it, ev_lo, mu, fs_entry,
                ls.theta_curr, ls.phi_curr, ipm_step, active=need_resto)
        else:
            from .restoration import build_resto_nlp, perform_restoration
            resto_nlp = build_resto_nlp(nlp, opts)
            rr = perform_restoration(
                nlp, resto_nlp, opts, resto_opts, it, ev_lo, mu, fs_entry,
                ls.theta_curr, ls.phi_curr, ipm_step, active=need_resto)
        new_it = jax.tree.map(lambda a, b: jnp.where(need_resto, b, a),
                              new_it, rr.it)
        fs_after = jax.tree.map(lambda a, b: jnp.where(need_resto, b, a),
                                ls.filter, fs_entry)
        status = jnp.where(
            jnp.logical_and(need_resto, rr.locally_infeasible),
            int(SolverReturn.LOCAL_INFEASIBILITY), status)
        status = jnp.where(jnp.logical_and(need_resto, rr.failed),
                           int(SolverReturn.RESTORATION_FAILURE), status)
        # resto_failure_feasibility_threshold (IpIpoptAlg.cpp:112-118): a
        # restoration exit that left the primal infeasibility above the
        # threshold (default 0 -> 1e2 * tol) WITHOUT meaningful feasibility
        # progress over the entry point is declared a restoration failure
        # (the reference ties this to the resto's acceptable-level exit; the
        # no-progress condition is the jit-compatible equivalent guard).
        rf_thresh = opts.resto_failure_feasibility_threshold
        if rf_thresh <= 0.0:
            rf_thresh = 1e2 * opts.tol
        theta_back = jnp.maximum(
            jnp.max(jnp.abs(nlp.eval_c(rr.it.x)), initial=0.0),
            jnp.max(jnp.abs(nlp.eval_d(rr.it.x) - rr.it.s), initial=0.0))
        status = jnp.where(
            jnp.logical_and(
                jnp.logical_and(need_resto, rr.success),
                jnp.logical_and(theta_back > rf_thresh,
                                theta_back > 0.9 * ls.theta_curr)),
            int(SolverReturn.RESTORATION_FAILURE), status)
        extra_iters = jnp.where(need_resto, rr.resto_iters, 0)
        if opts.evaluate_orig_obj_at_resto_trial:
            # RestoIpoptNLP::f with orig-obj evaluation at every resto trial
            # point (IpRestoIpoptNLP.cpp:44-56): one extra original-objective
            # evaluation per restoration iteration shows up in the counters.
            resto_obj_evals = extra_iters
        resto_count = resto_count + jnp.where(need_resto, 1, 0)
        if opts.line_search_method == "cg-penalty":
            # Penalty re-initialization on restoration return
            # (IpCGSearchDirCalc.cpp:208-217): nu = clamp(pen_init_fac *
            # 0.1^restor_counter, 10, 1e6) for both penalty parameters.
            pen_new = jnp.clip(
                opts.pen_init_fac
                * jnp.power(0.1, st.restoration_count.astype(it.x.dtype)),
                1e1, 1e6)
            cg_state = cg_state._replace(
                penalty=jnp.where(need_resto, pen_new, cg_state.penalty),
                kkt_penalty=jnp.where(need_resto, pen_new,
                                      cg_state.kkt_penalty))
    else:
        status = jnp.where(jnp.logical_and(need_resto, sr.failed),
                           int(SolverReturn.ERROR_IN_STEP_COMPUTATION), status)
        status = jnp.where(jnp.logical_and(need_resto,
                                           jnp.logical_not(sr.failed)),
                           int(SolverReturn.RESTORATION_FAILURE), status)

    step_norm = jnp.maximum(jnp.max(jnp.abs(sr.step.x), initial=0.0),
                            jnp.max(jnp.abs(sr.step.s), initial=0.0))

    if opts.print_level >= 4 or (opts.output_file
                                 and opts.file_print_level >= 4):
        # inf_pr_output (IpOrigIterationOutput.cpp): 'original' = unscaled
        # max-norm violation; 'internal' = the line-search theta norm.
        inf_pr_show = (ls.theta_curr if opts.inf_pr_output == "internal"
                       else primal_inf)
        # step-type tag (see _STEP_TAGS)
        tag = jnp.where(ls.ftype, jnp.where(ls.used_soc, 1, 0),
                        jnp.where(ls.used_soc, 3, 2)).astype(jnp.int32)
        tag = jnp.where(in_wd, 5, tag)
        tag = jnp.where(wd_restore, 4, tag)
        tag = jnp.where(soft_ok, 6, tag)
        tag = jnp.where(jnp.logical_not(accepted), 8, tag)
        tag = jnp.where(need_resto, 7, tag)
        bits = ((sr.residual_ratio > opts.residual_ratio_max).astype(jnp.int32)
                | ((sr.num_trials > 1).astype(jnp.int32) << 1)
                | (st.wd_active.astype(jnp.int32) << 2))
        _print_iter(st.iter_count, ev.f, inf_pr_show, dual_inf, mu, step_norm,
                    sr.delta_x, ls.alpha_dual, ls.alpha_primal,
                    ls.n_backtracks, print_freq=opts.print_frequency_iter,
                    tag_code=tag, info_bits=bits,
                    print_info_string=opts.print_info_string,
                    print_freq_time=opts.print_frequency_time)

    # --- intermediate_callback (TNLP::intermediate_callback parity,
    #     IpTNLP.hpp:665: per-iteration user hook with premature stop) -----
    from ..options import CALLBACK_REGISTRY
    user_cb = CALLBACK_REGISTRY.get(opts.callback_token)
    if user_cb is not None:
        from jax.experimental import io_callback

        if opts.callback_curr_iterate:
            # get_curr_iterate / get_curr_violations parity (IpTNLP.hpp:665-793
            # and the reference's test/getcurr.cpp regression): hand the user
            # the current primal-dual point in *user* space plus the raw
            # violation blocks alongside the scalar diagnostics.
            def _cb(i, f, pr, du, m_, apr, adu, lsn, x_full, s_, y_c_, y_d_,
                    z_L_, z_U_, glx, cxl, cxu, csl, csu, c_, dms_):
                keep = user_cb(
                    iter_count=int(i), obj_value=float(f),
                    inf_pr=float(pr), inf_du=float(du), mu=float(m_),
                    alpha_pr=float(apr), alpha_du=float(adu),
                    ls_trials=int(lsn),
                    curr_iterate=dict(
                        x=np.asarray(x_full), s=np.asarray(s_),
                        y_c=np.asarray(y_c_), y_d=np.asarray(y_d_),
                        z_L=np.asarray(z_L_), z_U=np.asarray(z_U_)),
                    curr_violations=dict(
                        grad_lag_x=np.asarray(glx),
                        compl_x_L=np.asarray(cxl), compl_x_U=np.asarray(cxu),
                        compl_s_L=np.asarray(csl), compl_s_U=np.asarray(csu),
                        c_violation=np.asarray(c_),
                        d_minus_s=np.asarray(dms_)))
                return np.bool_(keep is not False)

            keep_going = io_callback(
                _cb, jax.ShapeDtypeStruct((), bool),
                st.iter_count, ev.f, primal_inf, dual_inf, mu,
                ls.alpha_primal, ls.alpha_dual, ls.n_backtracks,
                nlp.x_full(it.x), it.s, it.y_c, it.y_d, it.z_L, it.z_U,
                res0.grad_lag_x, res0.compl_x_L, res0.compl_x_U,
                res0.compl_s_L, res0.compl_s_U, ev.c, ev.d - it.s,
                ordered=True)
        else:
            def _cb(i, f, pr, du, m_, apr, adu, lsn):
                keep = user_cb(iter_count=int(i), obj_value=float(f),
                               inf_pr=float(pr), inf_du=float(du), mu=float(m_),
                               alpha_pr=float(apr), alpha_du=float(adu),
                               ls_trials=int(lsn))
                return np.bool_(keep is not False)

            keep_going = io_callback(_cb, jax.ShapeDtypeStruct((), bool),
                                     st.iter_count, ev.f, primal_inf, dual_inf,
                                     mu, ls.alpha_primal, ls.alpha_dual,
                                     ls.n_backtracks, ordered=True)
        status = jnp.where(jnp.logical_and(
            status == int(SolverReturn.CONTINUE),
            jnp.logical_not(keep_going)),
            int(SolverReturn.USER_REQUESTED_STOP), status)

    # --- adaptive_mu_restore_previous_iterate (IpAdaptiveMuUpdate.cpp:
    #     362-370): when the globalization just fell back to monotone mode,
    #     restart it from the most recent accepted point.  (The reference
    #     restores before computing the step; here the restore replaces this
    #     iteration's move — one extra outer iteration, same effect.)
    if (opts.adaptive_mu_restore_previous_iterate
            and (opts.mu_strategy == "adaptive" or opts.mehrotra_algorithm)):
        new_it = jax.tree.map(
            lambda cur, saved: jnp.where(ams.just_switched, saved, cur),
            new_it, st.accepted_point)

    # --- CheckConvergence at the NEW point --------------------------------
    ev_new = evaluate(nlp, new_it.x.astype(_acc))

    # --- Watchdog bookkeeping ---------------------------------------------
    wd_enabled = opts.watchdog_shortened_iter_trigger > 0
    shortened = jnp.logical_and(accepted, ls.n_backtracks > 1)
    new_short_count = jnp.where(
        jnp.logical_or(in_wd, jnp.logical_not(shortened)),
        0, st.wd_shortened_count + 1)
    activate = jnp.logical_and(
        wd_enabled,
        jnp.logical_and(jnp.logical_not(in_wd),
                        new_short_count >= opts.watchdog_shortened_iter_trigger))
    if opts.expect_infeasible_problem:
        # the watchdog is suppressed while the infeasibility heuristic is
        # armed (IpBacktrackingLineSearch.cpp:367)
        activate = jnp.logical_and(activate, jnp.logical_not(st.eip_active))
    wd_done = jnp.logical_or(wd_ok, wd_restore)
    wd_active_next = jnp.where(in_wd, jnp.logical_not(wd_done), activate)
    wd_trials_next = jnp.where(jnp.logical_and(in_wd, jnp.logical_not(wd_done)),
                               st.wd_trials + 1, 0)
    from .linesearch import _theta as _th
    theta_new = _th(nlp, ev_new.c, ev_new.d, new_it.s,
                    opts.constraint_violation_norm_type).astype(_model)
    phi_new = kkt.barrier_obj(nlp, new_it, ev_new.f, mu,
                              opts.kappa_d).astype(_model)
    wd_ref_next = jax.tree.map(lambda a, b: jnp.where(activate, b, a),
                               st.wd_ref, new_it)
    wd_ref_theta_next = jnp.where(activate, theta_new, st.wd_ref_theta)
    wd_ref_phi_next = jnp.where(activate, phi_new, st.wd_ref_phi)
    new_short_count = jnp.where(activate, 0, new_short_count)

    # --- recalc_y (IpIpoptAlg.cpp:774-811): once nearly feasible, replace
    #     y_c/y_d by the least-squares multipliers at the accepted point.
    #     Reference default: off, auto-enabled for limited-memory Hessians
    #     (IpIpoptAlg.cpp:232-246) — here strictly option-driven (recalc_y).
    _recalc = (opts.recalc_y and nlp.chain is None
               and nlp.struct.me + nlp.struct.mi > 0
               and not opts.inexact_algorithm)
    if _recalc:
        from .init import least_squares_y as _lsy

        def _rc_yes(args):
            ni, gf, Jc, Jd = args
            return _lsy(nlp, ni.x, ni.s, gf, Jc, Jd,
                        ni.z_L, ni.z_U, ni.v_L, ni.v_U,
                        jnp.asarray(jnp.inf, ni.x.dtype))

        def _rc_no(args):
            ni = args[0]
            return ni.y_c, ni.y_d

        theta_acc = _theta_norm(nlp, ev_new.c, ev_new.d, new_it.s,
                                opts.constraint_violation_norm_type)
        y_c2, y_d2 = lax.cond(theta_acc < opts.recalc_y_feas_tol,
                              _rc_yes, _rc_no,
                              (new_it, ev_new.grad_f.astype(_model),
                               ev_new.J_c.astype(_model),
                               ev_new.J_d.astype(_model)))
        new_it = new_it._replace(y_c=y_c2.astype(_model),
                                 y_d=y_d2.astype(_model))

    # --- expect_infeasible_problem heuristic state: disarm once the
    #     violation dropped below ctol, or after a restoration entry
    #     (IpBacktrackingLineSearch.cpp:615-652).
    eip_next = st.eip_active
    if opts.expect_infeasible_problem:
        theta_eip = _theta_norm(nlp, ev_new.c, ev_new.d, new_it.s,
                                opts.constraint_violation_norm_type)
        eip_next = jnp.logical_and(
            eip_next, theta_eip > opts.expect_infeasible_problem_ctol)
        eip_next = jnp.logical_and(eip_next, jnp.logical_not(need_resto))

    # --- L-BFGS pair update (LimMemQuasiNewtonUpdater) --------------------
    lbfgs = st.lbfgs
    if opts.hessian_approximation == "limited-memory":
        from .quasi_newton import lbfgs_update
        gl_new = (ev_new.grad_f + ev_new.jc_t(new_it.y_c)
                  + ev_new.jd_t(new_it.y_d))
        gl_old = (ev.grad_f + ev.jc_t(new_it.y_c) + ev.jd_t(new_it.y_d))
        s_vec = new_it.x - it.x
        y_vec = (gl_new - gl_old).astype(_model)
        if (opts.num_linear_variables > 0
                and opts.hessian_approximation_space == "nonlinear-variables"):
            # hessian_approximation_space (IpOrigIpoptNLP.cpp:124-130) +
            # num_linear_variables (IpTNLPAdapter.cpp:2298-2315): the FIRST
            # num_linear_variables variables are linear — the quasi-Newton
            # approximation acts only on the nonlinear block (a truly linear
            # variable has exactly zero Lagrangian-Hessian rows).
            nl_mask_full = np.arange(nlp.struct.n_full) >= \
                opts.num_linear_variables
            nl_mask = jnp.asarray(
                nl_mask_full[np.asarray(nlp.struct.free_idx)]
                if nlp.struct.n != nlp.struct.n_full else nl_mask_full,
                s_vec.dtype)
            s_vec = s_vec * nl_mask
            y_vec = y_vec * nl_mask
        upd = lbfgs_update(lbfgs, s_vec, y_vec, opts)
        lbfgs = jax.tree.map(lambda a, b: jnp.where(accepted, b, a), lbfgs, upd)
    res_new = kkt_residuals(nlp, new_it, ev_new, 0.0)
    E, d_inf, p_inf, c_inf = optimality_error(nlp, new_it, res_new, opts.s_max)
    # acceptable_obj_change_tol (IpOptErrorConvCheck.cpp:221-235): relative
    # objective change between consecutive accepted iterates.
    obj_change_rel = (jnp.abs(ev_new.f - ev.f)
                      / jnp.maximum(1.0, jnp.abs(ev_new.f)))
    conv = check_convergence(opts, st.iter_count + 1, st.acceptable_count,
                             E, d_inf, p_inf, c_inf,
                             jnp.max(jnp.abs(new_it.x), initial=0.0),
                             obj_change_rel=obj_change_rel)
    status = jnp.where(status == int(SolverReturn.CONTINUE), conv.status, status)
    status = jnp.where(
        jnp.logical_and(status == int(SolverReturn.CONTINUE), tiny_count >= 2),
        int(SolverReturn.STOP_AT_TINY_STEP), status)
    # INVALID_NUMBER_DETECTED (Eval_Error handling, IpIpoptAlg.cpp:531-537 +
    # HasValidNumbers guards, IpVector.hpp:386): a NaN/Inf at the *accepted*
    # iterate is unrecoverable — trial-point NaNs are already rejected by the
    # filter comparisons.
    finite_ok = jnp.logical_and(
        jnp.logical_and(jnp.isfinite(ev_new.f),
                        jnp.all(jnp.isfinite(new_it.x))),
        jnp.logical_and(jnp.all(jnp.isfinite(ev_new.c)),
                        jnp.logical_and(jnp.all(jnp.isfinite(ev_new.d)),
                                        jnp.all(jnp.isfinite(ev_new.grad_f)))))
    if opts.check_derivatives_for_naninf:
        # check_derivatives_for_naninf (TNLPAdapter::CheckDerivatives...,
        # IpTNLPAdapter.cpp:1180): probe the Jacobian and Lagrangian-Hessian
        # actions for non-finite entries at the accepted point (matrix-free:
        # J 1 and W 1 hit every stored entry).
        ones = jnp.ones_like(new_it.x)
        jc1 = jax.jvp(nlp.eval_c, (new_it.x,), (ones,))[1]
        jd1 = jax.jvp(nlp.eval_d, (new_it.x,), (ones,))[1]

        def glag(xx):
            val = nlp.eval_f(xx)
            if nlp.struct.me:
                val = val + jnp.dot(new_it.y_c, nlp.eval_c(xx))
            if nlp.struct.mi:
                val = val + jnp.dot(new_it.y_d, nlp.eval_d(xx))
            return val

        w1 = jax.jvp(jax.grad(glag), (new_it.x,), (ones,))[1]
        finite_ok = jnp.logical_and(
            finite_ok,
            jnp.logical_and(jnp.all(jnp.isfinite(jc1)),
                            jnp.logical_and(jnp.all(jnp.isfinite(jd1)),
                                            jnp.all(jnp.isfinite(w1)))))
    status = jnp.where(
        jnp.logical_and(status == int(SolverReturn.CONTINUE),
                        jnp.logical_not(finite_ok)),
        int(SolverReturn.INVALID_NUMBER_DETECTED), status)

    return IPMState(
        it=new_it, mu=mu, tau=tau,
        iter_count=st.iter_count + 1 + extra_iters,
        delta_w_last=sr.delta_w_last, fs=fs_after,
        theta_min=st.theta_min, theta_max=st.theta_max, status=status,
        acceptable_count=conv.acceptable_count,
        last_alpha_pr=ls.alpha_primal, last_alpha_du=ls.alpha_dual,
        last_ls_count=ls.n_backtracks, last_delta_x=sr.delta_x,
        last_step_norm=step_norm, restoration_count=resto_count, ams=ams,
        lbfgs=lbfgs, tiny_step_count=tiny_count,
        wd_active=wd_active_next, wd_trials=wd_trials_next,
        wd_shortened_count=new_short_count, wd_ref=wd_ref_next,
        wd_ref_theta=wd_ref_theta_next, wd_ref_phi=wd_ref_phi_next,
        penalty_nu=ls.penalty_nu,
        soft_resto_count=soft_count,
        cg=cg_state,
        tr_omega=new_tr_omega,
        nu_low=nu_low_state,
        inx_cn=inx_cn_next,
        ev=_cache_from_evals(ev_new),
        eip_active=eip_next,
        filter_rej_count=frc_next,
        n_filter_resets=nfr_next,
        last_rej_filter=lrf_next,
        accepted_point=st.it,
        # Real evaluation counts (IpOrigIpoptNLP.hpp:316-342): one full
        # evaluation at the new accepted point, plus the line-search trials
        # (incl. SOC rounds), plus the lazily-evaluated watchdog point.
        counters=Counters(
            n_obj_evals=_add_opt(
                st.counters.n_obj_evals + 1 + ls.n_evals
                + jnp.where(jnp.logical_and(
                    jnp.asarray(not ls_has_first),
                    jnp.logical_or(in_wd, ls_failed)), 1, 0),
                resto_obj_evals),
            n_grad_evals=(st.counters.n_grad_evals + 1
                          + jnp.where(ls_failed, 1, 0)),
            n_hess_evals=st.counters.n_hess_evals + jnp.asarray(
                1 if _exact_hessian else 0, jnp.int32),
            n_factorizations=st.counters.n_factorizations + sr.num_trials,
            n_kkt_solves=(st.counters.n_kkt_solves + 1 + ls.n_soc_rounds
                          + jnp.asarray(_extra_solves, jnp.int32))))


def initial_state(nlp: CanonicalNLP, opts: Options,
                  it0: Optional[Iterate] = None) -> IPMState:
    dtype = nlp.x0.dtype
    if it0 is None:
        it = default_initialize(nlp, opts)
    elif opts.warm_start_init_point:
        it = warm_start_initialize(nlp, opts, it0)
    else:
        it = it0
    # warm_start_target_mu (IpWarmStartIterateInitializer.cpp): re-target the
    # barrier parameter on warm starts instead of restarting from mu_init.
    if it0 is not None and opts.warm_start_target_mu > 0.0:
        opts = opts.replace(mu_init=opts.warm_start_target_mu)
    from .step import _backend as _be0
    _hp0 = (opts.refinement_precision == "double"
            and _be0(nlp) in ("dense", "btd", "banded")
            and not opts.inexact_algorithm
            and opts.line_search_method != "cg-penalty"
            and opts.linear_solver not in ("minres", "custom"))
    ev = evaluate(nlp, it.x.astype(jnp.float64) if _hp0 else it.x)
    from .linesearch import _theta as _th0
    theta0 = _th0(nlp, ev.c, ev.d, it.s,
                  opts.constraint_violation_norm_type).astype(dtype)
    theta_min = opts.theta_min_fact * jnp.maximum(1.0, theta0)
    theta_max = opts.theta_max_fact * jnp.maximum(1.0, theta0)
    ms = mu_init_state(opts, dtype)
    z = jnp.zeros((), dtype)
    return IPMState(
        it=it, mu=ms.mu, tau=ms.tau,
        iter_count=jnp.zeros((), jnp.int32),
        delta_w_last=z, fs=filter_init(opts.max_filter_size, dtype),
        theta_min=theta_min, theta_max=theta_max,
        status=jnp.full((), int(SolverReturn.CONTINUE), jnp.int32),
        acceptable_count=jnp.zeros((), jnp.int32),
        last_alpha_pr=z, last_alpha_du=z,
        last_ls_count=jnp.zeros((), jnp.int32), last_delta_x=z,
        last_step_norm=z, restoration_count=jnp.zeros((), jnp.int32),
        ams=adaptive_mu_init(dtype),
        lbfgs=lbfgs_init(
            nlp.n,
            opts.limited_memory_max_history
            if opts.hessian_approximation == "limited-memory" else 0,
            dtype, opts.limited_memory_init_val),
        tiny_step_count=jnp.zeros((), jnp.int32),
        wd_active=jnp.zeros((), bool), wd_trials=jnp.zeros((), jnp.int32),
        wd_shortened_count=jnp.zeros((), jnp.int32), wd_ref=it,
        wd_ref_theta=jnp.asarray(jnp.inf, dtype),
        wd_ref_phi=jnp.asarray(jnp.inf, dtype),
        penalty_nu=jnp.asarray(
            opts.nu_init if opts.inexact_algorithm else 1.0, dtype),
        soft_resto_count=jnp.zeros((), jnp.int32),
        cg=_cg_init(opts, dtype),
        tr_omega=jnp.asarray(opts.omega_init, dtype),
        nu_low=jnp.asarray(opts.nu_low_init, dtype),
        inx_cn=(_inx_cn0(opts) if opts.inexact_algorithm else None),
        ev=_cache_from_evals(ev),
        counters=counters_init(),
        **robust_state_init(opts, it))


def _initial_check(nlp: CanonicalNLP, opts: Options, st: IPMState) -> IPMState:
    """The convergence check before the first iteration (IpIpoptAlg.cpp:343)."""
    ev = _evals_from_cache(nlp, st.it.x, st.ev)
    res = kkt_residuals(nlp, st.it, ev, 0.0)
    E, d_inf, p_inf, c_inf = optimality_error(nlp, st.it, res, opts.s_max)
    conv = check_convergence(opts, st.iter_count, st.acceptable_count,
                             E, d_inf, p_inf, c_inf,
                             jnp.max(jnp.abs(st.it.x), initial=0.0))
    return st._replace(status=jnp.where(
        jnp.logical_and(st.status == int(SolverReturn.CONTINUE),
                        conv.status == int(SolverReturn.SUCCESS)),
        conv.status, st.status))


def run_ipm(nlp: CanonicalNLP, opts: Options, st: IPMState) -> IPMState:
    """The outer while_loop.  Also performs the initial convergence check
    (IpIpoptAlg.cpp:343)."""
    st = _initial_check(nlp, opts, st)

    def cond(s: IPMState):
        return s.status == int(SolverReturn.CONTINUE)

    def body(s: IPMState):
        return ipm_step_with_resto(nlp, opts, s)

    return lax.while_loop(cond, body, st)


@partial(jax.jit, static_argnames=("opts",))
def _start_state(nlp: CanonicalNLP, opts: Options,
                 it0: Optional[Iterate] = None) -> IPMState:
    return _initial_check(nlp, opts, initial_state(nlp, opts, it0))


@partial(jax.jit, static_argnames=("opts",))
def _run_ipm_bounded(nlp: CanonicalNLP, opts: Options, st: IPMState,
                     iter_stop) -> IPMState:
    """run_ipm with a dynamic iteration ceiling — the host-chunked driver for
    max_wall_time / max_cpu_time enforcement (the axon TPU platform has no
    host callbacks, so wall/cpu clocks are checked between chunks)."""

    def cond(s: IPMState):
        return jnp.logical_and(s.status == int(SolverReturn.CONTINUE),
                               s.iter_count < iter_stop)

    def body(s: IPMState):
        return ipm_step_with_resto(nlp, opts, s)

    return lax.while_loop(cond, body, st)


@partial(jax.jit, static_argnames=("opts",))
def _finalize_jit(nlp: CanonicalNLP, opts: Options, st: IPMState) -> SolveResult:
    return finalize(nlp, opts, st)


def _solve_time_limited(cnlp: CanonicalNLP, opts: Options, it0=None,
                        chunk: int = 5) -> SolveResult:
    """Run the IPM in host-side chunks of ``chunk`` iterations, checking the
    wall/CPU clocks between chunks (OptErrorConvCheck's max_wall_time /
    max_cpu_time, IpOptErrorConvCheck.cpp:167-213).  The first chunk includes
    compile time, exactly like the reference includes symbolic-factorization
    time in its budget."""
    import time as _time
    t0_wall = _time.perf_counter()
    t0_cpu = _time.process_time()
    st = _start_state(cnlp, opts, it0)
    while True:
        status = int(jax.device_get(st.status))
        if status != int(SolverReturn.CONTINUE):
            break
        if _time.perf_counter() - t0_wall > opts.max_wall_time:
            st = st._replace(status=jnp.full(
                (), int(SolverReturn.WALLTIME_EXCEEDED), jnp.int32))
            break
        if _time.process_time() - t0_cpu > opts.max_cpu_time:
            st = st._replace(status=jnp.full(
                (), int(SolverReturn.CPUTIME_EXCEEDED), jnp.int32))
            break
        st = _run_ipm_bounded(cnlp, opts, st, st.iter_count + chunk)
    return _finalize_jit(cnlp, opts, st)


def finalize(nlp: CanonicalNLP, opts: Options, st: IPMState) -> SolveResult:
    """Build the SolveResult: map back to user space, unscale, final stats."""
    it = st.it
    x_user = nlp.x_full(it.x)
    if opts.honor_original_bounds:
        xr = jnp.where(nlp.has_xL, jnp.maximum(it.x, nlp.x_L_orig), it.x)
        xr = jnp.where(nlp.has_xU, jnp.minimum(xr, nlp.x_U_orig), xr)
        x_user = nlp.x_full(xr)
    ev = _evals_from_cache(nlp, it.x, st.ev)
    res = kkt_residuals(nlp, it, ev, 0.0)
    E, d_inf, p_inf, c_inf = optimality_error(nlp, it, res, opts.s_max)
    # user-order constraint values and multipliers
    s = nlp.struct
    m = s.m
    # Identity fast paths mirror CanonicalNLP._g_split: for pure-equality
    # (or pure-inequality) problems the row order is the identity by
    # construction, so skip the index scatters — at n = 1e6 the embedded
    # (m,) index constants alone would blow up the lowered module (the
    # remote-compile relay rejects oversized HLO payloads).
    if s.me == s.m and s.mi == 0:
        g = ev.c / nlp.c_scale + nlp.c_rhs
        y = it.y_c * nlp.c_scale / nlp.obj_scale
    elif s.mi == s.m and s.me == 0:
        g = ev.d / nlp.d_scale
        y = it.y_d * nlp.d_scale / nlp.obj_scale
    else:
        g = jnp.zeros((m,), it.x.dtype)
        y = jnp.zeros((m,), it.x.dtype)
        if s.me:
            g = g.at[jnp.asarray(s.eq_idx)].set(ev.c / nlp.c_scale + nlp.c_rhs)
            y = y.at[jnp.asarray(s.eq_idx)].set(it.y_c * nlp.c_scale / nlp.obj_scale)
        if s.mi:
            g = g.at[jnp.asarray(s.ineq_idx)].set(ev.d / nlp.d_scale)
            y = y.at[jnp.asarray(s.ineq_idx)].set(it.y_d * nlp.d_scale / nlp.obj_scale)
    if s.n == s.n_full:
        zl_full = it.z_L / nlp.obj_scale
        zu_full = it.z_U / nlp.obj_scale
    else:
        zl_full = jnp.zeros((s.n_full,), it.x.dtype).at[jnp.asarray(s.free_idx)].set(
            it.z_L / nlp.obj_scale)
        zu_full = jnp.zeros((s.n_full,), it.x.dtype).at[jnp.asarray(s.free_idx)].set(
            it.z_U / nlp.obj_scale)
    return SolveResult(
        x=x_user, obj=ev.f / nlp.obj_scale, status=st.status,
        iter_count=st.iter_count, mu=st.mu, g=g, y=y, z_L=zl_full, z_U=zu_full,
        dual_inf=d_inf, primal_inf=p_inf, compl_inf=c_inf, E_scaled=E,
        iterate=it, counters=st.counters,
        restoration_count=st.restoration_count)


@partial(jax.jit, static_argnames=("opts",))
def _solve_canonical(nlp: CanonicalNLP, opts: Options,
                     it0: Optional[Iterate] = None) -> SolveResult:
    st = initial_state(nlp, opts, it0)
    st = run_ipm(nlp, opts, st)
    return finalize(nlp, opts, st)


def solve(problem, options: Optional[Options] = None, it0=None,
          intermediate_callback=None, custom_kkt_solver=None,
          finalize_solution=None,
          **option_kwargs) -> SolveResult:
    """Top-level entry (IpoptApplication::OptimizeTNLP equivalent).

    ``problem`` may be an ``NLP`` (user spec), a ``ChainedNLP``, a
    ``ScenarioNLP``, or an already-canonicalized ``CanonicalNLP``.  Extra
    keyword arguments are option overrides by their Ipopt names, e.g.
    ``solve(nlp, tol=1e-6, mu_strategy="monotone")``.

    ``intermediate_callback(iter_count=, obj_value=, inf_pr=, inf_du=, mu=,
    alpha_pr=, alpha_du=, ls_trials=)`` is invoked once per iteration
    (TNLP::intermediate_callback parity); returning False requests a stop
    (USER_REQUESTED_STOP).
    """
    opts = options or Options()
    if option_kwargs:
        opts = opts.replace(**option_kwargs)
    # ipopt.opt-style options file (OptionsList::ReadFromStream via
    # IpoptApplication::Initialize, IpIpoptApplication.cpp:160-347).  File
    # values fill in options still at their defaults; explicitly-set values
    # (the options object / kwargs) win, matching allow_clobber=false.
    if opts.option_file_name:
        import os as _os
        if _os.path.exists(opts.option_file_name):
            from ..options import parse_options_file
            file_vals = parse_options_file(
                open(opts.option_file_name).read())
            defaults = Options()
            fill = {k: v for k, v in file_vals.items()
                    if getattr(opts, k) == getattr(defaults, k)}
            if fill:
                opts = opts.replace(**fill)
    if opts.suppress_all_output:
        opts = opts.replace(print_level=0, file_print_level=0,
                            print_timing_statistics=False)
    from ..journalist import (configure_from_options, EJournalLevel,
                              EJournalCategory)
    jnlst = configure_from_options(opts)
    if opts.print_user_options and opts.print_level > 0:
        defaults = Options()
        for f_ in dataclasses.fields(opts):
            cur = getattr(opts, f_.name)
            if cur != getattr(defaults, f_.name):
                jnlst.printf(EJournalLevel.J_SUMMARY, EJournalCategory.J_MAIN,
                             f"  {f_.name} = {cur}\n")
    if opts.print_options_documentation and opts.print_level > 0:
        from ..options import print_options_documentation as _pod
        jnlst.printf(EJournalLevel.J_SUMMARY, EJournalCategory.J_MAIN,
                     _pod(mode=opts.print_options_mode,
                          advanced=opts.print_advanced_options) + "\n")
    if intermediate_callback is not None:
        from ..options import register_callback
        opts = opts.replace(
            callback_token=register_callback(intermediate_callback))
    if custom_kkt_solver is not None:
        # user-pluggable KKT solver (GenKKTSolverInterface hook)
        from ..options import register_custom_kkt
        opts = opts.replace(
            linear_solver="custom",
            custom_kkt_token=register_custom_kkt(custom_kkt_solver))
    if opts.linear_solver == "minres" or opts.inexact_algorithm:
        # no saved factorization to reuse for second-order corrections
        opts = opts.replace(max_soc=0)
    from ..chained import ChainedNLP, canonicalize_chained
    from ..parallel.scenario import ScenarioNLP, canonicalize_scenario
    if isinstance(problem, NLP) and opts.replace_bounds:
        # NLPBoundsRemover (IpNLPBoundsRemover.hpp:23) via replace_bounds
        # (IpIpoptApplication.cpp:524-527)
        from ..interfaces.transforms import remove_bounds
        problem = remove_bounds(problem)
    if isinstance(problem, NLP) and opts.inexact_algorithm:
        # The inexact algorithm requires variable bounds as inequality rows
        # (InexactAlgorithmBuilder requires NLPBoundsRemover,
        # IpInexactAlgBuilder.cpp:64-130): with Sigma_x = 0 the KKT operator's
        # barrier terms live only in the slack-scaled s-block, where
        # S Sigma_s S ~ mu stays bounded — otherwise the unpreconditioned
        # Krylov solves face a 1/slack^2 condition blowup near convergence.
        from ..interfaces.transforms import remove_bounds
        problem = remove_bounds(problem)
    if isinstance(problem, NLP) and opts.dependency_detector != "none":
        # TNLPAdapter dependent-equality detection (IpTNLPAdapter.cpp:628):
        # detect at x0, report, and take the rows out (TNLPReducer path).
        from ..interfaces.dependency import detect_dependent_constraints
        deps = detect_dependent_constraints(problem, opts)
        if deps:
            jnlst.printf(EJournalLevel.J_WARNING,
                         EJournalCategory.J_INITIALIZATION,
                         f"Detected {len(deps)} linearly dependent equality "
                         f"constraints; taking those out.\n")
            for k, i in enumerate(deps):
                jnlst.printf(EJournalLevel.J_DETAILED,
                             EJournalCategory.J_INITIALIZATION,
                             f"c_dep[{k}] = {i}\n")
            from ..interfaces.transforms import reduce_constraints
            problem = reduce_constraints(problem, deps)
    _user_nlp = problem if isinstance(problem, NLP) else None
    if isinstance(problem, NLP) and opts.linear_solver in ("banded-bcr",
                                                           "multifrontal"):
        # General-sparsity path: symbolic analysis -> RCM banding -> BCR,
        # or nested-dissection multifrontal for patterns RCM cannot band
        # (the MA27/MA57 capability class; ipopt_tpu/sparse.py +
        # linalg/nested_dissection.py).  Uses the NLP's declared
        # jac_g_sparsity / lag_hess_sparsity when present, exact AD
        # auto-detection otherwise.
        from ..sparse import canonicalize_sparse
        cnlp = canonicalize_sparse(problem, opts)
    elif isinstance(problem, NLP):
        cnlp = canonicalize(problem, opts)
    elif isinstance(problem, ChainedNLP):
        cnlp = canonicalize_chained(problem, opts)
    elif isinstance(problem, ScenarioNLP):
        cnlp = canonicalize_scenario(problem, opts)
    else:
        cnlp = problem
    if (it0 is None and _user_nlp is not None and opts.warm_start_init_point
            and (_user_nlp.y0 is not None or _user_nlp.z_L0 is not None
                 or _user_nlp.z_U0 is not None)):
        # TNLP::get_starting_point init_z/init_lambda parity: build a warm
        # iterate from the user's multipliers (queried only when
        # warm_start_init_point is set, like TNLPAdapter::GetStartingPoint).
        s_ = cnlp.struct
        dtype = cnlp.x0.dtype
        x_w = cnlp.x0
        s_w = cnlp.eval_d(x_w)
        y_c = jnp.zeros((s_.me,), dtype)
        y_d = jnp.zeros((s_.mi,), dtype)
        if _user_nlp.y0 is not None and s_.m:
            y_all = jnp.asarray(np.asarray(_user_nlp.y0), dtype)
            if s_.me:
                y_c = (y_all[jnp.asarray(s_.eq_idx)] * cnlp.obj_scale
                       / cnlp.c_scale)
            if s_.mi:
                y_d = (y_all[jnp.asarray(s_.ineq_idx)] * cnlp.obj_scale
                       / cnlp.d_scale)

        def _zfree(z0):
            if z0 is None:
                return jnp.ones((s_.n,), dtype)
            zf = jnp.asarray(np.asarray(z0), dtype)[jnp.asarray(s_.free_idx)]
            return zf * cnlp.obj_scale

        it0 = Iterate(
            x=x_w, s=s_w, y_c=y_c, y_d=y_d,
            z_L=jnp.where(cnlp.has_xL, _zfree(_user_nlp.z_L0), 0.0),
            z_U=jnp.where(cnlp.has_xU, _zfree(_user_nlp.z_U0), 0.0),
            v_L=jnp.where(cnlp.has_dL, jnp.ones((s_.mi,), dtype), 0.0),
            v_U=jnp.where(cnlp.has_dU, jnp.ones((s_.mi,), dtype), 0.0))
    if opts.derivative_test != "none":
        from ..deriv_check import check_derivatives
        report = check_derivatives(cnlp, opts)
        state = "passed" if report.ok else "FAILED"
        jnlst.printf(EJournalLevel.J_SUMMARY, EJournalCategory.J_NLP,
                     f"Derivative checker {state} "
                     f"(grad {report.max_rel_err_grad:.2e}, "
                     f"jac {report.max_rel_err_jac:.2e}, "
                     f"hess {report.max_rel_err_hess:.2e})\n")
        for line in report.failures[:20]:
            jnlst.printf(EJournalLevel.J_SUMMARY, EJournalCategory.J_NLP,
                         "  " + line + "\n")
    if opts.print_level >= 4 or (opts.output_file
                                 and opts.file_print_level >= 4):
        _print_header()
    time_limited = opts.max_wall_time < 1e19 or opts.max_cpu_time < 1e6
    if opts.timing_statistics or opts.print_timing_statistics:
        import time as _time
        t0 = _time.perf_counter()
        res = (_solve_time_limited(cnlp, opts, it0) if time_limited
               else _solve_canonical(cnlp, opts, it0))
        jax.block_until_ready(res.x)
        wall = _time.perf_counter() - t0
        if opts.print_level > 0 or opts.print_timing_statistics:
            it_n = max(int(res.iter_count), 1)
            print(f"OverallAlgorithm....................: {wall:10.3f} (wall)")
            print(f"  per iteration.....................: {wall / it_n:10.4f}")
            c = res.counters
            print(f"Function evaluations (f,g)..........: {int(c.n_obj_evals)}")
            print(f"Gradient evaluations................: {int(c.n_grad_evals)}")
            print(f"Hessian evaluations.................: {int(c.n_hess_evals)}")
            print(f"KKT factorizations..................: {int(c.n_factorizations)}")
            print(f"KKT backsolve batches...............: {int(c.n_kkt_solves)}")
    elif time_limited:
        res = _solve_time_limited(cnlp, opts, it0)
    else:
        res = _solve_canonical(cnlp, opts, it0)
    if finalize_solution is not None and not opts.skip_finalize_solution_call:
        # TNLP::finalize_solution parity (IpTNLP.hpp:597; gated by
        # skip_finalize_solution_call, IpIpoptApplication.cpp:120-124):
        # hand the user the final primal-dual point in user space.
        finalize_solution(
            status=int(res.status), x=np.asarray(res.x),
            z_L=np.asarray(res.z_L), z_U=np.asarray(res.z_U),
            g=np.asarray(res.g), lambda_=np.asarray(res.y),
            obj_value=float(res.obj))
    return res


def _print_header():
    from ..journalist import (default_journalist, EJournalLevel,
                              EJournalCategory)
    default_journalist().printf(
        EJournalLevel.J_ITERSUMMARY, EJournalCategory.J_MAIN,
        "iter    objective        inf_pr   inf_du   lg(mu)  ||d||   lg(rg)"
        " alpha_du alpha_pr  ls\n")
