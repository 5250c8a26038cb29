"""Chen-Goldfarb penalty-method line search (``line_search_method=cg-penalty``).

Reference parity: ``src/contrib/CGPenalty/`` —
- ``CGSearchDirCalculator::ComputeSearchDirection`` (IpCGSearchDirCalc.cpp:135):
  penalty initialization from max|y|, the *fast* direction (standard primal-dual
  rhs), the *cgpen* direction (constraint rhs shifted by the penalty
  perturbation +delta_c * y), and the three compatibility tests deciding which
  direction to use; penalty update via ``compute_curr_cg_penalty``
  (IpCGPenaltyCq.cpp:324).
- ``CGPerturbationHandler``: the Jacobian regularization is tied to the
  penalty, delta_c = ||(c, d-s)||_2 / kkt_penalty (``curr_cg_pert_fact``,
  IpCGPenaltyCq.cpp:271).
- ``CGPenaltyLSAcceptor`` (IpCGPenaltyLSAcceptor.cpp:274-459): Armijo on the
  penalty function phi_nu = barrier + nu * ||(c, d-s)||_2 with the exact
  directional derivative (``curr_direct_deriv_penalty_function``), the
  piecewise-linear penalty (PLPF) non-monotone acceptance
  (``IpPiecewisePenalty.cpp:28``), the pen_theta_max infeasibility cap, and the
  two-stage penalty parameter update (``UpdatePenaltyParameter``, :712-900).

TPU-native design: the PLPF list is a fixed-capacity array triple
(pen_r, barr, inf) in the solver carry; acceptance tests evaluate all
breakpoints with masks; the envelope update keeps the Pareto-dominant points
and recomputes breakpoint penalties wholesale (a fixed-shape simplification of
the reference's incremental envelope insertion — acceptance semantics at the
breakpoints are preserved).  The "restore best point" divergence fallback is
subsumed by the watchdog + restoration machinery of the main driver.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import (Evals, barrier_obj, grad_barrier_x, grad_barrier_s,
                   fraction_to_boundary, condensed_rhs_parts, slacks)
from .step import (StepResult, factorize_any, solve_any,
                   direction_from_parts)


class CGState(NamedTuple):
    """Chen-Goldfarb carry (CGPenaltyData equivalent)."""
    penalty: jnp.ndarray        # nu for the line-search penalty function
    kkt_penalty: jnp.ndarray    # penalty scaling the KKT perturbation
    initialized: jnp.ndarray    # bool
    pp_pen_r: jnp.ndarray       # (K,) PLPF breakpoint penalties
    pp_barr: jnp.ndarray        # (K,) PLPF barrier values
    pp_inf: jnp.ndarray         # (K,) PLPF infeasibilities (1-norm)
    pp_size: jnp.ndarray        # int32
    curr_eta: jnp.ndarray       # eta tolerance (-1 = uninitialized)
    pen_theta_max: jnp.ndarray  # infeasibility cap (-1 = uninitialized)
    nonmono_count: jnp.ndarray  # nonmonotone penalty decrease counter
    second_update_count: jnp.ndarray


class CGStepAux(NamedTuple):
    """Per-iteration scalars the acceptor/updater needs from the direction."""
    ref_penalty_fn: jnp.ndarray      # phi_nu at the current point
    ref_direct_deriv: jnp.ndarray    # D phi_nu along the cgpen direction
    pert: jnp.ndarray                # CurrPenaltyPert (= accepted delta_c)
    inf2: jnp.ndarray                # ||(c, d-s)||_2 at current point
    used_fast: jnp.ndarray           # bool: fast direction taken
    dxs_nrm2: jnp.ndarray            # ||(dx, ds)||_2^2 of the taken step
    dy_c: jnp.ndarray                # y_c step of the taken direction
    dy_d: jnp.ndarray


def cg_init(opts: Options, dtype) -> CGState:
    # Minimal carry when the CG method is off (keeps IPMState small).
    K = opts.max_piece_number if opts.line_search_method == "cg-penalty" else 1
    z = jnp.zeros((), dtype)
    return CGState(
        penalty=jnp.ones((), dtype), kkt_penalty=jnp.ones((), dtype),
        initialized=jnp.zeros((), bool),
        pp_pen_r=jnp.zeros((K,), dtype),
        pp_barr=jnp.full((K,), jnp.inf, dtype),
        pp_inf=jnp.full((K,), jnp.inf, dtype),
        pp_size=jnp.zeros((), jnp.int32),
        curr_eta=-jnp.ones((), dtype), pen_theta_max=-jnp.ones((), dtype),
        nonmono_count=jnp.zeros((), jnp.int32),
        second_update_count=jnp.zeros((), jnp.int32))


def _inf2(ev: Evals, it: Iterate):
    return jnp.sqrt(jnp.sum(ev.c ** 2) + jnp.sum((ev.d - it.s) ** 2))


def cg_search_direction(nlp: CanonicalNLP, opts: Options, it: Iterate,
                        ev: Evals, W, mu, delta_w_last, cg: CGState):
    """Fast/cgpen direction pair + penalty bookkeeping
    (CGSearchDirCalculator::ComputeSearchDirection)."""
    dtype = it.x.dtype
    inf2 = _inf2(ev, it)
    dms = ev.d - it.s

    # --- penalty initialization (first iteration) -------------------------
    y_max = jnp.maximum(jnp.max(jnp.abs(it.y_c), initial=0.0),
                        jnp.max(jnp.abs(it.y_d), initial=0.0))
    pen0 = jnp.maximum(opts.penalty_init_min,
                       jnp.minimum(y_max, opts.penalty_init_max))
    penalty = jnp.where(cg.initialized, cg.penalty, pen0)
    kkt_penalty = jnp.where(cg.initialized, cg.kkt_penalty,
                            jnp.asarray(opts.penalty_init_min, dtype))

    # --- factorize with the CG perturbation (curr_cg_pert_fact) -----------
    pert_fact = inf2 / kkt_penalty
    fr = factorize_any(nlp, opts, it, ev, W, mu, delta_w_last,
                       delta_cd_override=pert_fact)
    pert = fr.delta_c  # nonzero only if the retry loop perturbed

    # --- fast direction: standard primal-dual rhs --------------------------
    parts = condensed_rhs_parts(nlp, it, ev, mu, opts.kappa_d)
    split_fast, rr = solve_any(nlp, opts, fr.fac, fr.K, parts)
    dxf, dsf, dycf, dydf = split_fast

    # --- cgpen direction: constraint rhs shifted by +pert * y --------------
    parts_pen = (parts[0], parts[1], parts[2] + pert * it.y_c,
                 parts[3] + pert * it.y_d)
    split_pen, _ = solve_any(nlp, opts, fr.fac, fr.K, parts_pen)
    dxp, dsp, dycp, dydp = split_pen

    # --- compatibility tests for keeping the fast direction ----------------
    gphi_x = grad_barrier_x(nlp, it, ev.grad_f, mu, opts.kappa_d)
    gphi_s = grad_barrier_s(nlp, it, mu, opts.kappa_d)

    tilde_nrm = jnp.sqrt(jnp.sum(dxf ** 2) + jnp.sum(dsf ** 2))
    diff_nrm = jnp.sqrt(jnp.sum((dxf - dxp) ** 2) + jnp.sum((dsf - dsp) ** 2))
    test_x = diff_nrm <= opts.kappa_x_dis * jnp.maximum(
        tilde_nrm, tilde_nrm ** opts.vartheta)

    tilde_dy = jnp.sqrt(jnp.sum(dycf ** 2) + jnp.sum(dydf ** 2))
    bar_y = jnp.sqrt(jnp.sum((it.y_c + dycp) ** 2)
                     + jnp.sum((it.y_d + dydp) ** 2))
    test_y = tilde_dy <= jnp.maximum(opts.delta_y_max,
                                     opts.kappa_y_dis * bar_y)

    # fast_direct_deriv <= fast_des_fact * d^T barH d (IpCGPenaltyCq.cpp:225,295)
    gphi_dfast = jnp.dot(gphi_x, dxf) + jnp.dot(gphi_s, dsf)
    safe_inf = jnp.maximum(inf2, jnp.finfo(dtype).tiny)
    fac = penalty * pert / safe_inf
    fast_deriv = (gphi_dfast - penalty * inf2
                  + jnp.where(inf2 > 0,
                              fac * (jnp.dot(ev.c, dycf) + jnp.dot(dms, dydf)),
                              0.0))
    dT_barH_d = ((-jnp.dot(it.y_c, dycf) - jnp.dot(it.y_d, dydf)) * pert_fact
                 - gphi_dfast + jnp.dot(ev.c, it.y_c) + jnp.dot(dms, it.y_d)
                 - jnp.dot(ev.c, dycf) - jnp.dot(dms, dydf)
                 + penalty * inf2)
    test_deriv = fast_deriv <= opts.fast_des_fact * dT_barH_d

    keep_fast = jnp.logical_and(jnp.logical_and(test_x, test_y), test_deriv)
    # With no perturbation the directions coincide; fast is trivially kept.
    keep_fast = jnp.logical_or(keep_fast, pert == 0)
    if opts.never_use_fact_cgpen_direction:
        keep_fast = jnp.logical_and(keep_fast, pert == 0)

    def sel(a, b):
        return jnp.where(keep_fast, a, b)

    dx, ds, dy_c, dy_d = (sel(dxf, dxp), sel(dsf, dsp), sel(dycf, dycp),
                          sel(dydf, dydp))

    # --- penalty parameter pre-update (compute_curr_cg_penalty) ------------
    gphi_d = jnp.dot(gphi_x, dx) + jnp.dot(gphi_s, ds)
    # d^T (damped Hessian) d from the aug system rows (the reference's
    # jac_dT_times_dy_d line has a c/d transcription slip; we use the intended
    # J_d^T dy_d term).
    jcT_ypdy = ev.jc_t(it.y_c + dy_c)
    jdT_ypdy = ev.jd_t(it.y_d + dy_d)
    dHd = (-gphi_d
           - (jnp.dot(jcT_ypdy, dx) + jnp.dot(jdT_ypdy, dx)
              - jnp.dot(it.y_d, ds) - jnp.dot(dy_d, ds)))
    dxs_nrm2 = jnp.sum(dx ** 2) + jnp.sum(ds ** 2)
    dHd = jnp.maximum(1e-8 * dxs_nrm2, dHd)
    fac2 = pert / safe_inf
    deriv_inf_fast = fac2 * (jnp.dot(ev.c, dy_c) + jnp.dot(dms, dy_d)) - inf2
    deriv_inf_pen = (fac2 * (jnp.dot(ev.c, it.y_c + dy_c)
                             + jnp.dot(dms, it.y_d + dy_d)) - inf2)
    deriv_inf = jnp.where(keep_fast, deriv_inf_fast, deriv_inf_pen)
    denom = deriv_inf + opts.pen_des_fact * inf2
    nu_cand = jnp.where(
        jnp.logical_and(inf2 > 0, jnp.abs(denom) > jnp.finfo(dtype).tiny),
        -(gphi_d + opts.pen_des_fact * dHd) / denom, 0.0)
    # Update rules (IpCGSearchDirCalc.cpp:330-366).
    up = nu_cand > penalty
    nu_up = jnp.maximum(nu_cand, penalty + 1.0)
    keep_nu = jnp.logical_or(penalty <= kkt_penalty, pert == 0)
    nu_keep = jnp.where(keep_nu, penalty, kkt_penalty)
    new_penalty = jnp.where(up, nu_up, nu_keep)
    nonmono = cg.nonmono_count + jnp.where(
        jnp.logical_and(jnp.logical_not(up), jnp.logical_not(keep_nu)), 1, 0)
    new_kkt_penalty = jnp.where(
        jnp.logical_and(new_penalty > kkt_penalty, nonmono > 50),
        new_penalty, kkt_penalty)

    # --- reference quantities for the acceptor -----------------------------
    phi = barrier_obj(nlp, it, ev.f, mu, opts.kappa_d)
    ref_pen_fn = phi + new_penalty * inf2
    gphi_dpen = jnp.dot(gphi_x, dxp) + jnp.dot(gphi_s, dsp)
    ref_deriv = (gphi_dpen - new_penalty * inf2
                 + jnp.where(inf2 > 0,
                             (new_penalty * pert / safe_inf)
                             * (jnp.dot(ev.c, it.y_c + dycp)
                                + jnp.dot(dms, it.y_d + dydp)),
                             0.0))

    from ..kkt import recover_bound_mult_steps
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    step = Iterate(x=dx, s=ds, y_c=dy_c, y_d=dy_d,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    step = jax.tree.map(lambda v: jnp.where(fr.failed, jnp.zeros_like(v), v),
                        step)
    sr = StepResult(step=step, delta_x=fr.delta_x, delta_c=fr.delta_c,
                    delta_w_last=fr.delta_w_last, failed=fr.failed,
                    num_trials=fr.num_trials, residual_ratio=rr,
                    fac=fr.fac, K=fr.K)
    cg_new = cg._replace(penalty=new_penalty, kkt_penalty=new_kkt_penalty,
                         initialized=jnp.ones((), bool),
                         nonmono_count=nonmono)
    aux = CGStepAux(ref_penalty_fn=ref_pen_fn, ref_direct_deriv=ref_deriv,
                    pert=pert, inf2=inf2, used_fast=keep_fast,
                    dxs_nrm2=dxs_nrm2, dy_c=dy_c, dy_d=dy_d)
    return sr, cg_new, aux


# ---------------------------------------------------------------------------
# Piecewise-linear penalty function (PLPF)
# ---------------------------------------------------------------------------

def pp_acceptable(cg: CGState, Fzconst, Fzlin):
    """PiecewisePenalty::Acceptable core (IpPiecewisePenalty.cpp:92-106):
    below some breakpoint line, or less infeasible than every entry."""
    valid = jnp.arange(cg.pp_inf.shape[0]) < cg.pp_size
    Fz = Fzconst + cg.pp_pen_r * (Fzlin - cg.pp_inf) - cg.pp_barr
    below = jnp.any(jnp.logical_and(valid, Fz < 0))
    min_inf = jnp.min(jnp.where(valid, cg.pp_inf, jnp.inf), initial=jnp.inf)
    return jnp.logical_or(below, Fzlin < min_inf)


def pp_biggest_barr(cg: CGState):
    valid = jnp.arange(cg.pp_inf.shape[0]) < cg.pp_size
    return jnp.max(jnp.where(valid, cg.pp_barr, -jnp.inf), initial=-jnp.inf)


def pp_update(cg: CGState, barr_t, inf_t) -> CGState:
    """PLPF envelope update, fixed-shape: insert the new point, keep
    Pareto-dominant points, sort by infeasibility descending, recompute the
    breakpoint penalties as consecutive crossing slopes
    (IpPiecewisePenalty::UpdateEntry, wholesale instead of incremental)."""
    K = cg.pp_inf.shape[0]
    valid = jnp.arange(K) < cg.pp_size
    barr = jnp.where(valid, cg.pp_barr, jnp.inf)
    inf = jnp.where(valid, cg.pp_inf, jnp.inf)
    # Append (replacing the slot that will be dropped if full): put the new
    # point in the last slot if size == K, else slot pp_size.
    slot = jnp.minimum(cg.pp_size, K - 1)
    barr = barr.at[slot].set(barr_t)
    inf = inf.at[slot].set(inf_t)
    # Pareto filter: drop i if some j has barr_j <= barr_i and inf_j <= inf_i
    # with at least one strict (ties keep the lowest index).
    bi, bj = barr[:, None], barr[None, :]
    ii, ij = inf[:, None], inf[None, :]
    strictly_better = jnp.logical_and(bj <= bi, jnp.logical_and(
        ij <= ii, jnp.logical_or(bj < bi, ij < ii)))
    tie = jnp.logical_and(bj == bi, ij == ii)
    idx = jnp.arange(K)
    tie_earlier = jnp.logical_and(tie, idx[None, :] < idx[:, None])
    dominated = jnp.any(jnp.logical_or(strictly_better, tie_earlier), axis=1)
    keep = jnp.logical_and(jnp.isfinite(inf), jnp.logical_not(dominated))
    # Sort kept points by infeasibility descending (inf strictly decreasing,
    # barr strictly increasing on the Pareto frontier).
    sort_key = jnp.where(keep, -inf, jnp.inf)
    order = jnp.argsort(sort_key)
    barr_s = barr[order]
    inf_s = inf[order]
    keep_s = keep[order]
    size = jnp.sum(keep_s).astype(jnp.int32)
    # Breakpoints: pen_r_0 = 0, pen_r_k = (barr_k - barr_{k-1})/(inf_{k-1} - inf_k).
    dbarr = barr_s - jnp.roll(barr_s, 1)
    dinf = jnp.roll(inf_s, 1) - inf_s
    pen_r = jnp.where(jnp.arange(K) == 0, 0.0,
                      jnp.where(dinf > 0, dbarr / jnp.maximum(dinf, 1e-300),
                                0.0))
    fill = jnp.arange(K) < size
    return cg._replace(
        pp_pen_r=jnp.where(fill, pen_r, 0.0),
        pp_barr=jnp.where(fill, barr_s, jnp.inf),
        pp_inf=jnp.where(fill, inf_s, jnp.inf),
        pp_size=size)


# ---------------------------------------------------------------------------
# Line search
# ---------------------------------------------------------------------------

def cg_line_search(nlp: CanonicalNLP, opts: Options, it: Iterate, ev: Evals,
                   sr: StepResult, mu, tau, cg: CGState, aux: CGStepAux):
    """Backtracking with the CG penalty-function acceptance
    (CGPenaltyLSAcceptor::CheckAcceptabilityOfTrialPoint).  Returns
    (LineSearchResult-compatible fields, updated CGState)."""
    from .linesearch import LineSearchResult, _trial_point, _eval_theta_phi
    dtype = it.x.dtype
    step = sr.step
    eps = jnp.finfo(dtype).eps

    theta = jnp.sum(jnp.abs(ev.c)) + jnp.sum(jnp.abs(ev.d - it.s))
    phi = barrier_obj(nlp, it, ev.f, mu, opts.kappa_d)

    # Initialize the PLPF list and the infeasibility cap lazily.
    empty = cg.pp_size == 0
    cg = cg._replace(
        pp_pen_r=jnp.where(empty, cg.pp_pen_r.at[0].set(0.0), cg.pp_pen_r),
        pp_barr=jnp.where(empty, cg.pp_barr.at[0].set(phi), cg.pp_barr),
        pp_inf=jnp.where(empty, cg.pp_inf.at[0].set(theta), cg.pp_inf),
        pp_size=jnp.where(empty, 1, cg.pp_size))
    cg = cg._replace(pen_theta_max=jnp.where(
        cg.pen_theta_max < 0,
        opts.pen_theta_max_fact * jnp.maximum(1.0, theta),
        cg.pen_theta_max))

    alpha_max, alpha_dual = fraction_to_boundary(nlp, it, step, tau)
    inf_max = jnp.maximum(jnp.max(jnp.abs(ev.c), initial=0.0),
                          jnp.max(jnp.abs(ev.d - it.s), initial=0.0))

    def acceptable(alpha, theta_t, phi_t, it_t):
        # infeasibility cap
        cap_ok = theta_t <= cg.pen_theta_max
        # Armijo on phi_nu with trial inf in the 2-norm.
        inf2_t = _inf2(Evals(f=None, grad_f=None, c=nlp.eval_c(it_t.x),
                             d=nlp.eval_d(it_t.x), J_c=None, J_d=None,
                             jc_t=None, jd_t=None), it_t)
        pen_t = phi_t + cg.penalty * inf2_t
        armijo = (pen_t - aux.ref_penalty_fn
                  - opts.eta_penalty * alpha * aux.ref_direct_deriv
                  <= 10.0 * eps * jnp.abs(aux.ref_penalty_fn))
        # PLPF acceptance.
        Fzconst = phi_t + alpha * opts.piecewisepenalty_gamma_obj * aux.dxs_nrm2
        Fzlin = theta_t + alpha * opts.piecewisepenalty_gamma_infeasi * theta
        plpf = pp_acceptable(cg, Fzconst, Fzlin)
        if not opts.never_use_piecewise_penalty_ls:
            near_feas = inf_max < opts.theta_min
            barr_dec_ok = (phi_t - pp_biggest_barr(cg)
                           <= -alpha * opts.piecewisepenalty_gamma_obj
                           * aux.dxs_nrm2 + 10.0 * eps * jnp.abs(phi))
            plpf = jnp.logical_and(
                plpf, jnp.logical_or(jnp.logical_not(near_feas), barr_dec_ok))
        else:
            plpf = jnp.zeros((), bool)
        accept = jnp.logical_and(cap_ok, jnp.logical_or(armijo, plpf))
        # force-accept tiny steps (min_alpha_primal)
        accept = jnp.logical_or(accept, alpha < opts.min_alpha_primal)
        by_armijo = jnp.logical_and(cap_ok, armijo)
        return accept, by_armijo

    class Carry(NamedTuple):
        k: jnp.ndarray
        alpha: jnp.ndarray
        done: jnp.ndarray
        accepted: jnp.ndarray
        by_armijo: jnp.ndarray
        it_t: Iterate
        f_t: jnp.ndarray
        c_t: jnp.ndarray
        d_t: jnp.ndarray
        theta_t: jnp.ndarray
        phi_t: jnp.ndarray
        alpha_used: jnp.ndarray

    def body(cy: Carry) -> Carry:
        alpha = cy.alpha
        it_t = _trial_point(it, step, alpha, alpha_dual)
        f_t, c_t, d_t, theta_t, phi_t = _eval_theta_phi(nlp, opts, it_t, mu)
        acc, by_arm = acceptable(alpha, theta_t, phi_t, it_t)
        next_alpha = alpha * opts.alpha_red_factor
        done = jnp.logical_or(acc, next_alpha < opts.min_alpha_primal * 0.5)
        return Carry(k=cy.k + 1, alpha=next_alpha, done=done, accepted=acc,
                     by_armijo=by_arm, it_t=it_t, f_t=f_t, c_t=c_t, d_t=d_t,
                     theta_t=theta_t, phi_t=phi_t, alpha_used=alpha)

    def cond(cy: Carry):
        return jnp.logical_and(jnp.logical_not(cy.done),
                               cy.k < opts.max_backtracking_steps)

    it0 = _trial_point(it, step, alpha_max, alpha_dual)
    init = Carry(k=jnp.zeros((), jnp.int32), alpha=alpha_max,
                 done=jnp.zeros((), bool), accepted=jnp.zeros((), bool),
                 by_armijo=jnp.zeros((), bool), it_t=it0, f_t=ev.f, c_t=ev.c,
                 d_t=ev.d, theta_t=theta, phi_t=phi, alpha_used=alpha_max)
    out = lax.while_loop(cond, body, init)

    # --- UpdateForNextIteration -------------------------------------------
    # PLPF entry update for non-Armijo acceptances.
    do_pp = jnp.logical_and(out.accepted, jnp.logical_not(out.by_armijo))
    cg_pp = pp_update(cg, out.phi_t, out.theta_t)
    cg = jax.tree.map(lambda a, b: jnp.where(do_pp, b, a), cg, cg_pp)

    # Penalty parameter update when the system was perturbed
    # (UpdatePenaltyParameter, IpCGPenaltyLSAcceptor.cpp:712).
    cg = _update_penalty_parameter(nlp, opts, it, ev, sr, mu, cg, aux, out)

    ls = LineSearchResult(
        accepted=out.accepted, alpha_primal=out.alpha_used,
        alpha_dual=alpha_dual, trial=out.it_t, trial_ev_f=out.f_t,
        trial_c=out.c_t, trial_d=out.d_t, n_backtracks=out.k,
        used_soc=jnp.zeros((), bool), ftype=jnp.ones((), bool),
        filter=None,  # caller keeps its FilterState untouched
        theta_curr=theta, phi_curr=phi, penalty_nu=cg.penalty,
        # no first-trial reuse: the solver evaluates the watchdog point itself
        first_trial=out.it_t, first_f=out.f_t, first_c=out.c_t,
        first_d=out.d_t, first_theta=jnp.asarray(jnp.inf, dtype),
        first_phi=jnp.asarray(jnp.inf, dtype),
        n_evals=out.k, n_soc_rounds=jnp.zeros((), jnp.int32))
    return ls, cg


def _update_penalty_parameter(nlp, opts, it, ev, sr, mu, cg: CGState,
                              aux: CGStepAux, out) -> CGState:
    dtype = it.x.dtype
    active = aux.pert != 0

    # eta init: max(eta_min, min(gamma_tilde, gamma_hat * curr nlp error)).
    from ..kkt import kkt_residuals, optimality_error
    res = kkt_residuals(nlp, it, ev, 0.0)
    E, _, _, _ = optimality_error(nlp, it, res, opts.s_max)
    eta0 = jnp.maximum(opts.eta_min,
                       jnp.minimum(opts.gamma_tilde, opts.gamma_hat * E))
    curr_eta = jnp.where(cg.curr_eta < 0, eta0, cg.curr_eta)

    trial_inf2 = jnp.sqrt(jnp.sum(out.c_t ** 2)
                          + jnp.sum((out.d_t - out.it_t.s) ** 2))
    inc = trial_inf2 >= opts.penalty_update_infeasibility_tol
    max_step = jnp.maximum(jnp.max(jnp.abs(sr.step.x), initial=0.0),
                           jnp.max(jnp.abs(sr.step.s), initial=0.0))
    inc = jnp.logical_and(inc, max_step <= curr_eta)

    # complementarity window
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    prods = jnp.concatenate([
        jnp.where(nlp.has_xL, sl_xL * it.z_L, jnp.nan),
        jnp.where(nlp.has_xU, sl_xU * it.z_U, jnp.nan),
        jnp.where(nlp.has_dL, sl_sL * it.v_L, jnp.nan),
        jnp.where(nlp.has_dU, sl_sU * it.v_U, jnp.nan)])
    min_c = jnp.minimum(mu, jnp.min(jnp.where(jnp.isnan(prods), jnp.inf,
                                              prods), initial=jnp.inf))
    max_c = jnp.maximum(mu, jnp.max(jnp.where(jnp.isnan(prods), -jnp.inf,
                                              prods), initial=-jnp.inf))
    inc = jnp.logical_and(inc, jnp.logical_and(
        min_c >= mu * opts.penalty_update_compl_tol,
        max_c <= mu / opts.penalty_update_compl_tol))

    # omega tests: |y + dy - c / pert|_inf < eta  (c and d blocks)
    pert_safe = jnp.where(aux.pert != 0, aux.pert, 1.0)
    om_c = jnp.max(jnp.abs(it.y_c + aux.dy_c - ev.c / pert_safe), initial=0.0)
    om_d = jnp.max(jnp.abs(it.y_d + aux.dy_d - (ev.d - it.s) / pert_safe),
                   initial=0.0)
    inc = jnp.logical_and(inc, jnp.logical_and(om_c < curr_eta,
                                               om_d < curr_eta))
    inc = jnp.logical_and(inc, active)

    new_eta = jnp.where(inc, jnp.maximum(opts.eta_min, curr_eta / 2.0),
                        curr_eta)
    y_full_max = jnp.maximum(
        jnp.max(jnp.abs(it.y_c + aux.dy_c), initial=0.0),
        jnp.max(jnp.abs(it.y_d + aux.dy_d), initial=0.0))
    pen_infeas = jnp.maximum(opts.chi_hat * cg.kkt_penalty, y_full_max + 1.0)
    pen_feas = jnp.maximum(opts.chi_tilde * cg.kkt_penalty,
                           opts.chi_cup * y_full_max)
    pen_new = jnp.where(aux.inf2 >= opts.epsilon_c, pen_infeas, pen_feas)
    pen_new = jnp.minimum(pen_new, opts.penalty_max)
    kkt_pen = jnp.where(inc, pen_new, cg.kkt_penalty)

    # second heuristic update
    scaled_y = (jnp.maximum(jnp.max(jnp.abs(it.y_c), initial=0.0),
                            jnp.max(jnp.abs(it.y_d), initial=0.0))
                / jnp.maximum(1.0, jnp.max(jnp.abs(ev.grad_f), initial=0.0)))
    do2 = jnp.logical_or(scaled_y <= 1e4, cg.second_update_count < 5)
    dms = ev.d - it.s
    r2 = jnp.dot(aux.dy_c, ev.c) + jnp.dot(aux.dy_d, dms)
    r2 = r2 + jnp.where(aux.used_fast, 0.0,
                        jnp.dot(it.y_c, ev.c) + jnp.dot(it.y_d, dms))
    trigger2 = jnp.abs(r2) > 0.5 * kkt_pen * aux.inf2
    nrm2_y = jnp.sqrt(jnp.sum((it.y_c + aux.dy_c) ** 2)
                      + jnp.sum((it.y_d + aux.dy_d) ** 2))
    fire2 = jnp.logical_and(jnp.logical_and(do2, trigger2),
                            (nlp.me + nlp.mi) > 0)
    kkt_pen = jnp.where(fire2, jnp.minimum(5.0 * nrm2_y, opts.penalty_max),
                        kkt_pen)
    cnt2 = cg.second_update_count + jnp.where(
        jnp.logical_and(fire2, scaled_y > 1e4), 1, 0)

    return cg._replace(curr_eta=new_eta, kkt_penalty=kkt_pen,
                       second_update_count=cnt2)
