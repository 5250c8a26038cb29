"""Filter line search: BacktrackingLineSearch + FilterLSAcceptor equivalent.

Reference parity (Waechter-Biegler, Math. Program. 106(1), 2006, Algorithm A;
``src/Algorithm/IpFilterLSAcceptor.cpp``, ``IpBacktrackingLineSearch.cpp``):
- fraction-to-boundary alpha_max, alpha_min via eq. (23) (CalculateAlphaMin,
  IpFilterLSAcceptor.cpp:446),
- backtracking with filter acceptability (eqs. 18a/18b margins gamma_theta /
  gamma_phi), f-type switching condition eq. (19) and Armijo eq. (20),
- second-order corrections (TrySecondOrderCorrection, :531; max_soc/kappa_soc),
- filter augmentation (AugmentFilter, :295) for non-f-type iterations.

TPU-native design: the filter is a fixed-capacity pair of arrays in the solver
carry (entries pre-filled with +inf so vacuous comparisons pass); the
backtracking loop is a bounded ``lax.while_loop`` — each trial costs one fused
(f, c, d) evaluation, exactly like the reference's one TNLP callback round.
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
                   fraction_to_boundary, slacks)
from .step import StepResult, soc_direction


class FilterState(NamedTuple):
    """Fixed-capacity filter (IpFilter.hpp:19).  Entries store the *margined*
    corner points ((1-gamma_theta)*theta, phi - gamma_phi*theta); a trial is
    blocked by entry j iff theta_t >= theta_j AND phi_t >= phi_j."""

    theta: jnp.ndarray  # (cap,)
    phi: jnp.ndarray    # (cap,)
    size: jnp.ndarray   # int32


def filter_init(cap: int, dtype) -> FilterState:
    inf = jnp.full((cap,), jnp.inf, dtype)
    return FilterState(theta=inf, phi=inf, size=jnp.zeros((), jnp.int32))


def filter_reset(fs: FilterState) -> FilterState:
    return FilterState(theta=jnp.full_like(fs.theta, jnp.inf),
                       phi=jnp.full_like(fs.phi, jnp.inf),
                       size=jnp.zeros((), jnp.int32))


def filter_acceptable(fs: FilterState, theta_t, phi_t):
    blocked = jnp.any(jnp.logical_and(theta_t >= fs.theta, phi_t >= fs.phi))
    return jnp.logical_not(blocked)


def filter_augment(fs: FilterState, theta, phi, gamma_theta, gamma_phi) -> FilterState:
    """AugmentFilter (IpFilterLSAcceptor.cpp:295): add the margined pair.

    The reference filter grows unboundedly; this one has static capacity
    (max_filter_size).  On overflow the entry with the LARGEST theta is
    replaced — the least binding corner for late (near-feasible) iterations,
    so convergence-critical small-theta history is preserved."""
    cap = fs.theta.shape[0]
    full = fs.size >= cap
    i = jnp.where(full, jnp.argmax(fs.theta), fs.size)
    return FilterState(
        theta=fs.theta.at[i].set((1.0 - gamma_theta) * theta),
        phi=fs.phi.at[i].set(phi - gamma_phi * theta),
        size=jnp.minimum(fs.size + 1, cap))


class LineSearchResult(NamedTuple):
    accepted: jnp.ndarray      # bool: a trial point was accepted
    alpha_primal: jnp.ndarray
    alpha_dual: jnp.ndarray
    trial: Iterate             # accepted (or last attempted) trial point
    trial_ev_f: jnp.ndarray    # f at trial (to seed caches)
    trial_c: jnp.ndarray
    trial_d: jnp.ndarray
    n_backtracks: jnp.ndarray
    used_soc: jnp.ndarray
    ftype: jnp.ndarray         # bool: f-type iteration (no filter augmentation)
    filter: FilterState
    theta_curr: jnp.ndarray
    phi_curr: jnp.ndarray
    penalty_nu: jnp.ndarray
    # The first (alpha_max, full fraction-to-boundary) trial: the watchdog and
    # the soft-restoration check need exactly this point, so the solver reuses
    # these values instead of re-evaluating f/c/d (VERDICT r1: lazily-activated
    # watchdog, IpBacktrackingLineSearch.cpp:71-237).
    first_trial: Iterate
    first_f: jnp.ndarray
    first_c: jnp.ndarray
    first_d: jnp.ndarray
    first_theta: jnp.ndarray
    first_phi: jnp.ndarray
    # real evaluation counters (SolveStatistics parity,
    # IpOrigIpoptNLP.hpp:316-342): trial f/c/d evaluation rounds (incl. SOC)
    # and SOC KKT backsolves actually performed
    n_evals: jnp.ndarray
    n_soc_rounds: jnp.ndarray
    # was the LAST evaluated trial rejected because the filter blocked it?
    # (drives the filter-reset heuristic, IpFilterLSAcceptor.cpp:402-420)
    last_rej_filter: jnp.ndarray = None


def _theta(nlp: CanonicalNLP, c, d, s, norm_type: str = "1-norm"):
    """theta(x) in the option-selected norm (constraint_violation_norm_type,
    IpIpoptCalculatedQuantities.cpp:175; default 1-norm)."""
    dms = d - s
    if norm_type == "2-norm":
        return jnp.sqrt(jnp.sum(c * c) + jnp.sum(dms * dms))
    if norm_type == "max-norm":
        return jnp.maximum(jnp.max(jnp.abs(c), initial=0.0),
                           jnp.max(jnp.abs(dms), initial=0.0))
    return jnp.sum(jnp.abs(c)) + jnp.sum(jnp.abs(dms))


def magic_step(nlp: CanonicalNLP, s, d_t):
    """Slack magic step (IpBacktrackingLineSearch.cpp:1003-1099): move s_i
    toward d_i(x_trial) — up for lower-bounded rows, down for upper-bounded —
    and cancel the move on two-sided rows when it worsens the centering
    distance |d_L + d_U - 2 s|.  Reduces theta at zero cost in x."""
    dms = d_t - s
    delta = (jnp.where(nlp.has_dL, jnp.maximum(0.0, dms), 0.0)
             + jnp.where(nlp.has_dU, jnp.minimum(0.0, dms), 0.0))
    both = jnp.logical_and(nlp.has_dL, nlp.has_dU)
    center_old = jnp.abs(nlp.d_L + nlp.d_U - 2.0 * s)
    center_new = jnp.abs(nlp.d_L + nlp.d_U - 2.0 * (s + delta))
    delta = jnp.where(jnp.logical_and(both, center_new > center_old),
                      0.0, delta)
    return s + delta


def _eval_theta_phi(nlp: CanonicalNLP, opts: Options, it_trial: Iterate, mu):
    # Pin results to the iterate dtype: with x64 enabled (mixed-precision
    # critical path) a model whose closures embed float64 numpy constants
    # would silently promote the f32 trial evaluation and break while-loop
    # carry dtypes.
    dt = it_trial.x.dtype
    f_t = nlp.eval_f(it_trial.x).astype(dt)
    c_t = nlp.eval_c(it_trial.x).astype(dt)
    d_t = nlp.eval_d(it_trial.x).astype(dt)
    theta_t = _theta(nlp, c_t, d_t, it_trial.s,
                     opts.constraint_violation_norm_type)
    phi_t = barrier_obj(nlp, it_trial, f_t, mu, opts.kappa_d)
    return f_t, c_t, d_t, theta_t, phi_t


def _eval_trial_magic(nlp: CanonicalNLP, opts: Options, it_trial: Iterate,
                      mu):
    """_eval_theta_phi with the optional slack magic step applied to the
    trial iterate first (the modified s persists into acceptance)."""
    if opts.magic_steps:
        d_t = nlp.eval_d(it_trial.x)
        it_trial = it_trial._replace(s=magic_step(nlp, it_trial.s, d_t))
    return (it_trial,) + _eval_theta_phi(nlp, opts, it_trial, mu)


def _trial_point(it: Iterate, step: Iterate, alpha, alpha_dual):
    """x,s get alpha; y get alpha (same as primal per Ipopt's default
    alpha_for_y=primal); z,v get the dual fraction-to-boundary step."""
    return Iterate(
        x=it.x + alpha * step.x,
        s=it.s + alpha * step.s,
        y_c=it.y_c + alpha * step.y_c,
        y_d=it.y_d + alpha * step.y_d,
        z_L=it.z_L + alpha_dual * step.z_L,
        z_U=it.z_U + alpha_dual * step.z_U,
        v_L=it.v_L + alpha_dual * step.v_L,
        v_U=it.v_U + alpha_dual * step.v_U)


def line_search(nlp: CanonicalNLP, opts: Options, it: Iterate, ev: Evals,
                sr: StepResult, mu, tau, fs: FilterState,
                theta_min, theta_max, penalty_nu=None,
                corr=None) -> LineSearchResult:
    """``corr`` (optional): a higher-order corrector pre-trial
    (FilterLSAcceptor::TryCorrector, IpFilterLSAcceptor.cpp:655-880) —
    a dict with ``trial`` (Iterate), ``alpha_pr``, ``alpha_du``, ``active``
    (dynamic bool).  The corrector trial is tested FIRST against the filter
    (at the uncorrected first-trial step size, :846); if acceptable the
    backtracking loop never runs."""
    dtype = it.x.dtype
    step = sr.step
    use_penalty = opts.line_search_method == "penalty"

    # Current-point quantities.
    theta = _theta(nlp, ev.c, ev.d, it.s,
                   opts.constraint_violation_norm_type)
    phi = barrier_obj(nlp, it, ev.f, mu, opts.kappa_d)
    gphi_x = (grad_barrier_x(nlp, it, ev.grad_f, mu, opts.kappa_d))
    gphi_s = grad_barrier_s(nlp, it, mu, opts.kappa_d)
    gphi_dx = jnp.dot(gphi_x, step.x) + jnp.dot(gphi_s, step.s)

    alpha_max, alpha_dual = fraction_to_boundary(nlp, it, step, tau)

    # alpha_min, eq. (23) / CalculateAlphaMin.
    descent = gphi_dx < 0
    mg = -gphi_dx
    safe_mg = jnp.maximum(mg, jnp.finfo(dtype).tiny)
    term_phi = opts.gamma_phi * theta / safe_mg
    term_sw = (opts.delta * theta ** opts.s_theta) / safe_mg ** opts.s_phi
    amin_case1 = jnp.minimum(jnp.minimum(opts.gamma_theta, term_phi), term_sw)
    amin_case2 = jnp.minimum(opts.gamma_theta, term_phi)
    alpha_min = opts.alpha_min_frac * jnp.where(
        descent,
        jnp.where(theta <= theta_min, amin_case1, amin_case2),
        opts.gamma_theta)

    def switching(alpha):
        return jnp.logical_and(
            descent,
            alpha * safe_mg ** opts.s_phi > opts.delta * theta ** opts.s_theta)

    # --- l1-penalty acceptor (PenaltyLSAcceptor, IpPenaltyLSAcceptor.cpp):
    # nu >= |grad phi . d| / ((1 - rho) theta) + safety; Armijo on
    # Phi_nu = phi + nu * theta with model decrease Dphi = gphi.d - nu*theta.
    if use_penalty:
        rho_pen = 0.1  # Ipopt's nu_update rho
        nu_req = jnp.where(theta > 0,
                           jnp.abs(gphi_dx) / ((1.0 - rho_pen)
                                               * jnp.maximum(theta, 1e-30)),
                           0.0)
        nu = jnp.maximum(penalty_nu, nu_req + 1.0)
    else:
        nu = penalty_nu if penalty_nu is not None else jnp.zeros((), dtype)

    def acceptable3(alpha, theta_t, phi_t):
        """Returns (accept, is_ftype, rejected_by_filter)."""
        if use_penalty:
            Dphi = gphi_dx - nu * theta
            lhs = (phi_t + nu * theta_t) - (phi + nu * theta)
            accept = lhs <= opts.eta_phi * alpha * jnp.minimum(Dphi, 0.0)
            # no filter augmentation, never a filter rejection
            return accept, jnp.ones((), bool), jnp.zeros((), bool)
        in_filter = filter_acceptable(fs, theta_t, phi_t)
        to_filter = jnp.logical_and(in_filter, theta_t <= theta_max)
        sw = switching(alpha)
        armijo = phi_t <= phi + opts.eta_phi * alpha * gphi_dx
        suff = jnp.logical_or(theta_t <= (1.0 - opts.gamma_theta) * theta,
                              phi_t <= phi - opts.gamma_phi * theta)
        ftype_case = jnp.logical_and(theta <= theta_min, sw)
        acc_vs_curr = jnp.where(ftype_case, armijo, suff)
        # Ipopt also rejects absurd barrier increases (obj_max_inc orders).
        basval = jnp.maximum(1.0, jnp.abs(phi))
        not_absurd = phi_t <= phi + 10.0 ** opts.obj_max_inc * basval
        accept = jnp.logical_and(jnp.logical_and(to_filter, acc_vs_curr), not_absurd)
        is_ftype = jnp.logical_and(ftype_case, armijo)
        return accept, is_ftype, jnp.logical_not(in_filter)

    def acceptable(alpha, theta_t, phi_t):
        acc, isf, _ = acceptable3(alpha, theta_t, phi_t)
        return acc, isf

    # --- main backtracking loop -----------------------------------------
    def eval_trial(alpha):
        it_t = _trial_point(it, step, alpha, alpha_dual)
        it_t, f_t, c_t, d_t, theta_t, phi_t = _eval_trial_magic(
            nlp, opts, it_t, mu)
        return it_t, f_t, c_t, d_t, theta_t, phi_t

    class Carry(NamedTuple):
        k: jnp.ndarray
        alpha: jnp.ndarray
        done: jnp.ndarray
        accepted: jnp.ndarray
        ftype: jnp.ndarray
        it_t: Iterate
        f_t: jnp.ndarray
        c_t: jnp.ndarray
        d_t: jnp.ndarray
        first: tuple              # (it, f, c, d, theta, phi) at the alpha_max trial
        used_soc: jnp.ndarray
        alpha_used: jnp.ndarray
        n_soc_rounds: jnp.ndarray
        rej_filter: jnp.ndarray   # last evaluated trial was filter-blocked

    def try_soc(alpha, c_t, d_t, it_t_s):
        """Second-order corrections (A-5.7).  Bounded fori over max_soc rounds,
        each: c_soc = alpha*c + c(trial), resolve with saved factorization."""
        def soc_body(p, carry):
            (best_acc, best_ftype, best_it, best_f, best_c, best_d,
             c_soc, dms_soc, theta_old, active, n_rounds, alpha_soc) = carry
            dsoc = soc_direction(nlp, opts, it, ev, sr.fac, sr.K, mu,
                                 c_soc, dms_soc, alpha_soc=alpha_soc)
            # pin to the iterate dtype (a float64 factorization_dtype
            # backsolve must not leak f64 into the f32 SOC carry)
            dsoc = jax.tree.map(lambda v: v.astype(it.x.dtype), dsoc)
            a_soc, a_soc_dual = fraction_to_boundary(nlp, it, dsoc, tau)
            it_soc = _trial_point(it, dsoc, a_soc, alpha_dual)
            f_s, c_s, d_s, th_s, ph_s = _eval_theta_phi(nlp, opts, it_soc, mu)
            acc, isf = acceptable(a_soc, th_s, ph_s)
            acc = jnp.logical_and(acc, active)
            # continue SOC only while theta decreases enough (kappa_soc)
            keep_going = jnp.logical_and(active,
                                         jnp.logical_and(jnp.logical_not(acc),
                                                         th_s <= opts.kappa_soc * theta_old))
            out = (jnp.logical_or(best_acc, acc),
                   jnp.where(acc, isf, best_ftype),
                   jax.tree.map(lambda a, b: jnp.where(acc, b, a), best_it, it_soc),
                   jnp.where(acc, f_s, best_f),
                   jnp.where(acc, c_s, best_c),
                   jnp.where(acc, d_s, best_d),
                   a_soc * c_soc + c_s, a_soc * dms_soc + (d_s - it_soc.s),
                   th_s, keep_going,
                   n_rounds + active.astype(jnp.int32),
                   a_soc)
            return out

        c_soc0 = alpha * ev.c + c_t
        dms0 = alpha * (ev.d - it.s) + (d_t - it_t_s)
        init = (jnp.zeros((), bool), jnp.zeros((), bool), it, ev.f, ev.c, ev.d,
                c_soc0, dms0,
                _theta(nlp, c_t, d_t, it_t_s,
                       opts.constraint_violation_norm_type),
                jnp.ones((), bool), jnp.zeros((), jnp.int32),
                alpha)
        out = lax.fori_loop(0, opts.max_soc, soc_body, init)
        return out[:6] + (out[10],)

    def body(cy: Carry) -> Carry:
        alpha = cy.alpha
        it_t, f_t, c_t, d_t, theta_t, phi_t = eval_trial(alpha)
        acc, isf, rejf = acceptable3(alpha, theta_t, phi_t)
        # accept_after_max_steps (IpBacktrackingLineSearch.cpp:749): force
        # acceptance of the trial once this many backtracks were taken.
        if opts.accept_after_max_steps >= 0:
            acc = jnp.logical_or(acc, cy.k >= opts.accept_after_max_steps)

        def with_soc(_):
            return try_soc(alpha, c_t, d_t, it_t.s)

        def without_soc(_):
            return (jnp.zeros((), bool), jnp.zeros((), bool), it_t, f_t, c_t,
                    d_t, jnp.zeros((), jnp.int32))

        if opts.max_soc > 0:
            # SOC attempt: only on the *first* trial, when rejected and the
            # constraint violation did not improve (A-5.7 trigger).
            do_soc = jnp.logical_and(
                jnp.logical_and(cy.k == 0, jnp.logical_not(acc)),
                theta_t >= theta)
            s_acc, s_ftype, s_it, s_f, s_c, s_d, s_rounds = lax.cond(
                do_soc, with_soc, without_soc, None)
        else:
            s_acc, s_ftype, s_it, s_f, s_c, s_d, s_rounds = without_soc(None)

        final_acc = jnp.logical_or(acc, s_acc)
        pick_soc = jnp.logical_and(s_acc, jnp.logical_not(acc))
        it_sel = jax.tree.map(lambda a, b: jnp.where(pick_soc, b, a), it_t, s_it)
        f_sel = jnp.where(pick_soc, s_f, f_t)
        c_sel = jnp.where(pick_soc, s_c, c_t)
        d_sel = jnp.where(pick_soc, s_d, d_t)
        ftype_sel = jnp.where(pick_soc, s_ftype, isf)

        first_now = (it_t, f_t, c_t, d_t, theta_t, phi_t)
        first_sel = jax.tree.map(
            lambda a, b, k0=cy.k == 0: jnp.where(k0, b, a), cy.first, first_now)

        # Step to next alpha; stop if accepted or alpha below alpha_min.
        next_alpha = alpha * opts.alpha_red_factor
        done = jnp.logical_or(final_acc, next_alpha < alpha_min)
        return Carry(
            k=cy.k + 1, alpha=next_alpha, done=done, accepted=final_acc,
            ftype=ftype_sel, it_t=it_sel, f_t=f_sel, c_t=c_sel, d_t=d_sel,
            first=first_sel,
            used_soc=jnp.logical_or(cy.used_soc, pick_soc),
            alpha_used=alpha,
            n_soc_rounds=cy.n_soc_rounds + s_rounds,
            rej_filter=jnp.logical_and(jnp.logical_not(final_acc), rejf))

    def cond(cy: Carry):
        return jnp.logical_and(jnp.logical_not(cy.done),
                               cy.k < opts.max_backtracking_steps)

    it0 = _trial_point(it, step, alpha_max, alpha_dual)
    first0 = (it0, ev.f, ev.c, ev.d, jnp.asarray(jnp.inf, dtype),
              jnp.asarray(jnp.inf, dtype))
    # --- corrector pre-trial (TryCorrector): test the corrected full step
    # against the acceptance criteria at the UNCORRECTED first-trial alpha;
    # on success the init carry is already done/accepted and the loop body
    # never executes.
    corr_acc = jnp.zeros((), bool)
    corr_tuple = None
    if corr is not None:
        c_it, c_f, c_c, c_d, c_th, c_ph = _eval_trial_magic(
            nlp, opts, corr["trial"], mu)
        c_ok, c_ftype = acceptable(alpha_max, c_th, c_ph)
        corr_acc = jnp.logical_and(c_ok, corr["active"])
        corr_tuple = (c_it, c_f, c_c, c_d, c_ftype)
    init = Carry(k=jnp.zeros((), jnp.int32), alpha=alpha_max,
                 done=corr_acc, accepted=corr_acc,
                 ftype=(corr_tuple[4] if corr_tuple is not None
                        else jnp.zeros((), bool)),
                 it_t=(corr_tuple[0] if corr_tuple is not None else it0),
                 f_t=(corr_tuple[1] if corr_tuple is not None else ev.f),
                 c_t=(corr_tuple[2] if corr_tuple is not None else ev.c),
                 d_t=(corr_tuple[3] if corr_tuple is not None else ev.d),
                 first=first0,
                 used_soc=jnp.zeros((), bool),
                 alpha_used=(corr["alpha_pr"] if corr is not None
                             else alpha_max),
                 n_soc_rounds=jnp.zeros((), jnp.int32),
                 rej_filter=jnp.zeros((), bool))

    if opts.accept_every_trial_step:
        it_t, f_t, c_t, d_t, theta_t, phi_t = eval_trial(alpha_max)
        out = Carry(k=jnp.ones((), jnp.int32), alpha=alpha_max,
                    done=jnp.ones((), bool), accepted=jnp.ones((), bool),
                    ftype=jnp.ones((), bool), it_t=it_t, f_t=f_t, c_t=c_t,
                    d_t=d_t, first=(it_t, f_t, c_t, d_t, theta_t, phi_t),
                    used_soc=jnp.zeros((), bool),
                    alpha_used=alpha_max, n_soc_rounds=jnp.zeros((), jnp.int32),
                    rej_filter=jnp.zeros((), bool))
    else:
        out = lax.while_loop(cond, body, init)

    # Filter augmentation for accepted non-f-type iterations (A-6).
    augment = jnp.logical_and(out.accepted, jnp.logical_not(out.ftype))
    fs_new = filter_augment(fs, theta, phi, opts.gamma_theta, opts.gamma_phi)
    fs_out = jax.tree.map(lambda a, b: jnp.where(augment, b, a), fs, fs_new)

    f_it, f_f, f_c, f_d, f_th, f_ph = out.first
    return LineSearchResult(
        accepted=out.accepted, alpha_primal=out.alpha_used,
        alpha_dual=alpha_dual, trial=out.it_t, trial_ev_f=out.f_t,
        trial_c=out.c_t, trial_d=out.d_t, n_backtracks=out.k,
        used_soc=out.used_soc, ftype=out.ftype, filter=fs_out,
        theta_curr=theta, phi_curr=phi, penalty_nu=nu,
        first_trial=f_it, first_f=f_f, first_c=f_c, first_d=f_d,
        first_theta=f_th, first_phi=f_ph,
        n_evals=out.k + out.n_soc_rounds + (1 if corr is not None else 0),
        n_soc_rounds=out.n_soc_rounds,
        last_rej_filter=out.rej_filter)


def compute_alpha_for_y(nlp: CanonicalNLP, opts: Options, it: Iterate,
                        step: Iterate, trial: Iterate, alpha_primal,
                        alpha_dual):
    """Step size for the equality-constraint multipliers y — PerformDualStep
    (IpBacktrackingLineSearch.cpp:908-990).  Dispatch is static on
    opts.alpha_for_y; 'acceptor' falls back to the acceptor's own rule
    ('primal' for the filter/penalty acceptors)."""
    kind = opts.alpha_for_y
    if kind in ("primal", "acceptor"):
        return alpha_primal
    if kind == "bound-mult":
        return alpha_dual
    if kind == "min":
        return jnp.minimum(alpha_primal, alpha_dual)
    if kind == "max":
        return jnp.maximum(alpha_primal, alpha_dual)
    if kind == "full":
        return jnp.ones_like(alpha_primal)
    if kind in ("primal-and-full", "dual-and-full"):
        base = alpha_primal if kind == "primal-and-full" else alpha_dual
        dxnorm = jnp.maximum(jnp.max(jnp.abs(step.x), initial=0.0),
                             jnp.max(jnp.abs(step.s), initial=0.0))
        return jnp.where(dxnorm <= opts.alpha_for_y_tol,
                         jnp.ones_like(base), base)
    # min-dual-infeas / safer-min-dual-infeas: minimize the dual
    # infeasibility along delta_y at the new primal point with the old y
    # (grad_lag is affine in alpha_y, so ||.||_2^2 has a closed-form
    # minimizer alpha* = -b/a).
    _, vjp_c = jax.vjp(nlp.eval_c, trial.x)
    _, vjp_d = jax.vjp(nlp.eval_d, trial.x)
    jty = vjp_c(step.y_c)[0] + vjp_d(step.y_d)[0]
    gl_x = (nlp.eval_grad_f(trial.x) + vjp_c(it.y_c)[0] + vjp_d(it.y_d)[0]
            - trial.z_L + trial.z_U)
    gl_s = -it.y_d - trial.v_L + trial.v_U
    a = jnp.sum(jty * jty) + jnp.sum(step.y_d * step.y_d)
    b = jnp.dot(gl_x, jty) - jnp.dot(gl_s, step.y_d)
    alpha = -b / jnp.maximum(a, jnp.finfo(trial.x.dtype).tiny)
    if kind == "safer-min-dual-infeas":
        return jnp.minimum(jnp.maximum(alpha_primal, alpha_dual),
                           jnp.maximum(alpha, jnp.minimum(alpha_primal,
                                                          alpha_dual)))
    return jnp.clip(alpha, 0.0, 1.0)
