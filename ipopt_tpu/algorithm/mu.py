"""Barrier parameter strategies.

Reference parity:
- ``MonotoneMuUpdate`` (``src/Algorithm/IpMonotoneMuUpdate.cpp``): Fiacco-
  McCormick — once the barrier problem is solved to ``kappa_epsilon * mu``
  (kappa_epsilon = ``barrier_tol_factor``), update

      mu+ = max( min(kappa_mu * mu, mu^theta_mu), mu_min_bound )

  where mu_min_bound = min(tol, compl_inf_tol)/(barrier_tol_factor + 1) and
  mu_target; tau = max(tau_min, 1 - mu).  The decrease loop repeats while the
  new barrier problem is already converged (superlinear phase skips levels).
- ``AdaptiveMuUpdate`` + oracles (LOQO / probing / quality function) live in
  this module too (added incrementally).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..options import Options
from ..types import Iterate
from ..kkt import slacks, fraction_to_boundary


class MuState(NamedTuple):
    mu: jnp.ndarray
    tau: jnp.ndarray


def mu_init_state(opts: Options, dtype) -> MuState:
    mu = jnp.asarray(opts.mu_init, dtype)
    tau = jnp.maximum(opts.tau_min, 1.0 - mu)
    return MuState(mu=mu, tau=tau)


def _new_mu_tau(mu, opts: Options):
    mu_min_bound = jnp.maximum(
        opts.mu_target,
        min(opts.tol, opts.compl_inf_tol) / (opts.barrier_tol_factor + 1.0))
    new_mu = jnp.maximum(
        jnp.minimum(opts.mu_linear_decrease_factor * mu,
                    mu ** opts.mu_superlinear_decrease_power),
        mu_min_bound)
    new_tau = jnp.maximum(opts.tau_min, 1.0 - new_mu)
    return new_mu, new_tau


def monotone_mu_update(opts: Options, ms: MuState, barrier_err) -> MuState:
    """One call per IPM iteration (IpIpoptAlg.cpp:368 UpdateBarrierParameter).

    ``barrier_err`` is E_mu at the current iterate for a *given* mu; the
    sub-problem is converged when E_mu <= kappa_epsilon * mu.  The decrease
    repeats (bounded loop) because after a superlinear decrease the new barrier
    problem may already be converged — matching the reference's inner while
    loop in MonotoneMuUpdate::UpdateBarrierParameter.

    Note: the reference re-evaluates E_mu for each trial mu.  E_mu depends on
    mu only through the complementarity block: E_mu = max(dual/s_d, primal,
    max_i |compl_i - mu|/s_c).  We receive a callable-free approximation: the
    caller passes a function of mu instead — to stay jit-friendly we pass the
    three components and recompute the max here.
    """
    raise NotImplementedError("use monotone_mu_update_components")


def monotone_mu_update_components(opts: Options, ms: MuState,
                                  dual_s, primal, compl_terms_max_fn,
                                  max_rounds=None) -> MuState:
    """dual_s: dual_inf/s_d; primal: primal_inf; compl_terms_max_fn(mu) ->
    max_i |slack_i * mult_i - mu| / s_c  as a jnp function of mu.

    ``max_rounds`` caps the inner decrease loop: with
    mu_allow_fast_monotone_decrease=no the reference stops after one level
    except on the very first update (IpMonotoneMuUpdate.cpp:170-182) — the
    caller passes 1 or 30 accordingly."""
    if max_rounds is None:
        max_rounds = jnp.asarray(30, jnp.int32)

    def err_for(mu):
        return jnp.maximum(jnp.maximum(dual_s, primal), compl_terms_max_fn(mu))

    def cond(carry):
        mu, tau, rounds = carry
        converged = err_for(mu) <= opts.barrier_tol_factor * mu
        new_mu, _ = _new_mu_tau(mu, opts)
        can_decrease = new_mu < mu
        return jnp.logical_and(jnp.logical_and(converged, can_decrease),
                               rounds < max_rounds)

    def body(carry):
        mu, tau, rounds = carry
        new_mu, new_tau = _new_mu_tau(mu, opts)
        return new_mu, new_tau, rounds + 1

    mu, tau, _ = lax.while_loop(cond, body, (ms.mu, ms.tau, jnp.zeros((), jnp.int32)))
    return MuState(mu=mu, tau=tau)


# ---------------------------------------------------------------------------
# Adaptive mu: oracles (IpLoqoMuOracle, IpProbingMuOracle,
# IpQualityFunctionMuOracle) and the free/monotone globalization
# (IpAdaptiveMuUpdate).
# ---------------------------------------------------------------------------

def avg_complementarity(nlp, it: Iterate):
    """Average slack*multiplier product over all finite bounds (curr_avrg_compl,
    IpIpoptCalculatedQuantities.cpp:3611-3660)."""
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    total = (jnp.sum(jnp.where(nlp.has_xL, sl_xL * it.z_L, 0.0))
             + jnp.sum(jnp.where(nlp.has_xU, sl_xU * it.z_U, 0.0))
             + jnp.sum(jnp.where(nlp.has_dL, sl_sL * it.v_L, 0.0))
             + jnp.sum(jnp.where(nlp.has_dU, sl_sU * it.v_U, 0.0)))
    ncomps = (jnp.sum(nlp.has_xL) + jnp.sum(nlp.has_xU)
              + jnp.sum(nlp.has_dL) + jnp.sum(nlp.has_dU))
    return jnp.where(ncomps > 0, total / jnp.maximum(ncomps, 1), 0.0), ncomps


def min_complementarity(nlp, it: Iterate):
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    inf = jnp.asarray(jnp.inf, it.x.dtype)
    m = jnp.minimum(
        jnp.minimum(jnp.min(jnp.where(nlp.has_xL, sl_xL * it.z_L, inf), initial=jnp.inf),
                    jnp.min(jnp.where(nlp.has_xU, sl_xU * it.z_U, inf), initial=jnp.inf)),
        jnp.minimum(jnp.min(jnp.where(nlp.has_dL, sl_sL * it.v_L, inf), initial=jnp.inf),
                    jnp.min(jnp.where(nlp.has_dU, sl_sU * it.v_U, inf), initial=jnp.inf)))
    return m


def loqo_mu(nlp, it: Iterate, opts: Options):
    """LOQO centrality rule (IpLoqoMuOracle.cpp): sigma = 0.1 * min(0.05 *
    (1 - xi)/xi, 2)^3 with xi = min(compl)/avg(compl); mu = sigma * avg."""
    avg, ncomps = avg_complementarity(nlp, it)
    mn = min_complementarity(nlp, it)
    xi = jnp.where(avg > 0, mn / jnp.maximum(avg, 1e-300), 1.0)
    xi = jnp.clip(xi, 1e-12, 1.0)
    sigma = 0.1 * jnp.minimum(0.05 * (1.0 - xi) / xi, 2.0) ** 3
    return jnp.where(ncomps > 0, sigma * avg, 0.0)


def probing_mu(nlp, it: Iterate, opts: Options, step_aff: Iterate):
    """Mehrotra probing (IpProbingMuOracle.cpp): take the affine-scaling step
    to the boundary, measure the predicted average complementarity, and set
    sigma = (mu_aff / mu_avg)^3."""
    avg, ncomps = avg_complementarity(nlp, it)
    tau_zero = jnp.asarray(1.0, it.x.dtype)  # probing uses tau = 1 (to boundary)
    a_pr, a_du = fraction_to_boundary(nlp, it, step_aff, tau_zero)
    sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
    nxL = jnp.where(nlp.has_xL, (sl_xL + a_pr * step_aff.x) * (it.z_L + a_du * step_aff.z_L), 0.0)
    nxU = jnp.where(nlp.has_xU, (sl_xU - a_pr * step_aff.x) * (it.z_U + a_du * step_aff.z_U), 0.0)
    nsL = jnp.where(nlp.has_dL, (sl_sL + a_pr * step_aff.s) * (it.v_L + a_du * step_aff.v_L), 0.0)
    nsU = jnp.where(nlp.has_dU, (sl_sU - a_pr * step_aff.s) * (it.v_U + a_du * step_aff.v_U), 0.0)
    mu_aff = (jnp.sum(nxL) + jnp.sum(nxU) + jnp.sum(nsL) + jnp.sum(nsU)) \
        / jnp.maximum(ncomps, 1)
    sigma = jnp.clip((mu_aff / jnp.maximum(avg, 1e-300)) ** 3,
                     opts.sigma_min, opts.sigma_max)
    return jnp.where(ncomps > 0, sigma * avg, 0.0)


def quality_function_mu(nlp, it: Iterate, opts: Options, step_aff: Iterate,
                        step_cent: Iterate, dual_inf, primal_inf, tau):
    """Quality-function oracle (IpQualityFunctionMuOracle.cpp): golden-section
    search over sigma minimizing the (2-norm-squared) linear model of the KKT
    error after the combined step  d(sigma) = d_aff + sigma*mu_avg * d_cent.

    dual/primal parts use the linear model (1-alpha)*current norm; the
    complementarity part is evaluated from the predicted products.
    """
    avg, ncomps = avg_complementarity(nlp, it)
    dtype = it.x.dtype
    nsafe = jnp.maximum(ncomps, 1)

    def qf(sigma):
        mu_c = sigma * avg
        step = jax.tree.map(lambda a, c: a + mu_c * c, step_aff, step_cent)
        a_pr, a_du = fraction_to_boundary(nlp, it, step, tau)
        sl_xL, sl_xU, sl_sL, sl_sU = slacks(nlp, it)
        nxL = jnp.where(nlp.has_xL, (sl_xL + a_pr * step.x) * (it.z_L + a_du * step.z_L), 0.0)
        nxU = jnp.where(nlp.has_xU, (sl_xU - a_pr * step.x) * (it.z_U + a_du * step.z_U), 0.0)
        nsL = jnp.where(nlp.has_dL, (sl_sL + a_pr * step.s) * (it.v_L + a_du * step.v_L), 0.0)
        nsU = jnp.where(nlp.has_dU, (sl_sU - a_pr * step.s) * (it.v_U + a_du * step.v_U), 0.0)
        du = (1.0 - a_du) * dual_inf
        pr = (1.0 - a_pr) * primal_inf
        # quality_function_norm_type (IpQualityFunctionMuOracle.cpp:55-120)
        norm = opts.quality_function_norm_type
        if norm == "1-norm":
            compl_v = (jnp.sum(jnp.abs(nxL)) + jnp.sum(jnp.abs(nxU))
                       + jnp.sum(jnp.abs(nsL)) + jnp.sum(jnp.abs(nsU))) / nsafe
            quality = du + pr + compl_v
        elif norm == "max-norm":
            compl_v = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(nxL), initial=0.0),
                            jnp.max(jnp.abs(nxU), initial=0.0)),
                jnp.maximum(jnp.max(jnp.abs(nsL), initial=0.0),
                            jnp.max(jnp.abs(nsU), initial=0.0)))
            quality = jnp.maximum(jnp.maximum(du, pr), compl_v)
        else:  # "2-norm-squared" (default) and "2-norm" (same argmin)
            compl_v = jnp.sqrt((jnp.sum(nxL ** 2) + jnp.sum(nxU ** 2)
                                + jnp.sum(nsL ** 2) + jnp.sum(nsU ** 2))
                               / nsafe)
            quality = du * du + pr * pr + compl_v * compl_v
            if norm == "2-norm":
                quality = jnp.sqrt(quality)
        # centrality / balancing terms (CentralityEnum / BalancingTermEnum)
        if (opts.quality_function_centrality != "none"
                or opts.quality_function_balancing_term != "none"):
            compl_avg = (jnp.sum(nxL) + jnp.sum(nxU) + jnp.sum(nsL)
                         + jnp.sum(nsU)) / nsafe
            inf_ = jnp.asarray(jnp.inf, dtype)
            compl_min = jnp.minimum(
                jnp.minimum(jnp.min(jnp.where(nlp.has_xL, nxL, inf_), initial=jnp.inf),
                            jnp.min(jnp.where(nlp.has_xU, nxU, inf_), initial=jnp.inf)),
                jnp.minimum(jnp.min(jnp.where(nlp.has_dL, nsL, inf_), initial=jnp.inf),
                            jnp.min(jnp.where(nlp.has_dU, nsU, inf_), initial=jnp.inf)))
            xi = jnp.clip(jnp.where(compl_avg > 0,
                                    compl_min / jnp.maximum(compl_avg, 1e-300),
                                    1.0), 1e-12, 1.0)
            cen = opts.quality_function_centrality
            if cen == "log":
                quality = quality - compl_v * jnp.log(xi)
            elif cen == "reciprocal":
                quality = quality + compl_v / xi
            elif cen == "cubed-reciprocal":
                quality = quality + compl_v / xi ** 3
            if opts.quality_function_balancing_term == "cubic":
                quality = quality + jnp.maximum(
                    0.0, jnp.maximum(du, pr) - compl_v) ** 3
        return quality

    # Golden-section on log(sigma), with the reference's two stopping
    # tolerances (PerformGoldenSection, IpQualityFunctionMuOracle.cpp:698-
    # 790): stop when the scaled interval shrinks below
    # quality_function_section_sigma_tol * |hi| or the qf values flatten to
    # within quality_function_section_qf_tol (relative), whichever first;
    # quality_function_max_section_steps bounds the loop.
    lo = jnp.asarray(jnp.log(opts.sigma_min), dtype)
    hi = jnp.asarray(jnp.log(opts.sigma_max), dtype)
    gr = 0.5 * (jnp.sqrt(5.0) - 1.0)
    tiny = jnp.finfo(dtype).tiny

    def mids(lo, hi):
        return hi - gr * (hi - lo), lo + gr * (hi - lo)

    m1_0, m2_0 = mids(lo, hi)

    def cond(carry):
        lo, hi, m1, m2, f1, f2, i = carry
        width_live = (hi - lo) >= (opts.quality_function_section_sigma_tol
                                   * jnp.maximum(jnp.abs(hi), 1.0))
        fmin = jnp.minimum(f1, f2)
        fmax = jnp.maximum(jnp.maximum(f1, f2), tiny)
        qf_live = (1.0 - fmin / fmax) >= opts.quality_function_section_qf_tol
        return jnp.logical_and(
            jnp.logical_and(width_live, qf_live),
            i < opts.quality_function_max_section_steps)

    def body(carry):
        lo, hi, m1, m2, f1, f2, i = carry
        shrink_hi = f1 < f2
        new_lo = jnp.where(shrink_hi, lo, m1)
        new_hi = jnp.where(shrink_hi, m2, hi)
        n1, n2 = mids(new_lo, new_hi)
        # golden-section reuse: shrinking the hi side makes old m1 the new
        # m2 (and vice versa) — one fresh qf evaluation per section
        nf1 = jnp.where(shrink_hi, qf(jnp.exp(n1)), f2)
        nf2 = jnp.where(shrink_hi, f1, qf(jnp.exp(n2)))
        return new_lo, new_hi, n1, n2, nf1, nf2, i + 1

    lo, hi, m1, m2, f1, f2, _ = lax.while_loop(
        cond, body,
        (lo, hi, m1_0, m2_0, qf(jnp.exp(m1_0)), qf(jnp.exp(m2_0)),
         jnp.zeros((), jnp.int32)))
    sigma = jnp.exp(jnp.where(f1 < f2, m1, m2))
    return jnp.where(ncomps > 0, sigma * avg, 0.0)


_OBJ_FILTER_CAP = 32


class AdaptiveMuState(NamedTuple):
    """Carry for AdaptiveMuUpdate's free/monotone mode switching.

    Supports both globalizations (IpAdaptiveMuUpdate.cpp:78-139):
    - "kkt-error": scaled KKT error must shrink within red_iters iterations;
    - "obj-constr-filter" (the reference default): the current (theta, f)
      pair must be acceptable to a dedicated filter, which is augmented with
      a margin on each free-mode iteration (filter_margin_fact).
    """

    free_mode: jnp.ndarray        # bool
    ref_kkt_error: jnp.ndarray    # reference error for progress monitoring
    no_progress_count: jnp.ndarray
    filt_theta: jnp.ndarray       # (_OBJ_FILTER_CAP,) obj-constr filter
    filt_f: jnp.ndarray
    filt_size: jnp.ndarray
    # r4 additions (negative sentinel = "not computed yet"):
    mu_max_dyn: jnp.ndarray = None       # mu_max_fact * avg_compl at start
    init_dual_inf: jnp.ndarray = None    # safeguard references
    init_primal_inf: jnp.ndarray = None  # (IpAdaptiveMuUpdate.cpp:766-774)
    just_switched: jnp.ndarray = None    # switched free->monotone this call


def adaptive_mu_init(dtype) -> AdaptiveMuState:
    inf = jnp.full((_OBJ_FILTER_CAP,), jnp.inf, dtype)
    neg = jnp.asarray(-1.0, dtype)
    return AdaptiveMuState(free_mode=jnp.ones((), bool),
                           ref_kkt_error=jnp.asarray(jnp.inf, dtype),
                           no_progress_count=jnp.zeros((), jnp.int32),
                           filt_theta=inf, filt_f=inf,
                           filt_size=jnp.zeros((), jnp.int32),
                           mu_max_dyn=neg, init_dual_inf=neg,
                           init_primal_inf=neg,
                           just_switched=jnp.zeros((), bool))


def adaptive_mu_update(opts: Options, ams: AdaptiveMuState, ms: MuState,
                       oracle_mu, dual_s, primal, compl_fn,
                       theta_curr=None, f_curr=None,
                       avg_compl_val=None, dual1_avg=None, primal1_avg=None,
                       fix_mu_val=None) -> tuple:
    """One adaptive update (IpAdaptiveMuUpdate.cpp:78-139, kkt-error
    globalization).  Returns (new AdaptiveMuState, new MuState).

    Free mode: mu straight from the oracle, floored by the lower-mu
    safeguard (adaptive_mu_safeguard_factor, :748-787) and capped at mu_max
    — which, while at its registered default, is initialized dynamically to
    mu_max_fact * avg_compl at the first call (:269-275).
    Globalization: the scaled KKT error E_0 must shrink by
    ``adaptive_mu_kkterror_red_fact`` within ``adaptive_mu_kkterror_red_iters``
    iterations, else fall back to monotone (Fiacco-McCormick) mode; return to
    free mode once the barrier problem for the monotone mu is solved.  The
    monotone entry level comes from ``fix_mu_val`` (the fixed_mu_oracle
    value; None = the average_compl fallback, NewFixedMu :583-623).
    """
    # adaptive_mu_kkt_norm_type (IpAdaptiveMuUpdate.cpp): combine the three
    # component norms per the selected norm (components themselves are
    # max-norm scalars — the per-entry vectors are already reduced upstream).
    compl0 = compl_fn(0.0)
    knorm = opts.adaptive_mu_kkt_norm_type
    if knorm == "1-norm":
        kkt_error = dual_s + primal + compl0
    elif knorm == "2-norm-squared":
        kkt_error = dual_s ** 2 + primal ** 2 + compl0 ** 2
    elif knorm == "2-norm":
        kkt_error = jnp.sqrt(dual_s ** 2 + primal ** 2 + compl0 ** 2)
    else:  # "max-norm"
        kkt_error = jnp.maximum(jnp.maximum(dual_s, primal), compl0)

    # --- effective mu_max (mu_max_fact, IpAdaptiveMuUpdate.cpp:269-275):
    # while mu_max is at its registered default the cap comes from
    # mu_max_fact * avg_compl frozen at the first adaptive call.
    from ..options import Options as _O
    _mu_max_is_default = opts.mu_max == _O.__dataclass_fields__[
        "mu_max"].default
    mu_max_dyn = ams.mu_max_dyn
    if _mu_max_is_default and avg_compl_val is not None:
        mu_max_dyn = jnp.where(ams.mu_max_dyn < 0,
                               opts.mu_max_fact * avg_compl_val,
                               ams.mu_max_dyn)
        mu_max_eff = jnp.where(mu_max_dyn > 0, mu_max_dyn, opts.mu_max)
    else:
        mu_max_eff = jnp.asarray(opts.mu_max, oracle_mu.dtype)

    # --- lower-mu safeguard (adaptive_mu_safeguard_factor, :748-787) ------
    init_d, init_p = ams.init_dual_inf, ams.init_primal_inf
    if opts.adaptive_mu_safeguard_factor != 0.0 and dual1_avg is not None:
        init_d = jnp.where(init_d < 0, jnp.maximum(1.0, dual1_avg), init_d)
        init_p = jnp.where(init_p < 0, jnp.maximum(1.0, primal1_avg), init_p)
        mu_guard = jnp.maximum(
            opts.adaptive_mu_safeguard_factor * dual1_avg / init_d,
            opts.adaptive_mu_safeguard_factor * primal1_avg / init_p)
        if opts.adaptive_mu_globalization == "kkt-error":
            mu_guard = jnp.minimum(mu_guard, ams.ref_kkt_error)
    else:
        mu_guard = jnp.zeros((), oracle_mu.dtype)

    mu_free = jnp.minimum(
        jnp.maximum(jnp.maximum(oracle_mu, opts.mu_min), mu_guard),
        mu_max_eff)
    tau_free = jnp.maximum(opts.tau_min, 1.0 - mu_free)

    filt_theta, filt_f, filt_size = ams.filt_theta, ams.filt_f, ams.filt_size
    if (opts.adaptive_mu_globalization == "obj-constr-filter"
            and theta_curr is not None):
        # CheckSufficientProgress, obj-constr-filter mode: the current
        # (theta, f) pair must not be dominated by the filter.
        blocked = jnp.any(jnp.logical_and(theta_curr >= ams.filt_theta,
                                          f_curr >= ams.filt_f))
        progress = jnp.logical_not(blocked)
        count = jnp.where(progress, 0, ams.no_progress_count + 1)
        new_ref = ams.ref_kkt_error
        switch_to_monotone = jnp.logical_and(ams.free_mode, blocked)
        # RememberCurrentPoint: augment with margin (filter_margin_fact /
        # filter_max_margin, IpAdaptiveMuUpdate.cpp).
        margin = jnp.minimum(opts.filter_max_margin,
                             opts.filter_margin_fact
                             * jnp.maximum(1.0, theta_curr))
        i = jnp.minimum(filt_size, _OBJ_FILTER_CAP - 1)
        aug = jnp.logical_and(ams.free_mode, progress)
        filt_theta = jnp.where(aug, filt_theta.at[i].set(theta_curr - margin),
                               filt_theta)
        filt_f = jnp.where(aug, filt_f.at[i].set(f_curr - margin), filt_f)
        filt_size = jnp.where(aug,
                              jnp.minimum(filt_size + 1, _OBJ_FILTER_CAP),
                              filt_size)
    elif opts.adaptive_mu_globalization == "never-monotone-mode":
        progress = jnp.ones((), bool)
        count = jnp.zeros((), jnp.int32)
        new_ref = ams.ref_kkt_error
        switch_to_monotone = jnp.zeros((), bool)
    else:  # "kkt-error"
        progress = kkt_error <= opts.adaptive_mu_kkterror_red_fact * ams.ref_kkt_error
        count = jnp.where(progress, 0, ams.no_progress_count + 1)
        new_ref = jnp.minimum(kkt_error, ams.ref_kkt_error)
        switch_to_monotone = jnp.logical_and(
            ams.free_mode, count >= opts.adaptive_mu_kkterror_red_iters)

    # Monotone mode machinery (switch back once sub-problem converged).
    # Entry level = NewFixedMu (IpAdaptiveMuUpdate.cpp:583-623): the
    # fixed_mu_oracle value (``fix_mu_val``), falling back to
    # adaptive_mu_monotone_init_factor * avg_compl, floored by the lower-mu
    # safeguard and mu_min.
    if fix_mu_val is not None:
        mono_entry_mu = fix_mu_val
    elif avg_compl_val is not None:
        mono_entry_mu = (opts.adaptive_mu_monotone_init_factor
                         * avg_compl_val)
    else:
        mono_entry_mu = (opts.adaptive_mu_monotone_init_factor
                         * compl_fn(0.0))
    mono_entry_mu = jnp.maximum(jnp.maximum(mono_entry_mu, mu_guard),
                                opts.mu_min)
    ms_for_mono = MuState(
        mu=jnp.where(switch_to_monotone, mono_entry_mu, ms.mu),
        tau=ms.tau)
    ms_mono = monotone_mu_update_components(opts, ms_for_mono, dual_s, primal,
                                            compl_fn)
    err_at_mu = jnp.maximum(jnp.maximum(dual_s, primal), compl_fn(ms.mu))
    back_to_free = jnp.logical_and(
        jnp.logical_not(ams.free_mode),
        err_at_mu <= opts.barrier_tol_factor * ms.mu)

    free_now = jnp.where(switch_to_monotone, False,
                         jnp.where(back_to_free, True, ams.free_mode))

    mu = jnp.where(free_now, mu_free, ms_mono.mu)
    tau = jnp.where(free_now, tau_free, ms_mono.tau)
    new_ams = AdaptiveMuState(
        free_mode=free_now,
        ref_kkt_error=jnp.where(switch_to_monotone,
                                jnp.asarray(jnp.inf, kkt_error.dtype), new_ref),
        no_progress_count=jnp.where(switch_to_monotone, 0, count),
        filt_theta=filt_theta, filt_f=filt_f, filt_size=filt_size,
        mu_max_dyn=mu_max_dyn, init_dual_inf=init_d, init_primal_inf=init_p,
        just_switched=switch_to_monotone)
    return new_ams, MuState(mu=mu, tau=tau)
