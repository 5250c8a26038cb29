"""Inexact-step algorithm: normal/tangential decomposition with iterative
KKT solves (Curtis-Schenk-Waechter, SIAM J. Sci. Comput. 32(6), 2010).

Reference parity (``src/Algorithm/Inexact/``, gated by ``inexact_algorithm``
in ``IpIpoptApplication.cpp:509-520``):
- ``InexactDoglegNormalStep`` (IpInexactDoglegNormal.cpp:90-260): normal step
  v toward feasibility by a dogleg between the Cauchy point of
  0.5||c + A v||^2 and an (inexact) Newton least-squares step, inside the
  trust region ||v|| <= omega * ||A^T c||; omega grows 10x (up to omega_max)
  while the region stays inactive.  The least-squares CG honors
  ``inexact_normal_tol`` / ``inexact_normal_max_iter``
  (IpInexactNormalTerminationTester.cpp:49-50).
- ``InexactSearchDirCalculator`` (IpInexactSearchDirCalc.cpp:30-220): the
  ``inexact_step_decomposition`` policy (always / adaptive / switch-once)
  decides whether the constraint rows require A d = A v (decomposed) or the
  full Newton A d = -c (undecomposed); the adaptive activation bit rides in
  the IPM carry and is updated from the accepted step size with
  ``inexact_decomposition_activate_tol`` / ``_inactivate_tol``
  (IpInexactLSAcceptor.cpp:450-470).
- ``InexactPDTerminationTester`` (IpInexactPDTerminationTester.cpp:220-730):
  tangential component condition TCC1 (||u|| <= tcc_psi ||v||), TCC2a
  (curvature >= tcc_theta mu^exp ||u||^2), TCC2b
  (grad_barr^T u + v^T W u + 0.5 u^T W u <= tcc_zeta ||v||), termination
  test 1 (residual + model-reduction with sigma = rho * tt_eps3), test 2
  (dual progress <= tt_kappa2 * ||grad phi + A^T y||, tried only when
  ||A^T c|| <= tt_eps2 * that norm), and test 3 (linearized feasibility
  gain >= tt_eps3 * the normal step's gain) — with the Hessian-perturbation
  escalation on failure and the pure-normal fallback.
- ``InexactPDSolver`` (IpInexactPDSolver.cpp:159-175):
  ``modify_hessian_with_slacks`` replaces the slack-block perturbation
  delta by mu * delta / slack^2 (scaled: + mu * delta on the s~ diagonal).
- ``InexactLSAcceptor``: penalty-function line search on
  phi_mu + nu * ||(c, d-s)||_2 with the exact nu update
  (IpInexactLSAcceptor.cpp:120-260) and the Curtis-Nocedal flexible penalty
  interval [nu_low, nu] (:330-366).
- Slack scaling (``InexactTSymScalingMethod`` / InexactCq::
  curr_scaling_slacks, IpInexactCq.cpp:90-125): all step norms and the
  tangential decomposition live in the slack-scaled space s~ = s / S with
  S = min(slack, slack_scale_max); ``inexact_linear_system_scaling=none``
  turns the scaling off.

TPU-native design: all operators are AD products (HVP/JVP/VJP) — no matrices
are materialized; the dogleg, CG (normal) and MINRES (tangential) loops are
bounded ``lax.while_loop``s; the trust-region factor, the two penalty
parameters, and the adaptive-decomposition bit ride in the IPM carry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import (Evals, sigmas, slacks, barrier_obj, grad_barrier_x,
                   grad_barrier_s, fraction_to_boundary,
                   recover_bound_mult_steps, condensed_rhs_parts)
from .step import StepResult
from .matrix_free import minres


class InexactAux(NamedTuple):
    """Scalars the penalty line search needs from the step computation."""
    uWu: jnp.ndarray                  # curvature of the tangential part
    tangential_norm: jnp.ndarray      # ||u|| (slack-scaled)
    norm_cplusAd: jnp.ndarray         # ||(c + Jc dx, (d-s) + Jd dx - ds)||_2
    theta2: jnp.ndarray               # ||(c, d-s)||_2 at the current point
    grad_barr_t_delta: jnp.ndarray    # grad phi . (dx, ds)


def _scaling_slacks(nlp: CanonicalNLP, it: Iterate, opts: Options):
    """S = the s-variable scaling slacks (InexactCq::curr_scaling_slacks,
    IpInexactCq.cpp:90-125): the distance to the nearest bound capped at
    ``slack_scale_max``, 1 where unbounded; identity when
    ``inexact_linear_system_scaling="none"``."""
    if opts.inexact_linear_system_scaling == "none":
        return jnp.ones_like(it.s)
    _, _, sl_sL, sl_sU = slacks(nlp, it)
    S = jnp.where(nlp.has_dL & nlp.has_dU, jnp.minimum(sl_sL, sl_sU),
                  jnp.where(nlp.has_dL, sl_sL,
                            jnp.where(nlp.has_dU, sl_sU, 1.0)))
    S = jnp.minimum(S, opts.slack_scale_max)
    return jnp.maximum(S, jnp.finfo(it.x.dtype).tiny)


def _cg(matvec, b, maxiter: int, rtol):
    """Plain CG for the SPD normal-step system (bounded while_loop)."""
    dtype = b.dtype
    bnorm = jnp.maximum(jnp.linalg.norm(b), jnp.finfo(dtype).tiny)

    def cond(c):
        k, x, r, p, rs = c
        return jnp.logical_and(k < maxiter, jnp.sqrt(rs) > rtol * bnorm)

    def body(c):
        k, x, r, p, rs = c
        Ap = matvec(p)
        denom = jnp.maximum(jnp.dot(p, Ap), jnp.finfo(dtype).tiny)
        alpha = rs / denom
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / jnp.maximum(rs, jnp.finfo(dtype).tiny)) * p
        return k + 1, x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    k0 = jnp.zeros((), jnp.int32)
    _, x, _, _, _ = lax.while_loop(cond, body, (k0, x0, b, b, jnp.dot(b, b)))
    return x


def decomposition_initial_cn(opts: Options):
    """Initial compute_normal per the step-decomposition policy
    (IpInexactSearchDirCalc.cpp:54-69): always -> True, adaptive and
    switch-once start undecomposed.  Returns None when the bit is static
    (policy "always") so non-adaptive programs carry no extra state."""
    if opts.inexact_step_decomposition == "always":
        return None
    return jnp.zeros((), bool)


def decomposition_next_cn(opts: Options, cn, alpha_primal_test):
    """Adaptive activation from the accepted step size
    (IpInexactLSAcceptor::UpdateForNextIteration, :450-470)."""
    if cn is None:
        return None
    nxt = jnp.where(jnp.logical_and(jnp.logical_not(cn),
                                    alpha_primal_test
                                    < opts.inexact_decomposition_activate_tol),
                    True, cn)
    if opts.inexact_step_decomposition == "adaptive":
        nxt = jnp.where(jnp.logical_and(
            cn, alpha_primal_test > opts.inexact_decomposition_inactivate_tol),
            False, nxt)
    # switch-once: once activated, stays activated
    return nxt


def inexact_search_direction(nlp: CanonicalNLP, opts: Options, it: Iterate,
                             ev: Evals, mu, delta_w_last, tr_omega,
                             nu=None, compute_normal=None,
                             last_ls_count=None):
    """Dogleg normal step + inexact tangential/total step.

    ``nu``: current penalty parameter (for the TT1 model-reduction
    condition); ``compute_normal``: traced bool from the carry (None =
    statically decomposed, policy "always").

    Returns (StepResult, new_tr_omega, InexactAux)."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = it.x.dtype
    x = it.x
    sig = sigmas(nlp, it)
    S = _scaling_slacks(nlp, it, opts)
    c = ev.c
    dms = ev.d - it.s
    theta2 = jnp.sqrt(jnp.sum(c ** 2) + jnp.sum(dms ** 2))
    if nu is None:
        nu = jnp.ones((), dtype)
    cn = (jnp.ones((), bool) if compute_normal is None else compute_normal)

    # --- AD operator products (no materialized matrices) -------------------
    def grad_lag(xx):
        g = nlp.eval_grad_f(xx)
        if me:
            g = g + jax.vjp(nlp.eval_c, xx)[1](it.y_c)[0]
        if mi:
            g = g + jax.vjp(nlp.eval_d, xx)[1](it.y_d)[0]
        return g

    def Wv(v):
        return jax.jvp(grad_lag, (x,), (v,))[1]

    def Jc(v):
        return (jax.jvp(nlp.eval_c, (x,), (v,))[1] if me
                else jnp.zeros((0,), dtype))

    def JcT(u):
        return jax.vjp(nlp.eval_c, x)[1](u)[0] if me else jnp.zeros((n,), dtype)

    def Jd(v):
        return (jax.jvp(nlp.eval_d, (x,), (v,))[1] if mi
                else jnp.zeros((0,), dtype))

    def JdT(u):
        return jax.vjp(nlp.eval_d, x)[1](u)[0] if mi else jnp.zeros((n,), dtype)

    # Slack-scaled constraint operator Atilde (x, s~) -> (c-rows, d-rows).
    def A(vx, vs):
        return Jc(vx), Jd(vx) - S * vs

    def AT(uc, ud):
        return JcT(uc) + JdT(ud), -S * ud

    # --- Cauchy step of 0.5||(c, dms) + A v||^2 ----------------------------
    g_x, g_s = AT(c, dms)                       # gradient (A^T c)
    g_norm2 = jnp.sum(g_x ** 2) + jnp.sum(g_s ** 2)
    g_norm = jnp.sqrt(g_norm2)
    Ag_c, Ag_d = A(g_x, g_s)
    Ag_norm2 = jnp.maximum(jnp.sum(Ag_c ** 2) + jnp.sum(Ag_d ** 2),
                           jnp.finfo(dtype).tiny)
    alpha_cs = jnp.minimum(tr_omega, g_norm2 / Ag_norm2)
    vc_x, vc_s = -alpha_cs * g_x, -alpha_cs * g_s

    # --- Newton least-squares step: (A A^T + dn) w = -(c, dms), v = A^T w --
    # CG controls: IpInexactNormalTerminationTester.cpp:49-50.
    dn = jnp.asarray(1e-10, dtype)

    def AAt(u_flat):
        uc, ud = u_flat[:me], u_flat[me:]
        tx, ts = AT(uc, ud)
        rc, rd = A(tx, ts)
        return jnp.concatenate([rc + dn * uc, rd + dn * ud])

    w = _cg(AAt, -jnp.concatenate([c, dms]),
            maxiter=min(me + mi, opts.inexact_normal_max_iter),
            rtol=opts.inexact_normal_tol)
    vn_x, vn_s = AT(w[:me], w[me:])

    # --- Dogleg combination inside ||v|| <= omega * ||A^T c|| --------------
    tr_radius = tr_omega * g_norm
    vn_norm = jnp.sqrt(jnp.sum(vn_x ** 2) + jnp.sum(vn_s ** 2))
    vc_norm = jnp.sqrt(jnp.sum(vc_x ** 2) + jnp.sum(vc_s ** 2))
    cauchy_hits_tr = alpha_cs == tr_omega
    newton_inside = vn_norm <= tr_radius
    # Segment v_c + lam (v_n - v_c) intersecting the trust region.
    cdotn = jnp.dot(vn_x, vc_x) + jnp.dot(vn_s, vc_s)
    a_q = jnp.maximum(vn_norm ** 2 - 2 * cdotn + vc_norm ** 2,
                      jnp.finfo(dtype).tiny)
    b_q = 2 * (cdotn - vn_norm ** 2)
    c_q = vn_norm ** 2 - tr_radius ** 2
    disc = jnp.maximum(b_q * b_q - 4 * a_q * c_q, 0.0)
    lam = jnp.clip((-b_q - jnp.sqrt(disc)) / (2 * a_q), 0.0, 1.0)
    vd_x = (1 - lam) * vn_x + lam * vc_x
    vd_s = (1 - lam) * vn_s + lam * vc_s

    v_x = jnp.where(cauchy_hits_tr, vc_x,
                    jnp.where(newton_inside, vn_x, vd_x))
    v_s = jnp.where(cauchy_hits_tr, vc_s,
                    jnp.where(newton_inside, vn_s, vd_s))
    feasible_already = theta2 <= 1e-12
    use_v = jnp.logical_and(cn, jnp.logical_not(feasible_already))
    v_x = jnp.where(use_v, v_x, 0.0)
    v_s = jnp.where(use_v, v_s, 0.0)
    tr_inactive = jnp.logical_or(feasible_already, newton_inside)
    new_omega = jnp.where(tr_inactive,
                          jnp.minimum(opts.omega_max, 10.0 * tr_omega),
                          tr_omega)

    # --- total step: MINRES on the scaled PD system ------------------------
    # Constraint rows require A d = A v (decomposed) or the full Newton
    # A d = -c (undecomposed) — IpInexactSearchDirCalc.cpp:146-171.
    parts = condensed_rhs_parts(nlp, it, ev, mu, opts.kappa_d)
    Av_c, Av_d = A(v_x, v_s)
    r_x = parts[0]
    r_st = S * parts[1]
    rows_c = jnp.where(cn, Av_c, -c)
    rows_d = jnp.where(cn, Av_d, -dms)
    N = n + mi + me + mi
    rhs = jnp.concatenate([r_x, r_st, rows_c, rows_d])
    delta_cd = (opts.jacobian_regularization_value
                * mu ** opts.jacobian_regularization_exponent)
    tcc_tol = opts.tcc_theta * mu ** opts.tcc_theta_mu_exponent
    # inexact_desired_pd_residual_iter: Krylov iterations willing to be
    # spent on the desired residual ratio (IpInexactPDTerminationTester
    # .cpp:267); here it widens the MINRES iteration budget.
    maxiter = min(4 * N, max(400, opts.inexact_desired_pd_residual_iter))

    # The reference's SMART tests tighten with the NLP error; tie the target
    # relative residual to mu so late iterations solve accurately.
    pd_rtol = jnp.minimum(opts.inexact_desired_pd_residual,
                          jnp.maximum(0.01 * mu, 100.0 * jnp.finfo(dtype).eps))

    # --- current-point norms for the SMART termination tests ---------------
    gphi_x = grad_barrier_x(nlp, it, ev.grad_f, mu, opts.kappa_d)
    gphi_s = grad_barrier_s(nlp, it, mu, opts.kappa_d)
    # curr_tt2 = ||grad phi + A~^T y|| (scaled space)
    tt2_x, tt2_s = AT(it.y_c, it.y_d)
    tt2_x = gphi_x + tt2_x
    tt2_s = S * gphi_s + tt2_s
    curr_tt2 = jnp.sqrt(jnp.sum(tt2_x ** 2) + jnp.sum(tt2_s ** 2))
    cAv_norm = jnp.sqrt(jnp.sum((c + Av_c) ** 2) + jnp.sum((dms + Av_d) ** 2))
    curr_tt1 = jnp.sqrt(curr_tt2 ** 2
                        + jnp.where(cn, cAv_norm, theta2) ** 2)
    eps_m = jnp.finfo(dtype).eps
    try_tt2 = g_norm <= opts.tt_eps2 * curr_tt2
    sigma_mrc = opts.rho * opts.tt_eps3

    def attempt(delta_x):
        def matvec(wv):
            dx = wv[:n]
            dst = wv[n:n + mi]
            dyc = wv[n + mi:n + mi + me]
            dyd = wv[n + mi + me:]
            if opts.modify_hessian_with_slacks:
                # IpInexactPDSolver.cpp:159-175: slack-block perturbation
                # mu * delta / slack^2 (scaled: + mu * delta on s~ diag)
                s_diag = S * sig.sigma_s * S + mu * delta_x
            else:
                s_diag = S * sig.sigma_s * S + delta_x
            o_x = (Wv(dx) + (sig.sigma_x + delta_x) * dx + JcT(dyc)
                   + JdT(dyd))
            o_st = s_diag * dst - S * dyd
            rc, rd = A(dx, dst)
            o_c = rc - delta_cd * dyc
            o_d = rd - delta_cd * dyd
            return jnp.concatenate([o_x, o_st, o_c, o_d])

        sol, relres = minres(matvec, rhs, maxiter, pd_rtol)
        dx, dst = sol[:n], sol[n:n + mi]
        dyc = sol[n + mi:n + mi + me]
        dyd = sol[n + mi + me:]
        # --- tangential component condition (TCC) --------------------------
        u_x, u_s = dx - v_x, dst - v_s
        u_nrm2 = jnp.sum(u_x ** 2) + jnp.sum(u_s ** 2)
        v_nrm2 = jnp.sum(v_x ** 2) + jnp.sum(v_s ** 2)
        v_nrm = jnp.sqrt(v_nrm2)
        Wu_x = Wv(u_x) + (sig.sigma_x + delta_x) * u_x
        Wu_s = (S * sig.sigma_s * S + delta_x) * u_s
        uWu = jnp.dot(u_x, Wu_x) + jnp.dot(u_s, Wu_s)
        tcc1 = u_nrm2 <= opts.tcc_psi ** 2 * v_nrm2
        tcc2a = 0.5 * uWu >= tcc_tol * u_nrm2
        # TCC2b (decomposed only): grad_barr^T u + v^T W u + 0.5 u^T W u
        # <= tcc_zeta * ||v||  (IpInexactPDTerminationTester.cpp:465-483)
        gphi_u = jnp.dot(gphi_x, u_x) + jnp.dot(S * gphi_s, u_s)
        vWu = jnp.dot(v_x, Wu_x) + jnp.dot(v_s, Wu_s)
        tcc2b = gphi_u + vWu + 0.5 * uWu <= opts.tcc_zeta * v_nrm
        tcc = jnp.where(cn,
                        jnp.logical_or(tcc1, jnp.logical_and(tcc2a, tcc2b)),
                        jnp.logical_or(tcc1, tcc2a))

        # --- residual pieces ----------------------------------------------
        resid = rhs - matvec(sol)
        rho_norm = jnp.linalg.norm(resid[:n + mi])
        Ad_c, Ad_d = A(dx, dst)
        cAd_norm = jnp.sqrt(jnp.sum((c + Ad_c) ** 2)
                            + jnp.sum((dms + Ad_d) ** 2))

        # --- TT1: residual + model reduction -------------------------------
        tt1_res = jnp.where(
            cn,
            rho_norm <= opts.tt_kappa1 * curr_tt1,
            jnp.linalg.norm(resid) <= opts.tt_kappa1 * curr_tt1)
        delta_m = (-(jnp.dot(gphi_x, dx) + jnp.dot(S * gphi_s, dst))
                   + nu * (theta2 - cAd_norm))
        mrc_rhs = jnp.where(
            cn,
            jnp.maximum(0.5 * uWu, tcc_tol * u_nrm2)
            + sigma_mrc * nu * (theta2 - cAv_norm),
            jnp.maximum(0.5 * uWu, tcc_tol * u_nrm2)
            + sigma_mrc * nu * jnp.maximum(theta2, cAd_norm - theta2))
        tt1 = jnp.logical_and(jnp.logical_and(tcc, tt1_res),
                              delta_m >= mrc_rhs - 10 * eps_m)

        # --- TT2: sufficient dual progress ---------------------------------
        # ||grad phi + A~^T (y + dy)|| <= tt_kappa2 * curr_tt2
        dtt_x, dtt_s = AT(dyc, dyd)
        tt2_norm = jnp.sqrt(jnp.sum((tt2_x + dtt_x) ** 2)
                            + jnp.sum((tt2_s + dtt_s) ** 2))
        tt2 = jnp.logical_and(try_tt2,
                              tt2_norm <= opts.tt_kappa2 * curr_tt2)

        # --- TT3: linearized feasibility gain ------------------------------
        tt3 = jnp.where(
            cn,
            jnp.logical_and(
                jnp.logical_and(tcc, rho_norm <= opts.tt_kappa1 * curr_tt1),
                theta2 - cAd_norm >= opts.tt_eps3 * (theta2 - cAv_norm)),
            jnp.logical_and(
                jnp.logical_and(tcc, rho_norm <= opts.tt_kappa1 * theta2),
                cAd_norm <= opts.tt_kappa1 * theta2))

        # A solve is usable when any SMART test passes; MINRES breakdown
        # (residual far beyond the requested inexactness) always fails.
        relres_ok = relres <= jnp.maximum(1.01 * pd_rtol,
                                          opts.residual_ratio_singular)
        ok = jnp.logical_and(
            jnp.logical_or(jnp.logical_or(tt1, tt2), tt3), relres_ok)
        return sol, ok, relres, uWu, jnp.sqrt(u_nrm2)

    zero = jnp.zeros((), dtype)
    # inexact_regularization_ls_count_trigger (IpInexactPDSolver.cpp:47-52,
    # 150-160): a long line search in the PREVIOUS iteration pre-perturbs
    # the Hessian before the first solve of this one.
    if last_ls_count is not None:
        start0 = jnp.where(delta_w_last == 0,
                           opts.first_hessian_perturbation,
                           jnp.maximum(opts.min_hessian_perturbation,
                                       delta_w_last * opts.perturb_dec_fact))
        delta0 = jnp.where(
            last_ls_count > opts.inexact_regularization_ls_count_trigger,
            start0, zero)
    else:
        delta0 = zero
    sol0, ok0, rr0, uWu0, un0 = attempt(delta0)

    def cond_loop(carry):
        trial, dxv, sol, ok, rr, uWu_, un_, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body_loop(carry):
        trial, dxv, sol, ok, rr, uWu_, un_, gave_up = carry
        first_try = (dxv == 0)
        start_val = jnp.where(delta_w_last == 0,
                              opts.first_hessian_perturbation,
                              jnp.maximum(opts.min_hessian_perturbation,
                                          delta_w_last * opts.perturb_dec_fact))
        inc_fact = jnp.where(delta_w_last == 0,
                             opts.perturb_inc_fact_first,
                             opts.perturb_inc_fact)
        new_dx = jnp.where(first_try, start_val, dxv * inc_fact)
        gave_up = new_dx > opts.max_hessian_perturbation
        sol, ok, rr, uWu_, un_ = attempt(new_dx)
        return trial + 1, new_dx, sol, ok, rr, uWu_, un_, gave_up

    trials, delta_x, sol, ok, rr, uWu, u_norm, gave_up = lax.while_loop(
        cond_loop, body_loop,
        (jnp.ones((), jnp.int32), delta0, sol0, ok0, rr0, uWu0,
         un0, jnp.zeros((), bool)))

    # Termination-test-3 fallback: pure normal step (d = v, dy = 0) when the
    # perturbation loop could not satisfy the tests (v = 0 when the step was
    # undecomposed — the carry then activates the decomposition next round).
    use_normal_only = jnp.logical_not(ok)
    dx = jnp.where(use_normal_only, v_x, sol[:n])
    dst = jnp.where(use_normal_only, v_s, sol[n:n + mi])
    dyc = jnp.where(use_normal_only, 0.0, sol[n + mi:n + mi + me])
    dyd = jnp.where(use_normal_only, 0.0, sol[n + mi + me:])
    uWu = jnp.where(use_normal_only, 0.0, uWu)
    u_norm = jnp.where(use_normal_only, 0.0, u_norm)

    ds = S * dst  # unscale the slack step
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    step = Iterate(x=dx, s=ds, y_c=dyc, y_d=dyd,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    # The step only truly fails if even the normal step is unusable (feasible
    # point with MINRES breakdown, or an undecomposed round with no v).
    failed = jnp.logical_and(
        use_normal_only,
        jnp.logical_or(feasible_already, jnp.logical_not(cn)))
    step = jax.tree.map(lambda vv: jnp.where(failed, jnp.zeros_like(vv), vv),
                        step)

    cAd_c = c + Jc(dx)
    cAd_d = dms + Jd(dx) - ds
    aux = InexactAux(
        uWu=uWu, tangential_norm=u_norm,
        norm_cplusAd=jnp.sqrt(jnp.sum(cAd_c ** 2) + jnp.sum(cAd_d ** 2)),
        theta2=theta2,
        grad_barr_t_delta=jnp.dot(gphi_x, dx) + jnp.dot(gphi_s, ds))

    new_last = jnp.where(delta_x > 0, delta_x, delta_w_last)
    sr = StepResult(step=step, delta_x=delta_x, delta_c=delta_cd,
                    delta_w_last=new_last, failed=failed,
                    num_trials=trials, residual_ratio=rr, fac=None, K=None)
    return sr, new_omega, aux


def inexact_line_search(nlp: CanonicalNLP, opts: Options, it: Iterate,
                        ev: Evals, sr: StepResult, mu, tau, nu, nu_low,
                        aux: InexactAux):
    """Penalty-function backtracking line search (InexactLSAcceptor).

    Returns (LineSearchResult, new_nu, new_nu_low)."""
    from .linesearch import LineSearchResult, _trial_point
    dtype = it.x.dtype
    eps = jnp.finfo(dtype).eps
    step = sr.step

    theta2 = aux.theta2
    phi = barrier_obj(nlp, it, ev.f, mu, opts.kappa_d)

    # --- nu update (IpInexactLSAcceptor.cpp:174-246) -----------------------
    Upsilon = aux.tangential_norm ** 2
    numerator = (aux.grad_barr_t_delta
                 + jnp.maximum(0.5 * aux.uWu, opts.tcc_theta * Upsilon))
    denominator = (1.0 - opts.rho) * (theta2 - aux.norm_cplusAd)
    nu_trial = jnp.where(denominator > eps, numerator / denominator, nu)
    do_update = theta2 > opts.nu_update_inf_skip_tol
    nu_new = jnp.where(jnp.logical_and(do_update, nu < nu_trial),
                       nu_trial + opts.nu_inc, nu)
    if opts.flexible_penalty_function:
        nu_mid = jnp.where(do_update, jnp.maximum(nu_low, nu_trial), nu_new)
    else:
        nu_mid = nu_new
    ref_pred = (-aux.grad_barr_t_delta
                + nu_mid * (theta2 - aux.norm_cplusAd))

    alpha_max, alpha_dual = fraction_to_boundary(nlp, it, step, tau)

    def trial_quantities(alpha):
        it_t = _trial_point(it, step, alpha, alpha_dual)
        f_t = nlp.eval_f(it_t.x)
        c_t = nlp.eval_c(it_t.x)
        d_t = nlp.eval_d(it_t.x)
        theta2_t = jnp.sqrt(jnp.sum(c_t ** 2)
                            + jnp.sum((d_t - it_t.s) ** 2))
        phi_t = barrier_obj(nlp, it_t, f_t, mu, opts.kappa_d)
        return it_t, f_t, c_t, d_t, theta2_t, phi_t

    def acceptable(alpha, theta2_t, phi_t):
        pred = alpha * ref_pred
        basval = jnp.abs(phi + nu_new * theta2)
        ared = (phi + nu_new * theta2) - (phi_t + nu_new * theta2_t)
        acc = opts.eta_phi * pred - ared <= 10.0 * eps * basval
        if opts.flexible_penalty_function:
            ared_low = (phi + nu_low * theta2) - (phi_t + nu_low * theta2_t)
            acc_low = opts.eta_phi * pred - ared_low <= 10.0 * eps * basval
        else:
            acc_low = jnp.zeros((), bool)
        return jnp.logical_or(acc, acc_low), acc

    class Carry(NamedTuple):
        k: jnp.ndarray
        alpha: jnp.ndarray
        done: jnp.ndarray
        accepted: jnp.ndarray
        by_high: jnp.ndarray
        it_t: Iterate
        f_t: jnp.ndarray
        c_t: jnp.ndarray
        d_t: jnp.ndarray
        theta2_t: jnp.ndarray
        phi_t: jnp.ndarray
        alpha_used: jnp.ndarray

    def body(cy: Carry) -> Carry:
        alpha = cy.alpha
        it_t, f_t, c_t, d_t, th_t, ph_t = trial_quantities(alpha)
        acc, by_high = acceptable(alpha, th_t, ph_t)
        next_alpha = alpha * opts.alpha_red_factor
        done = jnp.logical_or(acc, next_alpha < 1e-13)
        return Carry(k=cy.k + 1, alpha=next_alpha, done=done, accepted=acc,
                     by_high=by_high, it_t=it_t, f_t=f_t, c_t=c_t, d_t=d_t,
                     theta2_t=th_t, phi_t=ph_t, alpha_used=alpha)

    def cond(cy: Carry):
        return jnp.logical_and(jnp.logical_not(cy.done),
                               cy.k < opts.max_backtracking_steps)

    it0 = _trial_point(it, step, alpha_max, alpha_dual)
    init = Carry(k=jnp.zeros((), jnp.int32), alpha=alpha_max,
                 done=jnp.zeros((), bool), accepted=jnp.zeros((), bool),
                 by_high=jnp.zeros((), bool), it_t=it0, f_t=ev.f, c_t=ev.c,
                 d_t=ev.d, theta2_t=theta2, phi_t=phi, alpha_used=alpha_max)
    out = lax.while_loop(cond, body, init)

    # --- nu_low update on acceptance by the high test only (:350-360) ------
    nu_low_new = nu_low
    if opts.flexible_penalty_function:
        dtheta = out.theta2_t - theta2
        nu_real = jnp.where(jnp.abs(dtheta) > eps,
                            -(out.phi_t - phi) / dtheta, nu_low)
        upd = jnp.minimum(nu_new, nu_low + jnp.maximum(
            opts.nu_low_fact * (nu_real - nu_low), opts.nu_inc))
        nu_low_new = jnp.where(
            jnp.logical_and(out.accepted, out.by_high), upd, nu_low)

    theta1 = jnp.sum(jnp.abs(ev.c)) + jnp.sum(jnp.abs(ev.d - it.s))
    ls = LineSearchResult(
        accepted=out.accepted, alpha_primal=out.alpha_used,
        alpha_dual=alpha_dual, trial=out.it_t, trial_ev_f=out.f_t,
        trial_c=out.c_t, trial_d=out.d_t, n_backtracks=out.k,
        used_soc=jnp.zeros((), bool), ftype=jnp.ones((), bool),
        filter=None, theta_curr=theta1, phi_curr=phi, penalty_nu=nu_new,
        # no first-trial reuse: the solver evaluates the watchdog point itself
        first_trial=out.it_t, first_f=out.f_t, first_c=out.c_t,
        first_d=out.d_t, first_theta=jnp.asarray(jnp.inf, it.x.dtype),
        first_phi=jnp.asarray(jnp.inf, it.x.dtype),
        n_evals=out.k, n_soc_rounds=jnp.zeros((), jnp.int32))
    return ls, nu_new, nu_low_new
