"""Feasibility restoration phase: MinC_1NrmRestorationPhase equivalent.

Reference parity (``src/Algorithm/IpRestoMinC_1Nrm.cpp``, ``IpRestoIpoptNLP.hpp:33``,
``IpRestoIterateInitializer.cpp:45``, ``IpRestoConvCheck.cpp``):

The restoration NLP (for current outer iterate x_R, s_R):

    min  rho * 1^T (p_c + n_c + p_d + n_d) + (eta/2) ||D_r (x - x_R)||^2
    s.t. c(x) - p_c + n_c = 0
         d(x) - p_d + n_d  in [d_L, d_U]      (same slack bounds as original)
         x_L <= x <= x_U,  p, n >= 0

with D_r = 1/max(1, |x_R|), eta = resto_proximity_weight * sqrt(mu),
rho = resto_penalty_parameter (1000).  The reference runs a *nested full Ipopt
algorithm* on this NLP; here the same jitted ``ipm_step`` runs in a nested
bounded ``lax.while_loop`` — recursion-free, vmap-safe.

Entry (RestoIterateInitializer::SetInitialIterates):
- resto_mu = max(outer mu, max|c|, max|d - s|)
- n = mu/(2 rho) - c/2 + sqrt((mu/(2 rho) - c/2)^2 + mu c/(2 rho)), p = c + n
- x-bound multipliers min(rho, z); p/n multipliers mu/p, mu/n; y = 0

Exit (RestoConvergenceCheck::CheckConvergence): after the first iteration,
stop when theta_orig(trial) <= max(kappa_resto * theta_orig(entry),
min(tol, constr_viol_tol)) AND the point is acceptable to the outer filter and
outer current iterate; if instead the resto NLP itself converges first, the
problem is locally infeasible.

Return (MinC_1NrmRestorationPhase::PerformRestoration tail): copy x, s;
pretend-Newton bound-multiplier step dz = (mu + z (sl_curr - sl_trial))/sl_curr
- z with dual fraction-to-boundary; reset all z to 1 if any exceeds
``bound_mult_reset_threshold``; equality multipliers reset (least squares
with threshold ``constr_mult_reset_threshold``, default 0 -> y = 0).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate, SolverReturn
from ..problem import CanonicalNLP, CanonicalStructure
from ..options import Options
from .. import kkt
from ..kkt import evaluate, slacks, barrier_obj
from .linesearch import FilterState, filter_acceptable
from .mu import adaptive_mu_init
from .quasi_newton import lbfgs_init
from .cg_penalty import cg_init as _cg_init_resto


def build_resto_nlp(orig: CanonicalNLP, opts: Options) -> CanonicalNLP:
    """Construct the restoration CanonicalNLP template.  Its ``params`` carry
    (x_ref, eta, and the original problem's array fields), so the same traced
    template works for any entry point and batches correctly under vmap."""
    s = orig.struct
    n, me, mi = s.n, s.me, s.mi
    nr = n + 2 * me + 2 * mi
    dtype = orig.x0.dtype

    orig_aux = (s, orig.f, orig.g)
    rho = float(opts.resto_penalty_parameter)

    def orig_from_params(params):
        return _unflatten_orig(orig_aux, params["orig"])

    def split(xt):
        x = xt[:n]
        n_c = xt[n:n + me]
        p_c = xt[n + me:n + 2 * me]
        n_d = xt[n + 2 * me:n + 2 * me + mi]
        p_d = xt[n + 2 * me + mi:]
        return x, n_c, p_c, n_d, p_d

    def f_resto(xt, params):
        x, n_c, p_c, n_d, p_d = split(xt)
        x_ref = params["x_ref"]
        eta = params["eta"]
        dr = 1.0 / jnp.maximum(1.0, jnp.abs(x_ref))
        prox = 0.5 * eta * jnp.sum((dr * (x - x_ref)) ** 2)
        return rho * (jnp.sum(n_c) + jnp.sum(p_c) + jnp.sum(n_d) + jnp.sum(p_d)) + prox

    def g_resto(xt, params):
        x, n_c, p_c, n_d, p_d = split(xt)
        o = orig_from_params(params)
        cvals = o.eval_c(x) if me else jnp.zeros((0,), xt.dtype)
        dvals = o.eval_d(x) if mi else jnp.zeros((0,), xt.dtype)
        return jnp.concatenate([cvals - p_c + n_c, dvals - p_d + n_d])

    struct = CanonicalStructure(
        n_full=nr, n=nr, m=me + mi, me=me, mi=mi,
        eq_idx=np.arange(me, dtype=np.int32),
        ineq_idx=np.arange(me, me + mi, dtype=np.int32),
        free_idx=np.arange(nr, dtype=np.int32),
        fixed_idx=np.zeros((0,), np.int32),
        fixed_treatment="make_parameter")

    zeros_pn = jnp.zeros((2 * me + 2 * mi,), dtype)
    ones_pn = jnp.ones((2 * me + 2 * mi,), bool)
    params0 = {
        "x_ref": orig.x0,
        "eta": jnp.zeros((), dtype),
        "orig": _flatten_orig(orig),
    }
    return CanonicalNLP(
        struct=struct, f=f_resto, g=g_resto, params=params0,
        x_L=jnp.concatenate([orig.x_L, zeros_pn]),
        x_U=jnp.concatenate([orig.x_U, zeros_pn]),  # masked anyway
        d_L=orig.d_L, d_U=orig.d_U,
        has_xL=jnp.concatenate([orig.has_xL, ones_pn]),
        has_xU=jnp.concatenate([orig.has_xU, jnp.zeros_like(ones_pn)]),
        has_dL=orig.has_dL, has_dU=orig.has_dU,
        c_rhs=jnp.zeros((me,), dtype),
        x_fixed=jnp.zeros((nr,), dtype),
        x0=jnp.concatenate([orig.x0, jnp.full((2 * me + 2 * mi,), 1.0, dtype)]),
        x_L_orig=jnp.concatenate([orig.x_L_orig, zeros_pn]),
        x_U_orig=jnp.concatenate([orig.x_U_orig, zeros_pn]),
        obj_scale=jnp.asarray(1.0, dtype), c_scale=jnp.ones((me,), dtype),
        d_scale=jnp.ones((mi,), dtype),
    )


def _flatten_orig(orig: CanonicalNLP):
    from ..problem import _ARRAY_FIELDS
    return tuple(getattr(orig, name) for name in _ARRAY_FIELDS)


def _unflatten_orig(aux, leaves):
    from ..problem import _ARRAY_FIELDS
    s, f, g = aux
    kwargs = dict(zip(_ARRAY_FIELDS, leaves))
    return CanonicalNLP(struct=s, f=f, g=g, **kwargs)


def _solve_quadratic_pn(mu, rho, c):
    """n such that (p, n) minimize the barrier-penalty for p - n = c
    (RestoIterateInitializer::solve_quadratic): n = a + sqrt(a^2 + b),
    a = mu/(2 rho) - c/2, b = mu c / (2 rho)."""
    a = mu / (2.0 * rho) - 0.5 * c
    b = mu * c / (2.0 * rho)
    # a^2 + b = mu^2/(4 rho^2) + c^2/4 >= 0 identically.
    return a + jnp.sqrt(a * a + b)


def resto_initial_iterate(orig: CanonicalNLP, opts: Options, it: Iterate,
                          c_val, dms_val, resto_mu) -> Iterate:
    rho = opts.resto_penalty_parameter
    n_c = _solve_quadratic_pn(resto_mu, rho, c_val)
    p_c = c_val + n_c
    n_d = _solve_quadratic_pn(resto_mu, rho, dms_val)
    p_d = dms_val + n_d

    tiny = jnp.asarray(1e-30, it.x.dtype)
    n_c = jnp.maximum(n_c, tiny)
    p_c = jnp.maximum(p_c, tiny)
    n_d = jnp.maximum(n_d, tiny)
    p_d = jnp.maximum(p_d, tiny)

    xt = jnp.concatenate([it.x, n_c, p_c, n_d, p_d])
    z_pn = jnp.concatenate([resto_mu / n_c, resto_mu / p_c,
                            resto_mu / n_d, resto_mu / p_d])
    return Iterate(
        x=xt, s=it.s,
        y_c=jnp.zeros_like(it.y_c), y_d=jnp.zeros_like(it.y_d),
        z_L=jnp.concatenate([jnp.minimum(rho, it.z_L), z_pn]),
        z_U=jnp.concatenate([jnp.minimum(rho, it.z_U),
                             jnp.zeros_like(z_pn)]),
        v_L=jnp.minimum(rho, it.v_L), v_U=jnp.minimum(rho, it.v_U))


class RestoResult(NamedTuple):
    it: Iterate              # new outer iterate
    success: jnp.ndarray     # bool: returned to main algorithm
    locally_infeasible: jnp.ndarray
    failed: jnp.ndarray      # resto itself failed (maxiter/step error)
    resto_iters: jnp.ndarray


def perform_restoration(orig: CanonicalNLP, resto_nlp: CanonicalNLP,
                        opts: Options, resto_opts: Options, it: Iterate,
                        ev, outer_mu, fs: FilterState,
                        theta_outer, phi_outer, ipm_step_fn,
                        active=True) -> RestoResult:
    """Run the nested restoration IPM.  ``ipm_step_fn(nlp, opts, state)`` is the
    shared step function (passed in to avoid a circular import).

    ``active``: when this call sits under a vmapped lax.cond (which lowers to
    select-and-execute-both), inactive lanes pass active=False so the nested
    while_loop exits immediately and costs nothing in lockstep."""
    from .solver import (IPMState, initial_state, counters_init,  # local import, no cycle at module load
                         _cache_from_evals, robust_state_init)
    from .linesearch import filter_init

    n, me, mi = orig.struct.n, orig.struct.me, orig.struct.mi
    dtype = it.x.dtype

    c_val = ev.c
    dms_val = ev.d - it.s
    theta_entry_max = jnp.maximum(
        jnp.max(jnp.abs(c_val), initial=0.0),
        jnp.max(jnp.abs(dms_val), initial=0.0))
    resto_mu = jnp.maximum(outer_mu, theta_entry_max)

    eta = opts.resto_proximity_weight * jnp.sqrt(resto_mu)
    params = {"x_ref": it.x, "eta": eta, "orig": _flatten_orig(orig)}
    rnlp = resto_nlp._replace(params=params)

    it_r = resto_initial_iterate(orig, opts, it, c_val, dms_val, resto_mu)

    # Build the resto IPM state by hand (mirrors initial_state but keeps the
    # entry iterate and resto_mu).
    ev_r = evaluate(rnlp, it_r.x)
    theta0_r = jnp.sum(jnp.abs(ev_r.c)) + jnp.sum(jnp.abs(ev_r.d - it_r.s))
    st_r = IPMState(
        it=it_r, mu=resto_mu,
        tau=jnp.maximum(opts.tau_min, 1.0 - resto_mu),
        iter_count=jnp.zeros((), jnp.int32),
        delta_w_last=jnp.zeros((), dtype),
        fs=filter_init(opts.max_filter_size, dtype),
        theta_min=opts.theta_min_fact * jnp.maximum(1.0, theta0_r),
        theta_max=opts.theta_max_fact * jnp.maximum(1.0, theta0_r),
        status=jnp.full((), int(SolverReturn.CONTINUE), jnp.int32),
        acceptable_count=jnp.zeros((), jnp.int32),
        last_alpha_pr=jnp.zeros((), dtype), last_alpha_du=jnp.zeros((), dtype),
        last_ls_count=jnp.zeros((), jnp.int32),
        last_delta_x=jnp.zeros((), dtype), last_step_norm=jnp.zeros((), dtype),
        restoration_count=jnp.zeros((), jnp.int32),
        ams=adaptive_mu_init(dtype),
        lbfgs=lbfgs_init(
            rnlp.n,
            resto_opts.limited_memory_max_history
            if resto_opts.hessian_approximation == "limited-memory" else 0,
            dtype, resto_opts.limited_memory_init_val),
        tiny_step_count=jnp.zeros((), jnp.int32),
        wd_active=jnp.zeros((), bool), wd_trials=jnp.zeros((), jnp.int32),
        wd_shortened_count=jnp.zeros((), jnp.int32), wd_ref=it_r,
        wd_ref_theta=jnp.asarray(jnp.inf, dtype),
        wd_ref_phi=jnp.asarray(jnp.inf, dtype),
        penalty_nu=jnp.asarray(1.0, dtype),
        soft_resto_count=jnp.zeros((), jnp.int32),
        cg=_cg_init_resto(resto_opts, dtype),
        tr_omega=jnp.asarray(resto_opts.omega_init, dtype),
        nu_low=jnp.asarray(resto_opts.nu_low_init, dtype),
        ev=_cache_from_evals(ev_r),
        counters=counters_init(),
        **robust_state_init(resto_opts, it_r))

    theta_entry_inf = theta_entry_max  # max-norm infeasibility at entry
    kappa = opts.required_infeasibility_reduction
    inf_pr_req = jnp.maximum(kappa * theta_entry_inf,
                             min(opts.tol, opts.constr_viol_tol))

    def orig_progress(s_r: IPMState):
        """theta/phi of the ORIGINAL problem at the resto iterate; the exit
        test of RestoConvergenceCheck + TestOrigProgress."""
        x = s_r.it.x[:n]
        it_o = it._replace(x=x, s=s_r.it.s)
        f_o = orig.eval_f(x)
        c_o = orig.eval_c(x)
        d_o = orig.eval_d(x)
        inf_pr = jnp.maximum(jnp.max(jnp.abs(c_o), initial=0.0),
                             jnp.max(jnp.abs(d_o - s_r.it.s), initial=0.0))
        theta_o = jnp.sum(jnp.abs(c_o)) + jnp.sum(jnp.abs(d_o - s_r.it.s))
        phi_o = barrier_obj(orig, it_o, f_o, outer_mu, opts.kappa_d)
        red_ok = inf_pr <= inf_pr_req
        filt_ok = filter_acceptable(fs, theta_o, phi_o)
        # acceptable w.r.t. outer current iterate (sufficient decrease)
        curr_ok = jnp.logical_or(
            theta_o <= (1.0 - opts.gamma_theta) * theta_outer,
            phi_o <= phi_outer - opts.gamma_phi * theta_outer)
        return jnp.logical_and(red_ok, jnp.logical_and(filt_ok, curr_ok))

    max_resto = jnp.asarray(min(opts.max_iter, opts.max_resto_iter), jnp.int32)

    def cond(s_r: IPMState):
        running = s_r.status == int(SolverReturn.CONTINUE)
        first = s_r.iter_count == 0
        done_prog = jnp.logical_and(jnp.logical_not(first), orig_progress(s_r))
        return jnp.logical_and(
            jnp.asarray(active),
            jnp.logical_and(running,
                            jnp.logical_and(jnp.logical_not(done_prog),
                                            s_r.iter_count < max_resto)))

    def body(s_r: IPMState):
        s_next = ipm_step_fn(rnlp, resto_opts, s_r)
        # --- Restoration-of-restoration (RestoRestoPhase,
        #     src/Algorithm/IpRestoRestoPhase.{hpp,cpp}): the resto NLP is
        #     always feasible — c(x) - p + n = 0 has a closed-form (p, n) for
        #     any x — so when the nested line search fails, reset (p, n) and
        #     their multipliers via solve_quadratic at the current x and
        #     continue, bounded by max_resto_resto_iters activations.
        fail = jnp.logical_or(
            s_next.status == int(SolverReturn.ERROR_IN_STEP_COMPUTATION),
            s_next.status == int(SolverReturn.RESTORATION_FAILURE))
        do_rr = jnp.logical_and(
            fail, s_next.restoration_count < opts.max_resto_resto_iters)
        x_cur = s_next.it.x[:n]
        c_o = orig.eval_c(x_cur)
        d_o = orig.eval_d(x_cur)
        it_outer_like = Iterate(
            x=x_cur, s=s_next.it.s,
            y_c=jnp.zeros((me,), dtype), y_d=jnp.zeros((mi,), dtype),
            z_L=s_next.it.z_L[:n], z_U=s_next.it.z_U[:n],
            v_L=s_next.it.v_L, v_U=s_next.it.v_U)
        it_rr = resto_initial_iterate(orig, opts, it_outer_like, c_o,
                                      d_o - s_next.it.s, s_next.mu)
        from .linesearch import filter_init as _finit
        return s_next._replace(
            it=jax.tree.map(lambda a, b: jnp.where(do_rr, b, a),
                            s_next.it, it_rr),
            status=jnp.where(do_rr, int(SolverReturn.CONTINUE),
                             s_next.status),
            restoration_count=s_next.restoration_count
            + jnp.where(do_rr, 1, 0),
            fs=jax.tree.map(lambda a, b: jnp.where(do_rr, b, a), s_next.fs,
                            _finit(opts.max_filter_size, dtype)))

    final = lax.while_loop(cond, body, st_r)

    success = orig_progress(final)
    resto_converged = jnp.logical_or(
        final.status == int(SolverReturn.SUCCESS),
        final.status == int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    locally_infeasible = jnp.logical_and(jnp.logical_not(success),
                                         resto_converged)
    failed = jnp.logical_and(jnp.logical_not(success),
                             jnp.logical_not(resto_converged))

    # ---- return to the main algorithm -----------------------------------
    x_new = final.it.x[:n]
    s_new = final.it.s
    it_new = it._replace(x=x_new, s=s_new)

    # Pretend-Newton bound multiplier update (ComputeBoundMultiplierStep).
    sl_old = slacks(orig, it)
    sl_new = slacks(orig, it_new)

    def dz_of(z, slo, sln, has):
        dz = (outer_mu + z * (slo - sln)) / slo - z
        return jnp.where(has, dz, 0.0)

    dz_L = dz_of(it.z_L, sl_old[0], sl_new[0], orig.has_xL)
    dz_U = dz_of(it.z_U, sl_old[1], sl_new[1], orig.has_xU)
    dv_L = dz_of(it.v_L, sl_old[2], sl_new[2], orig.has_dL)
    dv_U = dz_of(it.v_U, sl_old[3], sl_new[3], orig.has_dU)
    step = Iterate(x=jnp.zeros_like(x_new), s=jnp.zeros_like(s_new),
                   y_c=jnp.zeros_like(it.y_c), y_d=jnp.zeros_like(it.y_d),
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    _, alpha_dual = kkt.fraction_to_boundary(
        orig, it, step, jnp.maximum(opts.tau_min, 1.0 - outer_mu))
    z_L = it.z_L + alpha_dual * dz_L
    z_U = it.z_U + alpha_dual * dz_U
    v_L = it.v_L + alpha_dual * dv_L
    v_U = it.v_U + alpha_dual * dv_U

    zmax = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(z_L), initial=0.0),
                    jnp.max(jnp.abs(z_U), initial=0.0)),
        jnp.maximum(jnp.max(jnp.abs(v_L), initial=0.0),
                    jnp.max(jnp.abs(v_U), initial=0.0)))
    reset = zmax > opts.bound_mult_reset_threshold
    z_L = jnp.where(reset, jnp.where(orig.has_xL, 1.0, 0.0), z_L)
    z_U = jnp.where(reset, jnp.where(orig.has_xU, 1.0, 0.0), z_U)
    v_L = jnp.where(reset, jnp.where(orig.has_dL, 1.0, 0.0), v_L)
    v_U = jnp.where(reset, jnp.where(orig.has_dU, 1.0, 0.0), v_U)

    # Equality multipliers: least squares capped at constr_mult_reset_threshold
    # (default 0 -> reset to zero).
    from .init import least_squares_y
    grad_f = orig.eval_grad_f(x_new)
    J_c = orig.eval_jac_c(x_new)
    J_d = orig.eval_jac_d(x_new)
    y_c, y_d = least_squares_y(
        orig, x_new, s_new, grad_f, J_c, J_d, z_L, z_U, v_L, v_U,
        jnp.maximum(opts.constr_mult_reset_threshold, 1e-30))

    it_out = Iterate(x=x_new, s=s_new, y_c=y_c, y_d=y_d,
                     z_L=z_L, z_U=z_U, v_L=v_L, v_U=v_U)
    return RestoResult(it=it_out, success=success,
                       locally_infeasible=locally_infeasible, failed=failed,
                       resto_iters=final.iter_count)
