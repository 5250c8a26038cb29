"""Restoration phase for the general-sparsity (banded-BCR) backend.

The restoration NLP of a sparse problem is itself sparse: the variable space
widens to [x | n_rows (m) | p_rows (m)] and every constraint row becomes
g_r(x) - p_r + n_r, so the resto KKT pattern is the original pattern plus
identity couplings — analyzed once at canonicalize time
(``sparse.canonicalize_sparse`` stores the resto ``BandedInfo``) and run on
the same banded backend.  Reference semantics follow ``restoration.py``
(RestoIpoptNLP / RestoIterateInitializer / RestoConvergenceCheck); the
reference's restoration is linear-solver-agnostic
(``src/Algorithm/IpRestoMinC_1Nrm.cpp``)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate, SolverReturn
from ..problem import CanonicalNLP, CanonicalStructure
from ..options import Options
from ..sparse import BandedInfo
from .. import kkt
from ..kkt import evaluate, slacks, barrier_obj
from .linesearch import FilterState, filter_acceptable
from .restoration import RestoResult, _solve_quadratic_pn


def build_resto_banded(orig: CanonicalNLP, opts: Options) -> CanonicalNLP:
    info: BandedInfo = orig.chain
    rinfo: BandedInfo = info._resto_info
    s = orig.struct
    n, m = info.n, s.m
    nr = n + 2 * m
    dtype = orig.x0.dtype
    rho = float(opts.resto_penalty_parameter)

    orig_g = orig.g          # user g, signature (x_full, params)
    orig_params_tree = orig.params

    def f_flat(xfull, params):
        x = xfull[:n]
        pn = xfull[n:]
        dr = 1.0 / jnp.maximum(1.0, jnp.abs(params["resto"]["xref"]))
        return (rho * jnp.sum(pn)
                + 0.5 * params["resto"]["eta"]
                * jnp.sum((dr * (x - params["resto"]["xref"])) ** 2))

    def g_flat(xfull, params):
        x = xfull[:n]
        nn = xfull[n:n + m]
        pp = xfull[n + m:]
        graw = orig_g(x, params["orig"])
        return params["resto"]["rscale"] * graw - pp + nn

    struct = CanonicalStructure(
        n_full=nr, n=nr, m=m, me=s.me, mi=s.mi,
        eq_idx=s.eq_idx, ineq_idx=s.ineq_idx,
        free_idx=np.arange(nr, dtype=np.int32),
        fixed_idx=np.zeros((0,), np.int32),
        fixed_treatment="make_parameter")

    def widen(v, pn_val):
        return jnp.concatenate([v, jnp.full((2 * m,), pn_val, dtype)])

    def widen_bool(v, flag):
        return jnp.concatenate([v, jnp.full((2 * m,), flag, bool)])

    resto_aux = (orig.aux_arrays.get("resto", ())
                 if isinstance(orig.aux_arrays, dict) else ())
    return CanonicalNLP(
        struct=struct, f=f_flat, g=g_flat,
        params={"orig": orig.params, "resto": None},  # filled at call time
        chain=rinfo, aux_arrays=resto_aux,
        x_L=widen(orig.x_L, 0.0), x_U=widen(orig.x_U, 0.0),
        d_L=orig.d_L, d_U=orig.d_U,  # already in the scaled space
        has_xL=widen_bool(orig.has_xL, True),
        has_xU=widen_bool(orig.has_xU, False),
        has_dL=orig.has_dL, has_dU=orig.has_dU,
        c_rhs=orig.c_scale * orig.c_rhs,
        x_fixed=jnp.zeros((nr,), dtype),
        x0=widen(orig.x0, 1.0),
        x_L_orig=widen(orig.x_L_orig, 0.0),
        x_U_orig=widen(orig.x_U_orig, 0.0),
        obj_scale=jnp.asarray(1.0, dtype),
        c_scale=jnp.ones((s.me,), dtype), d_scale=jnp.ones((s.mi,), dtype))


def perform_restoration_banded(orig: CanonicalNLP, opts: Options,
                               resto_opts: Options, it: Iterate, ev,
                               outer_mu, fs: FilterState, theta_outer,
                               phi_outer, ipm_step_fn,
                               active=True) -> RestoResult:
    from .solver import (IPMState, counters_init, _cache_from_evals,
                         robust_state_init)
    from .linesearch import filter_init
    from .mu import adaptive_mu_init
    from .quasi_newton import lbfgs_init
    from .cg_penalty import cg_init

    info: BandedInfo = orig.chain
    s = orig.struct
    n, m = info.n, s.m
    dtype = it.x.dtype

    c_val = ev.c
    dms_val = ev.d - it.s
    theta_entry_inf = jnp.maximum(
        jnp.max(jnp.abs(c_val), initial=0.0),
        jnp.max(jnp.abs(dms_val), initial=0.0))
    resto_mu = jnp.maximum(outer_mu, theta_entry_inf)
    eta = opts.resto_proximity_weight * jnp.sqrt(resto_mu)

    resto = build_resto_banded(orig, opts)
    rscale = jnp.ones((m,), dtype)
    if s.me:
        rscale = rscale.at[jnp.asarray(s.eq_idx)].set(orig.c_scale)
    if s.mi:
        rscale = rscale.at[jnp.asarray(s.ineq_idx)].set(orig.d_scale)
    resto = resto._replace(params={
        "orig": orig.params,
        "resto": {"xref": it.x, "eta": jnp.asarray(eta, dtype),
                  "rscale": rscale}})

    # entry iterate (RestoIterateInitializer closed form), row order = user g
    rho = opts.resto_penalty_parameter
    rows = jnp.zeros((m,), dtype)
    if s.me:
        rows = rows.at[jnp.asarray(s.eq_idx)].set(c_val)
    if s.mi:
        rows = rows.at[jnp.asarray(s.ineq_idx)].set(dms_val)
    n_row = jnp.maximum(_solve_quadratic_pn(resto_mu, rho, rows), 1e-30)
    p_row = jnp.maximum(rows + n_row, 1e-30)
    Xr = jnp.concatenate([it.x, n_row, p_row])
    z_pn = resto_mu / jnp.concatenate([n_row, p_row])
    it_r = Iterate(
        x=Xr, s=it.s,
        y_c=jnp.zeros_like(it.y_c), y_d=jnp.zeros_like(it.y_d),
        z_L=jnp.concatenate([jnp.minimum(rho, it.z_L), z_pn]),
        z_U=jnp.concatenate([jnp.minimum(rho, it.z_U),
                             jnp.zeros((2 * m,), dtype)]),
        v_L=jnp.minimum(rho, it.v_L), v_U=jnp.minimum(rho, it.v_U))

    ev_r = evaluate(resto, it_r.x)
    theta0_r = jnp.sum(jnp.abs(ev_r.c)) + jnp.sum(jnp.abs(ev_r.d - it_r.s))
    z0 = jnp.zeros((), dtype)
    st_r = IPMState(
        it=it_r, mu=resto_mu,
        tau=jnp.maximum(opts.tau_min, 1.0 - resto_mu),
        iter_count=jnp.zeros((), jnp.int32),
        delta_w_last=z0,
        fs=filter_init(opts.max_filter_size, dtype),
        theta_min=opts.theta_min_fact * jnp.maximum(1.0, theta0_r),
        theta_max=opts.theta_max_fact * jnp.maximum(1.0, theta0_r),
        status=jnp.full((), int(SolverReturn.CONTINUE), jnp.int32),
        acceptable_count=jnp.zeros((), jnp.int32),
        last_alpha_pr=z0, last_alpha_du=z0,
        last_ls_count=jnp.zeros((), jnp.int32),
        last_delta_x=z0, last_step_norm=z0,
        restoration_count=jnp.zeros((), jnp.int32),
        ams=adaptive_mu_init(dtype),
        lbfgs=lbfgs_init(
            resto.struct.n,
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
        cg=cg_init(resto_opts, dtype),
        tr_omega=jnp.asarray(resto_opts.omega_init, dtype),
        nu_low=jnp.asarray(resto_opts.nu_low_init, dtype),
        ev=_cache_from_evals(ev_r),
        counters=counters_init(),
        **robust_state_init(resto_opts, it_r))

    kappa = opts.required_infeasibility_reduction
    inf_pr_req = jnp.maximum(kappa * theta_entry_inf,
                             min(opts.tol, opts.constr_viol_tol))

    def extract_x(s_r):
        return s_r.it.x[:n]

    def orig_progress(s_r):
        x = extract_x(s_r)
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
        curr_ok = jnp.logical_or(
            theta_o <= (1.0 - opts.gamma_theta) * theta_outer,
            phi_o <= phi_outer - opts.gamma_phi * theta_outer)
        return jnp.logical_and(red_ok, jnp.logical_and(filt_ok, curr_ok))

    max_resto = jnp.asarray(min(opts.max_iter, opts.max_resto_iter), jnp.int32)

    def cond(s_r):
        running = s_r.status == int(SolverReturn.CONTINUE)
        first = s_r.iter_count == 0
        done_prog = jnp.logical_and(jnp.logical_not(first), orig_progress(s_r))
        return jnp.logical_and(
            jnp.asarray(active),
            jnp.logical_and(running,
                            jnp.logical_and(jnp.logical_not(done_prog),
                                            s_r.iter_count < max_resto)))

    def body(s_r):
        return ipm_step_fn(resto, resto_opts, s_r)

    final = lax.while_loop(cond, body, st_r)

    success = orig_progress(final)
    resto_converged = jnp.logical_or(
        final.status == int(SolverReturn.SUCCESS),
        final.status == int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    locally_infeasible = jnp.logical_and(jnp.logical_not(success),
                                         resto_converged)
    failed = jnp.logical_and(jnp.logical_not(success),
                             jnp.logical_not(resto_converged))

    x_new = extract_x(final)
    s_new = final.it.s
    it_new = it._replace(x=x_new, s=s_new)

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

    it_out = Iterate(x=x_new, s=s_new,
                     y_c=jnp.zeros_like(it.y_c), y_d=jnp.zeros_like(it.y_d),
                     z_L=z_L, z_U=z_U, v_L=v_L, v_U=v_U)
    return RestoResult(it=it_out, success=success,
                       locally_infeasible=locally_infeasible, failed=failed,
                       resto_iters=final.iter_count)
