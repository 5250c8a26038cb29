"""Search direction computation: the PDFullSpaceSolver + PDPerturbationHandler
equivalent.

Reference parity:
- ``PDFullSpaceSolver::Solve`` (``src/Algorithm/IpPDFullSpaceSolver.cpp:497-639``):
  outer retry loop — factorize the augmented system, check inertia, on
  SINGULAR/WRONG_INERTIA ask the perturbation handler for new (delta_w, delta_c)
  and retry; then iterative refinement (``:235-345``).
- ``PDPerturbationHandler`` (``IpPDPerturbationHandler.cpp:50-116,379-394``):
  delta_w schedule — first trial 0; on failure start from
  ``first_hessian_perturbation`` (or ``max(delta_min, delta_last*perturb_dec_fact)``
  if a perturbation succeeded before); escalate by ``perturb_inc_fact_first`` /
  ``perturb_inc_fact`` up to ``max_hessian_perturbation``.  Jacobian
  regularization delta_c = ``jacobian_regularization_value * mu^exponent`` on
  singularity.

TPU-native design: the retry loop is a bounded ``lax.while_loop`` whose carry
holds the current deltas and factorization; each round re-assembles and
re-factorizes (dense LDL^T).  Inertia comes from sign(diag(D)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import (Evals, SigmaBlocks, sigmas, assemble_aug_system,
                   condensed_rhs, condensed_rhs_parts, split_aug_solution,
                   recover_bound_mult_steps)
from ..linalg.ldlt import ldlt, ldlt_blocked, ldlt_solve, LDLTResult


class StepResult(NamedTuple):
    step: Iterate            # search direction (all 8 blocks)
    delta_x: jnp.ndarray     # accepted Hessian perturbation
    delta_c: jnp.ndarray     # accepted Jacobian regularization
    delta_w_last: jnp.ndarray  # updated perturbation memory
    failed: jnp.ndarray      # bool: could not get correct inertia
    num_trials: jnp.ndarray  # factorization attempts
    residual_ratio: jnp.ndarray
    fac: LDLTResult          # the successful factorization (for SOC reuse)
    K: jnp.ndarray           # the factorized matrix (for refinement/SOC)


def _sym_ruiz_scale(K, sweeps: int = 2):
    """Symmetric Ruiz equilibration of the KKT matrix — the MC19 analog
    (Mc19TSymScalingMethod, src/Algorithm/LinearSolvers/IpMc19TSymScalingMethod.cpp):
    D K D with D_i = prod sqrt(1/row_inf_norm)."""
    d = jnp.ones((K.shape[0],), K.dtype)
    for _ in range(sweeps):
        Ks = K * d[:, None] * d[None, :]
        # initial= keeps zero-variable (empty K) systems well-defined
        rn = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(Ks), axis=1, initial=0.0),
                                  1e-30))
        d = d / rn
    return jnp.clip(d, 1e-8, 1e8)


def _factorize(K, opts: Options):
    """Factorize K, optionally after symmetric equilibration (inertia is
    congruence-invariant; solves unscale transparently via fac.row_scale).

    factorization_dtype (TPU mixed precision): factorize in the lower
    precision, refine in the model dtype — the classic mixed-precision
    iterative-refinement split (the reference's double build + our f32
    MXU factorizations)."""
    if opts.linear_system_scaling == "mc19":
        d = _sym_ruiz_scale(K)
        Ks = K * d[:, None] * d[None, :]
    else:
        d = None
        Ks = K
    if opts.factorization_dtype:
        Ks = Ks.astype(jnp.dtype(opts.factorization_dtype))
    if opts.linear_solver == "dense-ldlt-blocked":
        fac = ldlt_blocked(Ks, block=opts.kkt_block_size,
                           pivot_tol=opts.ldlt_pivot_tol)
    else:
        fac = ldlt(Ks, pivot_tol=opts.ldlt_pivot_tol)
    if d is not None:
        fac = fac._replace(row_scale=d.astype(Ks.dtype))
    return fac


def solve_with_refinement(K, fac: LDLTResult, rhs, opts: Options):
    """Solve K x = rhs with iterative refinement (IpPDFullSpaceSolver.cpp:235-345).

    Refinement is against the *factorized* (perturbed) matrix; Ipopt refines on
    the full 8-block system, which is equivalent here because the bound
    multiplier rows are eliminated exactly.

    refinement_precision='double': the solution accumulates and residuals
    are computed in float64 while the factorization stays in the model
    dtype — an f32 factorization then reaches ~f64 residual levels (the
    extra-precise-residual IR theorem; on TPU the f64 cost is residual-only
    emulated matvecs).  residual_improvement_factor stops refinement when a
    step no longer improves the residual ratio by that factor."""
    # the model/output dtype is the ASSEMBLED system's (the rhs may arrive
    # in f64 under the high-precision-residual mode)
    model_dt = K.dtype
    precise = opts.refinement_precision == "double"
    acc_dt = jnp.float64 if precise else model_dt
    fac_dt = fac.L.dtype if hasattr(fac, "L") else model_dt

    sol = ldlt_solve(fac, rhs.astype(fac_dt)).astype(acc_dt)
    rhs_a = rhs.astype(acc_dt)
    K_a = K.astype(acc_dt)
    rhs_norm = jnp.maximum(jnp.max(jnp.abs(rhs_a), initial=0.0),
                           jnp.asarray(1e-30, acc_dt))

    def ratio(s):
        r = rhs_a - K_a @ s
        return jnp.max(jnp.abs(r), initial=0.0) / rhs_norm

    def body(carry):
        i, sol, rr_prev = carry
        r = rhs_a - K_a @ sol
        sol = sol + ldlt_solve(fac, r.astype(fac_dt)).astype(acc_dt)
        return i + 1, sol, ratio(sol)

    def cond(carry):
        i, _, rr = carry
        need_floor = i < opts.min_refinement_steps
        not_done = jnp.logical_and(i < opts.max_refinement_steps,
                                   rr > opts.residual_ratio_max)
        return jnp.logical_or(need_floor, not_done)

    if opts.fast_step_computation:
        return sol.astype(model_dt), jnp.zeros((), model_dt)
    i0 = jnp.zeros((), jnp.int32)
    rr0 = ratio(sol)

    if opts.residual_improvement_factor < 1e19:
        # stop when a step fails to improve the ratio enough
        # (IpPDFullSpaceSolver.cpp residual_improvement_factor)
        def body_imp(carry):
            i, sol, rr_prev = carry
            i2, sol2, rr2 = body((i, sol, rr_prev))
            improved = rr2 <= opts.residual_improvement_factor * rr_prev
            keep = jnp.logical_or(improved, i < opts.min_refinement_steps)
            sol_out = jax.tree.map(
                lambda a, b: jnp.where(keep, b, a), sol, sol2)
            rr_out = jnp.where(keep, rr2, rr_prev)
            # a non-improving step pins the counter to max -> loop exits
            i_out = jnp.where(keep, i2,
                              jnp.asarray(opts.max_refinement_steps,
                                          jnp.int32))
            return i_out, sol_out, rr_out

        _, sol, rr = lax.while_loop(cond, body_imp, (i0, sol, rr0))
    else:
        _, sol, rr = lax.while_loop(cond, body, (i0, sol, rr0))
    return sol.astype(model_dt), rr.astype(model_dt)


class FactorResult(NamedTuple):
    fac: LDLTResult
    K: jnp.ndarray
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def factorize_kkt(nlp: CanonicalNLP, opts: Options, it: Iterate, ev: Evals,
                  W, mu, delta_w_last, delta_cd_override=None) -> FactorResult:
    """Assemble + factorize the augmented system with the inertia-correction
    retry loop.  The matrix is independent of the barrier parameter (mu enters
    only delta_c's magnitude), so one factorization serves any number of
    right-hand sides — the adaptive-mu oracles exploit this.

    ``delta_cd_override``: replaces the mu-based Jacobian regularization value
    (used by the CG-penalty method, whose CGPerturbationHandler ties delta_c
    to ||(c, d-s)||_2 / kkt_penalty — IpCGPerturbationHandler.cpp)."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = it.x.dtype
    sig = sigmas(nlp, it)

    expected_pos = n + mi
    expected_neg = me + mi
    if delta_cd_override is not None:
        delta_cd = delta_cd_override
    else:
        delta_cd = (opts.jacobian_regularization_value
                    * mu ** opts.jacobian_regularization_exponent)

    def factor(delta_x, delta_c):
        K = assemble_aug_system(W, ev.J_c, ev.J_d, sig, delta_x, delta_x,
                                delta_c, delta_c)
        fac = _factorize(K, opts)
        ok = jnp.logical_and(
            jnp.logical_and(fac.num_pos == expected_pos,
                            fac.num_neg == expected_neg),
            jnp.logical_not(fac.singular))
        return K, fac, ok

    zero = jnp.zeros((), dtype)
    dx0 = zero
    dc0 = jnp.where(opts.perturb_always_cd, delta_cd, 0.0)
    K0, fac0, ok0 = factor(dx0, dc0)

    def cond(carry):
        trial, delta_x, delta_c, K, fac, ok, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body(carry):
        trial, delta_x, delta_c, K, fac, ok, gave_up = carry
        was_singular = fac.singular
        # Singular with no Jacobian regularization yet -> try delta_c alone
        # first (IpPDFullSpaceSolver.cpp:527-545 PerturbForSingularity).
        only_dc = jnp.logical_and(was_singular, delta_c == 0)
        new_delta_c = jnp.where(jnp.logical_or(was_singular, delta_c > 0),
                                jnp.maximum(delta_c, delta_cd), delta_c)
        # delta_x escalation schedule (PDPerturbationHandler).
        first_try = (delta_x == 0)
        start_val = jnp.where(delta_w_last == 0,
                              opts.first_hessian_perturbation,
                              jnp.maximum(opts.min_hessian_perturbation,
                                          delta_w_last * opts.perturb_dec_fact))
        inc_fact = jnp.where(delta_w_last == 0,
                             opts.perturb_inc_fact_first, opts.perturb_inc_fact)
        bumped = jnp.where(first_try, start_val, delta_x * inc_fact)
        new_delta_x = jnp.where(only_dc, delta_x, bumped)
        gave_up = new_delta_x > opts.max_hessian_perturbation
        K, fac, ok = factor(new_delta_x, new_delta_c)
        return trial + 1, new_delta_x, new_delta_c, K, fac, ok, gave_up

    trial0 = jnp.ones((), jnp.int32)
    gave0 = jnp.zeros((), bool)
    trials, delta_x, delta_c, K, fac, ok, gave_up = lax.while_loop(
        cond, body, (trial0, dx0, dc0, K0, fac0, ok0, gave0))

    failed = jnp.logical_not(ok)
    new_delta_w_last = jnp.where(delta_x > 0, delta_x, delta_w_last)
    return FactorResult(fac=fac, K=K, delta_x=delta_x, delta_c=delta_c,
                        delta_w_last=new_delta_w_last, failed=failed,
                        num_trials=trials)


def direction_from_solution(nlp: CanonicalNLP, it: Iterate, sol, mu, failed):
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dx, ds, dy_c, dy_d = split_aug_solution(sol, n, mi, me)
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    step = Iterate(x=dx, s=ds, y_c=dy_c, y_d=dy_d,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    # Zero the step on failure so downstream arithmetic stays finite.
    return jax.tree.map(lambda v: jnp.where(failed, jnp.zeros_like(v), v), step)


def _backend(nlp: CanonicalNLP) -> str:
    info = getattr(nlp, "chain", None)
    if info is None:
        return "dense"
    from ..parallel.scenario import ArrowInfo
    from ..sparse import BandedInfo
    from ..linalg.nested_dissection import NDInfo
    if isinstance(info, ArrowInfo):
        return "arrow"
    if isinstance(info, BandedInfo):
        return "banded"
    if isinstance(info, NDInfo):
        return "nd"
    return "btd"


def compute_hessian(nlp: CanonicalNLP, it: Iterate):
    """Backend-shaped Lagrangian Hessian at the current iterate."""
    be = _backend(nlp)
    if be == "btd":
        from ..chained import stage_hessians
        return stage_hessians(nlp, it.x, it.y_c, it.y_d)
    if be == "arrow":
        from ..parallel.scenario import scenario_hessians
        return scenario_hessians(nlp, it.x, it.y_c, it.y_d)
    if be in ("banded", "nd"):
        from ..sparse import sparse_hessian_values
        return sparse_hessian_values(nlp, it)
    return nlp.eval_lag_hess(it.x, it.y_c, it.y_d)


def factorize_any(nlp: CanonicalNLP, opts: Options, it: Iterate, ev: Evals,
                  hess, mu, delta_w_last, delta_cd_override=None):
    """Backend dispatch: dense LDL^T, chained block-tridiagonal BCR, banded
    BCR, or scenario block-arrow Schur.

    ``hess`` is backend-shaped: dense (n, n) W, (Wd, Wo) stage blocks,
    compressed Hessian entry values (banded), or (W00, W0s, Wss) arrow
    blocks.  ``delta_cd_override`` replaces the mu-based Jacobian
    regularization (CGPerturbationHandler's value; structured backends still
    floor it for block-elimination safety).
    """
    if opts.linear_solver == "custom":
        # GenKKTSolverInterface / GenAugSystemSolver hook
        # (IpGenKKTSolverInterface.hpp, IpGenAugSystemSolver.hpp): the
        # registered object owns the factorize half of the contract
        # (factorize -> inertia -> perturb retry is its responsibility).
        from ..options import CUSTOM_KKT_REGISTRY
        solver = CUSTOM_KKT_REGISTRY[opts.custom_kkt_token]
        return solver.factorize(nlp, opts, it, ev, hess, mu, delta_w_last)
    from .quasi_newton import LowRankW
    if isinstance(hess, LowRankW):
        if _backend(nlp) != "dense":
            # L-BFGS over structured backends: SMW around the structured
            # base factorization (LowRankAugSystemSolver composition,
            # IpAlgBuilder.cpp:568-628 — solver-agnostic in the reference).
            from .lowrank_struct import lowrank_struct_factorize
            return lowrank_struct_factorize(nlp, opts, it, hess, mu,
                                            delta_w_last)
        from .lowrank_kkt import lowrank_factorize_kkt
        return lowrank_factorize_kkt(nlp, opts, it, ev, hess, mu, delta_w_last)
    be = _backend(nlp)
    if be == "btd":
        from .chained_kkt import chained_factorize_kkt
        from ..chained import stage_jacobians
        AB = stage_jacobians(nlp, it.x)
        return chained_factorize_kkt(nlp, opts, it, AB, hess, mu,
                                     delta_w_last,
                                     delta_cd_override=delta_cd_override)
    if be == "arrow":
        from .arrow_kkt import arrow_factorize_kkt
        from ..parallel.scenario import scenario_jacobians
        Jb = scenario_jacobians(nlp, it.x)
        return arrow_factorize_kkt(nlp, opts, it, Jb, hess, mu, delta_w_last,
                                   delta_cd_override=delta_cd_override)
    if be == "banded":
        from ..sparse import banded_factorize_kkt
        return banded_factorize_kkt(nlp, opts, it, hess, mu, delta_w_last,
                                    delta_cd_override=delta_cd_override)
    if be == "nd":
        from ..sparse import nd_factorize_kkt
        return nd_factorize_kkt(nlp, opts, it, hess, mu, delta_w_last,
                                delta_cd_override=delta_cd_override)
    return factorize_kkt(nlp, opts, it, ev, hess, mu, delta_w_last,
                         delta_cd_override=delta_cd_override)


def solve_any(nlp: CanonicalNLP, opts: Options, fac, K, parts):
    """Solve the factorized augmented system for the four RHS blocks
    (-r_x, -r_s, -r_c, -r_d); returns ((dx, ds, dy_c, dy_d), residual_ratio)."""
    if opts.linear_solver == "custom":
        from ..options import CUSTOM_KKT_REGISTRY
        solver = CUSTOM_KKT_REGISTRY[opts.custom_kkt_token]
        return solver.solve(nlp, opts, fac, K, parts)
    from .lowrank_kkt import LowRankKKT, lowrank_solve_refined
    if isinstance(fac, LowRankKKT):
        return lowrank_solve_refined(fac, parts, opts)
    from .lowrank_struct import StructLowRankKKT
    if isinstance(fac, StructLowRankKKT):
        from .lowrank_struct import lowrank_struct_solve_refined
        return lowrank_struct_solve_refined(nlp, opts, fac, parts)
    be = _backend(nlp)
    if be == "btd":
        from .chained_kkt import pack_rhs, unpack_sol, chained_solve_refined
        rhs = pack_rhs(nlp, *parts)
        sol, rr = chained_solve_refined(K, fac, rhs, opts)
        return unpack_sol(nlp, sol), rr
    if be == "arrow":
        from .arrow_kkt import (pack_rhs_arrow, unpack_sol_arrow,
                                arrow_solve_refined)
        r0, rs = pack_rhs_arrow(nlp, *parts)
        (w0, ws), rr = arrow_solve_refined(K, fac, r0, rs, opts)
        return unpack_sol_arrow(nlp, w0, ws), rr
    if be == "banded":
        from ..sparse import pack_rhs_banded, unpack_sol_banded
        from .chained_kkt import chained_solve_refined
        rhs = pack_rhs_banded(nlp, *parts)
        sol, rr = chained_solve_refined(K, fac, rhs, opts)
        return unpack_sol_banded(nlp, sol), rr
    if be == "nd":
        from ..sparse import nd_solve_parts
        return nd_solve_parts(nlp, opts, fac, K, parts)
    rhs = jnp.concatenate(parts)
    sol, rr = solve_with_refinement(K, fac, rhs, opts)
    return split_aug_solution(sol, nlp.n, nlp.mi, nlp.me), rr


def direction_from_parts(nlp: CanonicalNLP, it: Iterate, xsplit, mu, failed):
    dx, ds, dy_c, dy_d = xsplit
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    step = Iterate(x=dx, s=ds, y_c=dy_c, y_d=dy_d,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
    return jax.tree.map(lambda v: jnp.where(failed, jnp.zeros_like(v), v), step)


def compute_search_direction(nlp: CanonicalNLP, opts: Options, it: Iterate,
                             ev: Evals, W, mu, delta_w_last,
                             ev_rhs: Evals = None) -> StepResult:
    """Assemble + factorize (with inertia correction) + solve + recover duals.

    ``ev_rhs``: optional higher-precision evaluation view for the RHS
    (refinement_precision='double'); the factorization uses ``ev``."""
    fr = factorize_any(nlp, opts, it, ev, W, mu, delta_w_last)
    parts = condensed_rhs_parts(nlp, it, ev_rhs if ev_rhs is not None else ev,
                                mu, opts.kappa_d)
    xsplit, rr = solve_any(nlp, opts, fr.fac, fr.K, parts)
    failed = fr.failed
    if (opts.neg_curv_test_tol > 0 and _backend(nlp) == "dense"
            and not isinstance(W, tuple) and hasattr(W, "ndim")
            and getattr(W, "ndim", 0) == 2):
        # Inertia-free curvature test (IpPDFullSpaceSolver.cpp:592-637):
        # when the inertia correction gave up, still accept the direction if
        # the Hessian curvature along dx is sufficiently positive:
        #     dx' (W + delta_x I) dx >= neg_curv_test_tol * ||dx||^2.
        dx = xsplit[0]
        curv = jnp.dot(dx, W @ dx)
        if opts.neg_curv_test_reg:
            # neg_curv_test_reg (IpPDFullSpaceSolver.cpp:71-76): include the
            # primal regularization in the tested curvature
            curv = curv + fr.delta_x * jnp.dot(dx, dx)
        curv_ok = curv >= opts.neg_curv_test_tol * jnp.dot(dx, dx)
        failed = jnp.logical_and(failed, jnp.logical_not(curv_ok))
    step = direction_from_parts(nlp, it, xsplit, mu, failed)
    return StepResult(step=step, delta_x=fr.delta_x, delta_c=fr.delta_c,
                      delta_w_last=fr.delta_w_last, failed=failed,
                      num_trials=fr.num_trials, residual_ratio=rr,
                      fac=fr.fac, K=fr.K)


def soc_direction(nlp: CanonicalNLP, opts: Options, it: Iterate, ev: Evals,
                  fac, K, mu, c_soc, dms_soc, alpha_soc=None):
    """Second-order correction direction: same factorization, constraint parts
    of the rhs replaced by the SOC values (FilterLSAcceptor::
    TrySecondOrderCorrection, IpFilterLSAcceptor.cpp:531).  soc_method=1
    additionally scales the x/s rhs rows by the running SOC step size
    (IpFilterLSAcceptor.cpp:572-603)."""
    from ..kkt import grad_barrier_x, grad_barrier_s
    r_x = (grad_barrier_x(nlp, it, ev.grad_f, mu, opts.kappa_d)
           + ev.jc_t(it.y_c) + ev.jd_t(it.y_d))
    r_s = grad_barrier_s(nlp, it, mu, opts.kappa_d) - it.y_d
    if opts.soc_method == 1 and alpha_soc is not None:
        r_x = alpha_soc * r_x
        r_s = alpha_soc * r_s
    parts = (-r_x, -r_s, -c_soc, -dms_soc)
    xsplit, _ = solve_any(nlp, opts, fac, K, parts)
    dx, ds, dy_c, dy_d = xsplit
    dz_L, dz_U, dv_L, dv_U = recover_bound_mult_steps(nlp, it, dx, ds, mu)
    return Iterate(x=dx, s=ds, y_c=dy_c, y_d=dy_d,
                   z_L=dz_L, z_U=dz_U, v_L=dv_L, v_U=dv_U)
