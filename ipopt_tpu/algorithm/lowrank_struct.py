"""Sherman-Morrison-Woodbury low-rank (L-BFGS) augmented systems over the
STRUCTURED KKT backends (chained/BTD, scenario/arrow, banded/BCR).

Reference parity: ``LowRankAugSystemSolver`` is linear-solver-agnostic in the
reference — it wraps whatever AugSystemSolver the builder picked
(``src/Algorithm/IpLowRankAugSystemSolver.cpp``, ``IpAlgBuilder.cpp:568-628``).
This module provides the same composition for the TPU backends: the base
system K0 replaces W by sigma*I (which preserves every structure — diagonal
blocks only), the structured factorization handles K0, and the low-rank
correction  K = K0 - Utilde M^{-1} Utilde^T  is applied via SMW with exact
Haynsworth inertia bookkeeping, exactly like the dense path in
``lowrank_kkt.py``.

Closes the r1 NotImplementedError "limited-memory Hessian with structured
KKT backends" (VERDICT item 4)."""
from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import sigmas
from ..linalg.ldlt import dense_solve
from .quasi_newton import LowRankW


class StructLowRankKKT(NamedTuple):
    """Factorization object; plays (fac) for step.solve_any dispatch."""

    base_fac: Any
    base_K: Any
    U: jnp.ndarray       # (n, 2k)
    M: jnp.ndarray       # (2k, 2k)
    Cw: jnp.ndarray      # eigenvalues of C = M - U^T Zx
    CV: jnp.ndarray
    smw_singular: jnp.ndarray
    Zx: jnp.ndarray      # (n, 2k) x-rows of K0^{-1} Utilde
    Zs: jnp.ndarray
    Zyc: jnp.ndarray
    Zyd: jnp.ndarray


class StructLowRankResult(NamedTuple):
    fac: StructLowRankKKT
    K: Any
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def _base_solvers(nlp: CanonicalNLP):
    """(solve4, matvec4) for the structured base system — reconstructible
    from the static structure alone (no iterate-dependent captures), so the
    solve path never recomputes Jacobians."""
    from .step import _backend
    be = _backend(nlp)
    if be == "btd":
        from .chained_kkt import pack_rhs, unpack_sol
        from ..linalg.block_tridiag import bcr_solve

        def solve4(fac, Kb, parts):
            return unpack_sol(nlp, bcr_solve(fac, pack_rhs(nlp, *parts)))

        def matvec4(Kb, parts):
            return unpack_sol(nlp, Kb.matvec(pack_rhs(nlp, *parts)))

        return solve4, matvec4
    if be == "arrow":
        from .arrow_kkt import arrow_solve, pack_rhs_arrow, unpack_sol_arrow

        def solve4(fac, Ka, parts):
            r0, rs = pack_rhs_arrow(nlp, *parts)
            w0, ws = arrow_solve(fac, r0, rs)
            return unpack_sol_arrow(nlp, w0, ws)

        def matvec4(Ka, parts):
            r0, rs = pack_rhs_arrow(nlp, *parts)
            o0, os = Ka.matvec(r0, rs)
            return unpack_sol_arrow(nlp, o0, os)

        return solve4, matvec4
    if be == "banded":
        from ..sparse import pack_rhs_banded, unpack_sol_banded
        from ..linalg.block_tridiag import bcr_solve

        def solve4(fac, Kb, parts):
            return unpack_sol_banded(
                nlp, bcr_solve(fac, pack_rhs_banded(nlp, *parts)))

        def matvec4(Kb, parts):
            return unpack_sol_banded(
                nlp, Kb.matvec(pack_rhs_banded(nlp, *parts)))

        return solve4, matvec4
    raise ValueError("unknown structured backend")


def _base_factor(nlp: CanonicalNLP, opts: Options, it: Iterate, sigma):
    """factor(delta_x, delta_c) -> (K, fac, ok) with W = sigma*I."""
    from .step import _backend
    be = _backend(nlp)
    dtype = it.x.dtype

    if be == "btd":
        from ..chained import stage_jacobians, ChainInfo
        from .chained_kkt import assemble_btd, expected_inertia
        from ..linalg.block_tridiag import bcr_factorize
        ch: ChainInfo = nlp.chain
        AB = stage_jacobians(nlp, it.x)
        eye_v = jnp.eye(ch.v, dtype=dtype)
        Wd = jnp.broadcast_to(sigma * eye_v, (ch.K + 1, ch.v, ch.v))
        Wo = jnp.zeros((ch.K, ch.v, ch.v), dtype)
        exp_pos, exp_neg = expected_inertia(nlp)

        def factor(dxv, dcv):
            Kb = assemble_btd(nlp, it, AB, (Wd, Wo), dxv, dcv)
            fac = bcr_factorize(Kb, pivot_tol=opts.ldlt_pivot_tol,
                                equilibrate=opts.linear_system_scaling
                                == "mc19")
            ok = jnp.logical_and(
                jnp.logical_and(fac.num_pos == exp_pos,
                                fac.num_neg == exp_neg),
                jnp.logical_not(fac.singular))
            return Kb, fac, ok

        return factor

    if be == "arrow":
        from ..parallel.scenario import ArrowInfo, scenario_jacobians
        from .arrow_kkt import (assemble_arrow, arrow_factorize,
                                expected_inertia_arrow)
        ar: ArrowInfo = nlp.chain
        Jb = scenario_jacobians(nlp, it.x)
        W00 = sigma * jnp.eye(ar.n0, dtype=dtype)
        W0s = jnp.zeros((ar.S, ar.ns, ar.n0), dtype)
        Wss = jnp.broadcast_to(sigma * jnp.eye(ar.ns, dtype=dtype),
                               (ar.S, ar.ns, ar.ns))
        exp_pos, exp_neg = expected_inertia_arrow(nlp)

        def factor(dxv, dcv):
            Ka = assemble_arrow(nlp, it, Jb, (W00, W0s, Wss), dxv, dcv)
            fac = arrow_factorize(Ka, pivot_tol=opts.ldlt_pivot_tol,
                                  use_pallas=opts.use_pallas)
            ok = jnp.logical_and(
                jnp.logical_and(fac.num_pos == exp_pos,
                                fac.num_neg == exp_neg),
                jnp.logical_not(fac.singular))
            return Ka, fac, ok

        return factor

    if be == "banded":
        from ..sparse import (BandedInfo, assemble_banded, jacobian_values,
                              expected_inertia_banded)
        from ..linalg.block_tridiag import bcr_factorize
        info: BandedInfo = nlp.chain
        j_vals = jacobian_values(nlp, it.x)
        # sigma*I on the x diagonal through the H pattern's diagonal entries
        h_diag = jnp.asarray(info.h_rows) == jnp.asarray(info.h_cols)
        h_vals = jnp.where(h_diag, sigma, 0.0).astype(dtype)
        exp_pos, exp_neg = expected_inertia_banded(nlp)

        def factor(dxv, dcv):
            Kb = assemble_banded(nlp, it, j_vals, h_vals, dxv, dcv)
            fac = bcr_factorize(Kb, pivot_tol=opts.ldlt_pivot_tol,
                                equilibrate=opts.linear_system_scaling
                                == "mc19")
            ok = jnp.logical_and(
                jnp.logical_and(fac.num_pos == exp_pos,
                                fac.num_neg == exp_neg),
                jnp.logical_not(fac.singular))
            return Kb, fac, ok

        return factor

    raise ValueError("unknown structured backend")


def lowrank_struct_factorize(nlp: CanonicalNLP, opts: Options, it: Iterate,
                             lrw: LowRankW, mu,
                             delta_w_last) -> StructLowRankResult:
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = it.x.dtype
    twok = lrw.U.shape[1]
    factor = _base_factor(nlp, opts, it, lrw.sigma)
    solve4, matvec4 = _base_solvers(nlp)

    # block eliminations need delta_c > 0 (see chained_kkt.py)
    delta_cd = jnp.maximum(
        opts.jacobian_regularization_value
        * mu ** opts.jacobian_regularization_exponent,
        opts.jacobian_regularization_value)

    zeros_s = jnp.zeros((mi,), dtype)
    zeros_c = jnp.zeros((me,), dtype)

    def smw_pieces(fac, K):
        def one_col(u_col):
            return solve4(fac, K, (u_col, zeros_s, zeros_c, zeros_s))

        Zx, Zs, Zyc, Zyd = jax.vmap(one_col, in_axes=1, out_axes=1)(lrw.U)
        C = lrw.M - lrw.U.T @ Zx
        Cw, CV = jnp.linalg.eigh(C)
        Mw = jnp.linalg.eigvalsh(lrw.M)
        eps = jnp.finfo(dtype).eps

        def counts(w):
            tol = eps * jnp.maximum(jnp.max(jnp.abs(w), initial=0.0), 1.0)
            return (jnp.sum(w > tol).astype(jnp.int32),
                    jnp.sum(w < -tol).astype(jnp.int32))

        c_pos, c_neg = counts(Cw)
        m_pos, m_neg = counts(Mw)
        smw_singular = c_pos + c_neg < twok
        smw_ok = jnp.logical_and(
            jnp.logical_and(c_pos == m_pos, c_neg == m_neg),
            jnp.logical_not(smw_singular))
        return Zx, Zs, Zyc, Zyd, Cw, CV, smw_singular, smw_ok

    def full_factor(dxv, dcv):
        K, base_fac, base_ok = factor(dxv, dcv)
        Zx, Zs, Zyc, Zyd, Cw, CV, smw_singular, smw_ok = smw_pieces(
            base_fac, K)
        # track singularity of EITHER stage so the retry loop escalates
        # delta_c (block eliminations report tiny delta_c pivots as zero)
        any_singular = jnp.logical_or(base_fac.singular, smw_singular)
        fac = StructLowRankKKT(base_fac=base_fac, base_K=K, U=lrw.U, M=lrw.M,
                               Cw=Cw, CV=CV, smw_singular=any_singular,
                               Zx=Zx, Zs=Zs, Zyc=Zyc, Zyd=Zyd)
        ok = jnp.logical_and(base_ok, smw_ok)
        return K, fac, ok

    zero = jnp.zeros((), dtype)
    dc0 = delta_cd * jnp.ones((), dtype)
    K0, fac0, ok0 = full_factor(zero, dc0)

    def cond(carry):
        trial, dxv, dcv, K, fac, ok, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body(carry):
        trial, dxv, dcv, K, fac, ok, gave_up = carry
        was_singular = fac.smw_singular
        only_dc = jnp.logical_and(was_singular, dcv <= delta_cd)
        new_dc = jnp.where(was_singular,
                           jnp.minimum(jnp.maximum(dcv * 100.0, delta_cd),
                                       1e-4),
                           dcv)
        first_try = (dxv == 0)
        start_val = jnp.where(delta_w_last == 0,
                              opts.first_hessian_perturbation,
                              jnp.maximum(opts.min_hessian_perturbation,
                                          delta_w_last * opts.perturb_dec_fact))
        inc_fact = jnp.where(delta_w_last == 0,
                             opts.perturb_inc_fact_first, opts.perturb_inc_fact)
        bumped = jnp.where(first_try, start_val, dxv * inc_fact)
        new_dx = jnp.where(only_dc, dxv, bumped)
        gave_up = new_dx > opts.max_hessian_perturbation
        K, fac, ok = full_factor(new_dx, new_dc)
        return trial + 1, new_dx, new_dc, K, fac, ok, gave_up

    trials, dxv, dcv, K, fac, ok, gave_up = lax.while_loop(
        cond, body,
        (jnp.ones((), jnp.int32), zero, dc0, K0, fac0, ok0,
         jnp.zeros((), bool)))

    failed = jnp.logical_not(ok)
    new_last = jnp.where(dxv > 0, dxv, delta_w_last)
    return StructLowRankResult(fac=fac, K=K, delta_x=dxv, delta_c=dcv,
                               delta_w_last=new_last, failed=failed,
                               num_trials=trials)


def _smw_apply(fac: StructLowRankKKT, base_sol):
    dx0, ds0, dyc0, dyd0 = base_sol
    t = fac.CV.T @ (fac.U.T @ dx0)
    tiny = jnp.finfo(dx0.dtype).tiny
    safe_w = jnp.where(jnp.abs(fac.Cw) > tiny, fac.Cw,
                       jnp.where(fac.Cw >= 0, tiny, -tiny))
    w = fac.CV @ (t / safe_w)
    return (dx0 + fac.Zx @ w, ds0 + fac.Zs @ w,
            dyc0 + fac.Zyc @ w, dyd0 + fac.Zyd @ w)


def lowrank_struct_solve_refined(nlp: CanonicalNLP, opts: Options,
                                 fac: StructLowRankKKT, parts):
    """SMW solve + iterative refinement on the exact corrected operator."""
    solve4, matvec4 = _base_solvers(nlp)

    def solve_once(p):
        return _smw_apply(fac, solve4(fac.base_fac, fac.base_K, p))

    def matvec(sol):
        kx, ks, kc, kd = matvec4(fac.base_K, sol)
        # pivoted LU: M is indefinite; unpivoted LDL^T can hit a 0 pivot
        corr = fac.U @ jnp.linalg.solve(fac.M, fac.U.T @ sol[0])
        return (kx - corr, ks, kc, kd)

    sol = solve_once(parts)
    rhs_norm = jnp.maximum(
        jnp.max(jnp.abs(jnp.concatenate(parts)), initial=0.0), 1e-30)

    def residual(sol):
        kx, ks, kc, kd = matvec(sol)
        return (parts[0] - kx, parts[1] - ks, parts[2] - kc, parts[3] - kd)

    def ratio(sol):
        return jnp.max(jnp.abs(jnp.concatenate(residual(sol))),
                       initial=0.0) / rhs_norm

    if opts.fast_step_computation:
        return sol, jnp.zeros((), parts[0].dtype)

    def body(carry):
        i, sol, _ = carry
        corr = solve_once(residual(sol))
        sol = tuple(s + c for s, c in zip(sol, corr))
        return i + 1, sol, ratio(sol)

    def cond(carry):
        i, _, rr = carry
        return jnp.logical_or(
            i < opts.min_refinement_steps,
            jnp.logical_and(i < opts.max_refinement_steps,
                            rr > opts.residual_ratio_max))

    i0 = jnp.zeros((), jnp.int32)
    _, sol, rr = lax.while_loop(cond, body, (i0, sol, ratio(sol)))
    return sol, rr
