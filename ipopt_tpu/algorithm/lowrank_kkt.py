"""Sherman-Morrison augmented-system solver for limited-memory Hessians.

Reference parity: ``LowRankAugSystemSolver``
(``src/Algorithm/IpLowRankAugSystemSolver.{hpp,cpp}``, wired for
``limited_memory_aug_solver=sherman-morrison`` in ``IpAlgBuilder.cpp:568-628``):
when W is the L-BFGS compact form B = sigma I - U M^{-1} U^T, the augmented
system

    K = K0 - Utilde M^{-1} Utilde^T,      Utilde = [U; 0; 0; 0]

is solved via Sherman-Morrison-Woodbury on top of the *diagonal-Hessian* base
system K0 (W replaced by sigma I), instead of materializing the dense (n, n)
Hessian and running an O(n^3) dense factorization.

TPU-native design:
- The base system has a diagonal (x, x) block h = sigma + Sigma_x + delta_x > 0
  and diagonal (s, s) block, so it condenses exactly onto the constraint rows:
  an (me+mi, me+mi) Schur complement  S = J H^{-1} J^T + diag(delta_c, D_s^{-1}
  + delta_d), factorized by the dense LDL^T kernel.  Cost per iteration is
  O(n m^2 + m^3 + n k^2) instead of O(n^3).
- Inertia is exact via Haynsworth:  In(K) = In(K0) + In(C) - In(M) with
  C = M - Utilde^T K0^{-1} Utilde, so K has the required (n+mi, me+mi, 0)
  inertia iff the base Schur complement is positive definite and
  In(C) == In(M) (both 2k x 2k, checked with the same LDL^T kernel).  This is
  the same small-matrix inertia bookkeeping the reference does in
  ``IpLowRankAugSystemSolver.cpp`` (negevals of the correction terms).
- Z = K0^{-1} Utilde is precomputed at factorization time (one batched base
  solve over 2k right-hand sides), so every subsequent solve is the base solve
  plus two skinny matmuls — the adaptive-mu oracles and SOC reuse it freely.
- Everything is fixed-shape (2k = 2 * limited_memory_max_history static), so
  the whole path vmaps for batched NLPs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options
from ..kkt import Evals, SigmaBlocks, sigmas
from ..linalg.ldlt import ldlt, ldlt_solve, LDLTResult
from .quasi_newton import LowRankW


class LowRankKKT(NamedTuple):
    """Factorization object for the low-rank augmented system.

    Plays the role of (fac, K) for ``step.solve_any`` dispatch; also provides
    the exact K matvec pieces needed by iterative refinement.
    """
    h: jnp.ndarray          # (n,) diagonal of the base (x, x) block
    dsd: jnp.ndarray        # (mi,) diagonal of the base (s, s) block
    J_c: jnp.ndarray        # (me, n)
    J_d: jnp.ndarray        # (mi, n)
    delta_c: jnp.ndarray
    delta_d: jnp.ndarray
    S_fac: LDLTResult       # LDL^T of the (me+mi) condensed Schur complement
    U: jnp.ndarray          # (n, 2k)
    M: jnp.ndarray          # (2k, 2k)
    Cw: jnp.ndarray         # (2k,) eigenvalues of C = M - U^T Z_x
    CV: jnp.ndarray         # (2k, 2k) eigenvectors of C
    smw_singular: jnp.ndarray  # bool: C numerically singular
    Zx: jnp.ndarray         # (n, 2k)   x-rows of K0^{-1} Utilde
    Zs: jnp.ndarray         # (mi, 2k)
    Zyc: jnp.ndarray        # (me, 2k)
    Zyd: jnp.ndarray        # (mi, 2k)


class LowRankFactorResult(NamedTuple):
    fac: LowRankKKT
    K: None                 # no dense matrix; matvec lives in the fac
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def _base_solve(h, dsd, J_c, J_d, delta_c, delta_d, S_fac,
                r_x, r_s, r_c, r_d):
    """Solve the diagonal-Hessian base system K0 w = r by condensation.

    K0 rows:  h dx            + J_c^T dy_c + J_d^T dy_d = r_x
              dsd ds                       -      dy_d  = r_s
              J_c dx - delta_c dy_c                     = r_c
              J_d dx - ds            - delta_d dy_d     = r_d
    Eliminating dx = h^{-1}(r_x - J^T dy) and ds = dsd^{-1}(r_s + dy_d) gives
    the SPD Schur system  S [dy_c; dy_d] = [J_c h^{-1} r_x - r_c;
    J_d h^{-1} r_x - dsd^{-1} r_s - r_d].  All inputs may carry a trailing
    batch of right-hand sides (shape (n,) or (n, k)).
    """
    vec = r_x.ndim == 1
    if vec:
        r_x, r_s, r_c, r_d = (r[:, None] for r in (r_x, r_s, r_c, r_d))
    hinv_rx = r_x / h[:, None]
    dsinv_rs = r_s / dsd[:, None]
    rhs_m = jnp.concatenate([J_c @ hinv_rx - r_c,
                             J_d @ hinv_rx - dsinv_rs - r_d], axis=0)
    y = ldlt_solve(S_fac, rhs_m)
    me = J_c.shape[0]
    dy_c, dy_d = y[:me], y[me:]
    dx = hinv_rx - (J_c.T @ dy_c + J_d.T @ dy_d) / h[:, None]
    ds = dsinv_rs + dy_d / dsd[:, None]
    if vec:
        return dx[:, 0], ds[:, 0], dy_c[:, 0], dy_d[:, 0]
    return dx, ds, dy_c, dy_d


def _schur_matrix(h, dsd, J_c, J_d, delta_c, delta_d):
    me, mi = J_c.shape[0], J_d.shape[0]
    dtype = h.dtype
    Jh_c = J_c / h[None, :]
    Jh_d = J_d / h[None, :]
    S_cc = Jh_c @ J_c.T + delta_c * jnp.eye(me, dtype=dtype)
    S_cd = Jh_c @ J_d.T
    S_dd = (Jh_d @ J_d.T + jnp.diag(1.0 / dsd)
            + delta_d * jnp.eye(mi, dtype=dtype))
    return jnp.block([[S_cc, S_cd], [S_cd.T, S_dd]])


def lowrank_factorize_kkt(nlp: CanonicalNLP, opts: Options, it: Iterate,
                          ev: Evals, lrw: LowRankW, mu,
                          delta_w_last) -> LowRankFactorResult:
    """Factorize the low-rank augmented system with the same
    inertia-correction retry loop as the dense path
    (``PDFullSpaceSolver::Solve``, IpPDFullSpaceSolver.cpp:497-639)."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = it.x.dtype
    sig = sigmas(nlp, it)
    m = me + mi
    twok = lrw.U.shape[1]

    delta_cd = (opts.jacobian_regularization_value
                * mu ** opts.jacobian_regularization_exponent)

    def factor(delta_x, delta_c):
        h = lrw.sigma + sig.sigma_x + delta_x
        # delta_s = delta_x (StdAugSystemSolver); the condensation needs
        # dsd > 0, so floor at sqrt(tiny) — Sigma_s is strictly positive in
        # exact arithmetic (every s has a bound, v kept interior) but can
        # underflow for huge slacks.
        dsd = jnp.maximum(sig.sigma_s + delta_x,
                          jnp.sqrt(jnp.finfo(dtype).tiny))
        S = _schur_matrix(h, dsd, ev.J_c, ev.J_d, delta_c, delta_c)
        S_fac = ldlt(S, pivot_tol=opts.ldlt_pivot_tol)
        # Base inertia is correct iff h > 0 (guaranteed: sigma > 0 clipped,
        # Sigma_x >= 0, delta_x >= 0) and the negated-constraint-block Schur
        # complement is positive definite.
        base_ok = jnp.logical_and(S_fac.num_pos == m,
                                  jnp.logical_not(S_fac.singular))
        # Z = K0^{-1} [U; 0; 0; 0]  (batched base solve over 2k columns).
        zero_s = jnp.zeros((mi, twok), dtype)
        zero_c = jnp.zeros((me, twok), dtype)
        Zx, Zs, Zyc, Zyd = _base_solve(h, dsd, ev.J_c, ev.J_d, delta_c,
                                       delta_c, S_fac, lrw.U, zero_s,
                                       zero_c, zero_s)
        C = lrw.M - lrw.U.T @ Zx
        # Inertia of the small (2k, 2k) matrices via eigendecomposition —
        # robust where unpivoted LDL^T of an indefinite matrix breaks down.
        # Haynsworth: In(K) = In(K0) + In(C) - In(M) -> correct overall
        # inertia iff In(C) == In(M) and C nonsingular.
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
        ok = jnp.logical_and(base_ok, smw_ok)
        fac = LowRankKKT(h=h, dsd=dsd, J_c=ev.J_c, J_d=ev.J_d,
                         delta_c=delta_c, delta_d=delta_c, S_fac=S_fac,
                         U=lrw.U, M=lrw.M, Cw=Cw, CV=CV,
                         smw_singular=smw_singular,
                         Zx=Zx, Zs=Zs, Zyc=Zyc, Zyd=Zyd)
        return fac, ok

    zero = jnp.zeros((), dtype)
    dx0 = zero
    dc0 = jnp.where(opts.perturb_always_cd, delta_cd, 0.0)
    fac0, ok0 = factor(dx0, dc0)

    def cond(carry):
        trial, delta_x, delta_c, fac, ok, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body(carry):
        trial, delta_x, delta_c, fac, ok, gave_up = carry
        was_singular = jnp.logical_or(fac.S_fac.singular, fac.smw_singular)
        only_dc = jnp.logical_and(was_singular, delta_c == 0)
        new_delta_c = jnp.where(jnp.logical_or(was_singular, delta_c > 0),
                                jnp.maximum(delta_c, delta_cd), delta_c)
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
        fac, ok = factor(new_delta_x, new_delta_c)
        return trial + 1, new_delta_x, new_delta_c, fac, ok, gave_up

    trial0 = jnp.ones((), jnp.int32)
    gave0 = jnp.zeros((), bool)
    trials, delta_x, delta_c, fac, ok, gave_up = lax.while_loop(
        cond, body, (trial0, dx0, dc0, fac0, ok0, gave0))

    failed = jnp.logical_not(ok)
    new_delta_w_last = jnp.where(delta_x > 0, delta_x, delta_w_last)
    return LowRankFactorResult(fac=fac, K=None, delta_x=delta_x,
                               delta_c=delta_c,
                               delta_w_last=new_delta_w_last, failed=failed,
                               num_trials=trials)


def lowrank_matvec(fac: LowRankKKT, dx, ds, dy_c, dy_d):
    """Exact K v for the low-rank augmented system (used by refinement):
    K = K0 - Utilde M^{-1} Utilde^T, so only the x-row gains the correction."""
    # pivoted LU: M is indefinite and unpivoted LDL^T can hit a 0 pivot
    Minv_Ut_dx = jnp.linalg.solve(fac.M, fac.U.T @ dx)
    r_x = (fac.h * dx + fac.J_c.T @ dy_c + fac.J_d.T @ dy_d
           - fac.U @ Minv_Ut_dx)
    r_s = fac.dsd * ds - dy_d
    r_c = fac.J_c @ dx - fac.delta_c * dy_c
    r_d = fac.J_d @ dx - ds - fac.delta_d * dy_d
    return r_x, r_s, r_c, r_d


def lowrank_solve_once(fac: LowRankKKT, r_x, r_s, r_c, r_d):
    """One SMW solve: w = K0^{-1} r + Z C^{-1} (U^T (K0^{-1} r)_x)."""
    dx0, ds0, dyc0, dyd0 = _base_solve(fac.h, fac.dsd, fac.J_c, fac.J_d,
                                       fac.delta_c, fac.delta_d, fac.S_fac,
                                       r_x, r_s, r_c, r_d)
    t = fac.CV.T @ (fac.U.T @ dx0)
    tiny = jnp.finfo(dx0.dtype).tiny
    safe_w = jnp.where(jnp.abs(fac.Cw) > tiny, fac.Cw,
                       jnp.where(fac.Cw >= 0, tiny, -tiny))
    w = fac.CV @ (t / safe_w)
    return (dx0 + fac.Zx @ w, ds0 + fac.Zs @ w,
            dyc0 + fac.Zyc @ w, dyd0 + fac.Zyd @ w)


def lowrank_solve_refined(fac: LowRankKKT, parts, opts: Options):
    """SMW solve + iterative refinement on the 4-block residual
    (IpPDFullSpaceSolver.cpp:235-345 equivalent)."""
    r_x, r_s, r_c, r_d = parts
    sol = lowrank_solve_once(fac, r_x, r_s, r_c, r_d)
    rhs_norm = jnp.maximum(
        jnp.max(jnp.abs(jnp.concatenate([r_x, r_s, r_c, r_d])), initial=0.0),
        1e-30)

    def residual(sol):
        kx, ks, kc, kd = lowrank_matvec(fac, *sol)
        return r_x - kx, r_s - ks, r_c - kc, r_d - kd

    def ratio(sol):
        res = residual(sol)
        return jnp.max(jnp.abs(jnp.concatenate(res)), initial=0.0) / rhs_norm

    if opts.fast_step_computation:
        return sol, jnp.zeros((), r_x.dtype)

    def body(carry):
        i, sol, _ = carry
        res = residual(sol)
        corr = lowrank_solve_once(fac, *res)
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
