"""Block-arrow augmented-KKT backend for scenario-decomposed problems.

Factorization = vmapped dense LDL^T of each scenario block + Schur complement
onto the shared variables:

    S = K_0 - sum_s C_s^T K_s^{-1} C_s

The scenario axis is embarrassingly parallel; under a device mesh the sum is
a psum over ICI inserted by GSPMD (the arrays carry the scenario axis), making
this the distributed Schur-complement KKT of BASELINE.json config 5.
Inertia = psum of scenario-block inertias + Schur-block inertia (Sylvester).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..problem import CanonicalNLP
from ..types import Iterate
from ..options import Options
from ..kkt import sigmas
from ..linalg.ldlt import ldlt, ldlt_solve, LDLTResult
from ..parallel.scenario import (ArrowInfo, scenario_jacobians,
                                 scenario_hessians)


class ArrowMatrix(NamedTuple):
    Ks: jnp.ndarray   # (S, bs, bs) scenario blocks
    Cs: jnp.ndarray   # (S, bs, n0) coupling blocks
    K0: jnp.ndarray   # (n0, n0) shared block

    def matvec(self, r0, rs):
        """(r0 (n0,), rs (S, bs)) -> same shapes."""
        out_s = (jnp.einsum("sij,sj->si", self.Ks, rs)
                 + jnp.einsum("sij,j->si", self.Cs, r0))
        out_0 = (self.K0 @ r0
                 + jnp.einsum("sji,sj->i", self.Cs, rs))
        return out_0, out_s


class ArrowFactor(NamedTuple):
    Ainv: jnp.ndarray    # (S, bs, bs) explicit scenario-block inverses
    ds: jnp.ndarray      # (S, bs) pivots (inertia)
    Yc: jnp.ndarray      # (S, bs, n0) = K_s^{-1} C_s
    L0: jnp.ndarray      # Schur factor
    d0: jnp.ndarray
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray
    num_zero: jnp.ndarray
    singular: jnp.ndarray


def assemble_arrow(nlp: CanonicalNLP, it: Iterate, Jblocks, Wblocks,
                   delta_x, delta_c) -> ArrowMatrix:
    ar: ArrowInfo = nlp.chain
    S, n0, ns, ms, bs = ar.S, ar.n0, ar.ns, ar.ms, ar.bs
    dtype = it.x.dtype
    J0, Js = Jblocks
    W00, W0s, Wss = Wblocks

    sig = sigmas(nlp, it)
    sig_x0 = sig.sigma_x[:n0]
    sig_xs = sig.sigma_x[n0:].reshape(S, ns)
    sig_s_flat = jnp.zeros((S * ms,), dtype)
    if nlp.struct.mi:
        sig_s_flat = sig_s_flat.at[jnp.asarray(nlp.struct.ineq_idx)].set(
            sig.sigma_s)
    sig_s = sig_s_flat.reshape(S, ms)
    ineq_row = jnp.asarray(~ar.eq_mask)

    eye_ns = jnp.eye(ns, dtype=dtype)
    eye_ms = jnp.eye(ms, dtype=dtype)

    Ks = jnp.zeros((S, bs, bs), dtype)
    Ks = Ks.at[:, :ns, :ns].set(
        Wss + (sig_xs + delta_x)[:, :, None] * eye_ns)
    ss = jnp.where(ineq_row[:, :, None],
                   (sig_s + delta_x)[:, :, None] * eye_ms, eye_ms)
    Ks = Ks.at[:, ns:ns + ms, ns:ns + ms].set(ss)
    Ks = Ks.at[:, ns + ms:, ns + ms:].set(
        jnp.broadcast_to(-delta_c * eye_ms, (S, ms, ms)))
    Ks = Ks.at[:, ns + ms:, :ns].set(Js)
    Ks = Ks.at[:, :ns, ns + ms:].set(jnp.swapaxes(Js, -1, -2))
    ys = jnp.where(ineq_row[:, :, None], -eye_ms, jnp.zeros_like(eye_ms))
    Ks = Ks.at[:, ns + ms:, ns:ns + ms].set(ys)
    Ks = Ks.at[:, ns:ns + ms, ns + ms:].set(jnp.swapaxes(ys, -1, -2))

    Cs = jnp.zeros((S, bs, n0), dtype)
    Cs = Cs.at[:, :ns, :].set(W0s)
    Cs = Cs.at[:, ns + ms:, :].set(J0)

    K0 = W00 + jnp.diag(sig_x0 + delta_x)
    return ArrowMatrix(Ks=Ks, Cs=Cs, K0=K0)


def arrow_factorize(K: ArrowMatrix, pivot_tol: float = 0.0,
                    use_pallas: bool = False) -> ArrowFactor:
    from ..linalg.block_tridiag import batched_block_ldlt_inv
    dtype = K.Ks.dtype
    ds, Ainv = batched_block_ldlt_inv(K.Ks, use_pallas)
    # per-block inertia from the pivots
    scale = jnp.maximum(jnp.max(jnp.abs(ds), axis=1, keepdims=True), 1.0)
    base = pivot_tol if pivot_tol > 0 else jnp.finfo(dtype).eps
    is_zero = jnp.abs(ds) <= base * scale
    blk_pos = jnp.sum(jnp.logical_and(~is_zero, ds > 0), axis=1)
    blk_neg = jnp.sum(jnp.logical_and(~is_zero, ds < 0), axis=1)
    blk_zer = jnp.sum(is_zero, axis=1)

    Yc = jnp.einsum("sij,sjk->sik", Ainv, K.Cs)
    # Schur complement (the einsum's scenario-axis sum lowers to a psum when
    # the S axis is sharded over the mesh).
    Schur = K.K0 - jnp.einsum("sji,sjk->ik", K.Cs, Yc)
    fac0 = ldlt(Schur, pivot_tol)
    num_pos = jnp.sum(blk_pos) + fac0.num_pos
    num_neg = jnp.sum(blk_neg) + fac0.num_neg
    num_zero = jnp.sum(blk_zer) + fac0.num_zero
    return ArrowFactor(Ainv=Ainv, ds=ds, Yc=Yc, L0=fac0.L, d0=fac0.d,
                       num_pos=num_pos.astype(jnp.int32),
                       num_neg=num_neg.astype(jnp.int32),
                       num_zero=num_zero.astype(jnp.int32),
                       singular=num_zero > 0)


def _solve_blk(L, d, B):
    from ..linalg.ldlt import tri_solve_unit_lower
    tiny = jnp.finfo(L.dtype).tiny
    safe_d = jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    y = tri_solve_unit_lower(L, B)
    z = y / safe_d[:, None]
    return tri_solve_unit_lower(L, z, transpose=True)


def arrow_solve(fac: ArrowFactor, r0, rs):
    """Solve the block-arrow system given the Schur factorization.

    Uses C_s^T K_s^{-1} r_s = Yc^T r_s (symmetry of K_s), so only the stored
    Yc is needed.  The scenario-axis reduction is the psum of the backsolve.
    """
    # Condense rhs onto the shared block.
    rhs0 = r0 - jnp.einsum("sji,sj->i", fac.Yc, rs)
    w0 = _solve_blk(fac.L0, fac.d0, rhs0[:, None])[:, 0]
    # Back-substitute per scenario (explicit inverses -> batched matvecs).
    u = jnp.einsum("sij,sj->si", fac.Ainv, rs)
    ws = u - jnp.einsum("sij,j->si", fac.Yc, w0)
    return w0, ws


def expected_inertia_arrow(nlp: CanonicalNLP):
    ar: ArrowInfo = nlp.chain
    s = nlp.struct
    # positives: all primal vars + real ineq slacks + eq-slack dummies
    return s.n + s.mi + s.me, s.me + s.mi


def pack_rhs_arrow(nlp: CanonicalNLP, r_x, r_s, r_c, r_d):
    """flat blocks -> (r0 (n0,), rs (S, bs))."""
    ar: ArrowInfo = nlp.chain
    S, n0, ns, ms, bs = ar.S, ar.n0, ar.ns, ar.ms, ar.bs
    st = nlp.struct
    dtype = r_x.dtype
    r0 = r_x[:n0]
    rs = jnp.zeros((S, bs), dtype)
    rs = rs.at[:, :ns].set(r_x[n0:].reshape(S, ns))
    s_flat = jnp.zeros((S * ms,), dtype)
    y_flat = jnp.zeros((S * ms,), dtype)
    if st.mi:
        ii = jnp.asarray(st.ineq_idx)
        s_flat = s_flat.at[ii].set(r_s)
        y_flat = y_flat.at[ii].set(r_d)
    if st.me:
        y_flat = y_flat.at[jnp.asarray(st.eq_idx)].set(r_c)
    rs = rs.at[:, ns:ns + ms].set(s_flat.reshape(S, ms))
    rs = rs.at[:, ns + ms:].set(y_flat.reshape(S, ms))
    return r0, rs


def unpack_sol_arrow(nlp: CanonicalNLP, w0, ws):
    ar: ArrowInfo = nlp.chain
    S, n0, ns, ms = ar.S, ar.n0, ar.ns, ar.ms
    st = nlp.struct
    dtype = w0.dtype
    dx = jnp.concatenate([w0, ws[:, :ns].reshape(-1)])
    s_flat = ws[:, ns:ns + ms].reshape(-1)
    y_flat = ws[:, ns + ms:].reshape(-1)
    ds = s_flat[jnp.asarray(st.ineq_idx)] if st.mi else jnp.zeros((0,), dtype)
    dy_c = y_flat[jnp.asarray(st.eq_idx)] if st.me else jnp.zeros((0,), dtype)
    dy_d = y_flat[jnp.asarray(st.ineq_idx)] if st.mi else jnp.zeros((0,), dtype)
    return dx, ds, dy_c, dy_d


class ArrowFactorResult(NamedTuple):
    fac: ArrowFactor
    K: ArrowMatrix
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def arrow_factorize_kkt(nlp: CanonicalNLP, opts: Options, it: Iterate,
                        Jblocks, Wblocks, mu, delta_w_last,
                        delta_cd_override=None) -> ArrowFactorResult:
    """Inertia-corrected arrow factorization (PDPerturbationHandler schedule)."""
    dtype = it.x.dtype
    exp_pos, exp_neg = expected_inertia_arrow(nlp)
    # Always dual-regularized (see chained_kkt.py: block elimination needs
    # invertible diagonal blocks).
    base_cd = (delta_cd_override if delta_cd_override is not None
               else opts.jacobian_regularization_value
               * mu ** opts.jacobian_regularization_exponent)
    delta_cd = jnp.maximum(base_cd, opts.jacobian_regularization_value)

    def factor(dxv, dcv):
        Kb = assemble_arrow(nlp, it, Jblocks, Wblocks, dxv, dcv)
        fac = arrow_factorize(Kb, pivot_tol=opts.ldlt_pivot_tol,
                              use_pallas=opts.use_pallas)
        ok = jnp.logical_and(
            jnp.logical_and(fac.num_pos == exp_pos, fac.num_neg == exp_neg),
            jnp.logical_not(fac.singular))
        return Kb, fac, ok

    zero = jnp.zeros((), dtype)
    dc0 = delta_cd * jnp.ones((), dtype)
    K0, fac0, ok0 = factor(zero, dc0)

    def cond(carry):
        trial, dxv, dcv, Kb, fac, ok, gave_up = carry
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(ok, gave_up)),
            trial < opts.max_inertia_correction_rounds)

    def body(carry):
        trial, dxv, dcv, Kb, fac, ok, gave_up = carry
        was_singular = fac.singular
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
        Kb, fac, ok = factor(new_dx, new_dc)
        return trial + 1, new_dx, new_dc, Kb, fac, ok, gave_up

    trials, dxv, dcv, Kb, fac, ok, gave_up = lax.while_loop(
        cond, body,
        (jnp.ones((), jnp.int32), zero, dc0, K0, fac0, ok0,
         jnp.zeros((), bool)))

    failed = jnp.logical_not(ok)
    new_last = jnp.where(dxv > 0, dxv, delta_w_last)
    return ArrowFactorResult(fac=fac, K=Kb, delta_x=dxv, delta_c=dcv,
                             delta_w_last=new_last, failed=failed,
                             num_trials=trials)


def arrow_solve_refined(K: ArrowMatrix, fac: ArrowFactor, r0, rs,
                        opts: Options):
    w0, ws = arrow_solve(fac, r0, rs)
    norm = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r0), initial=0.0),
                                   jnp.max(jnp.abs(rs), initial=0.0)), 1e-30)

    def ratio(w0, ws):
        o0, os = K.matvec(w0, ws)
        return jnp.maximum(jnp.max(jnp.abs(r0 - o0), initial=0.0),
                           jnp.max(jnp.abs(rs - os), initial=0.0)) / norm

    def body(carry):
        i, w0, ws, _ = carry
        o0, os = K.matvec(w0, ws)
        e0, es = arrow_solve(fac, r0 - o0, rs - os)
        w0, ws = w0 + e0, ws + es
        return i + 1, w0, ws, ratio(w0, ws)

    def cond(carry):
        i, _, _, rr = carry
        return jnp.logical_or(
            i < opts.min_refinement_steps,
            jnp.logical_and(i < opts.max_refinement_steps,
                            rr > opts.residual_ratio_max))

    if opts.fast_step_computation:
        return (w0, ws), jnp.zeros((), r0.dtype)
    _, w0, ws, rr = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), w0, ws, ratio(w0, ws)))
    return (w0, ws), rr
