"""Block-tridiagonal augmented-KKT backend for chained problems.

Assembles the augmented system of a chained NLP (ipopt_tpu/chained.py) directly
into a BTDMatrix and factorizes with block cyclic reduction — the structured
replacement for ``StdAugSystemSolver`` + MA27 (SURVEY.md §2.3).

Stage-block unknown ordering (block k of K+1 blocks, size bs = v + 2 mk):

    [ x_k (v) | s_k (mk) | y_k (mk) ]

    diag_k = [[W_kk + Sig_x + dx I,        0,         A_k^T ],
              [        0,          Sig_s + dx I_m,    -I_m  ],
              [       A_k,              -I_m,        -dc I  ]]
    sub_k (rows block k+1, cols block k)
           = [[W_{k+1,k}, 0, B_k^T], [0,0,0], [0,0,0]]

Equality rows have no slack: their s slot is a dummy (+1 diagonal, no -I
coupling, zero rhs).  The terminal block K has only x_K; its s/y slots are
dummies.  Expected inertia therefore is
    pos = n + mi + (me + 2 mk)  [real positives + dummies]
    neg = me + mi.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..problem import CanonicalNLP
from ..types import Iterate
from ..options import Options
from ..kkt import SigmaBlocks, sigmas
from ..linalg.block_tridiag import (BTDMatrix, bcr_factorize, bcr_solve,
                                    BCRFactor, btd_cast)
from ..chained import ChainInfo, stage_jacobians, stage_hessians


def _row_layout(nlp: CanonicalNLP):
    """Static helpers: flat constraint-row index arrays."""
    ch: ChainInfo = nlp.chain
    s = nlp.struct
    return ch, s.eq_idx, s.ineq_idx


def assemble_btd(nlp: CanonicalNLP, it: Iterate, AB, Wblocks,
                 delta_x, delta_c) -> BTDMatrix:
    ch: ChainInfo = nlp.chain
    K, v, mk, bs = ch.K, ch.v, ch.mk, ch.bs
    dtype = it.x.dtype
    A, B = AB
    Wd, Wo = Wblocks

    sig = sigmas(nlp, it)
    sigma_x = sig.sigma_x.reshape(K + 1, v)
    # scatter sigma_s (mi,) into (K, mk); dummy slots get 0 here
    sig_s_flat = jnp.zeros((K * mk,), dtype)
    if nlp.struct.mi:
        sig_s_flat = sig_s_flat.at[jnp.asarray(nlp.struct.ineq_idx)].set(
            sig.sigma_s)
    sigma_s = sig_s_flat.reshape(K, mk)
    ineq_row = jnp.asarray(~ch.eq_mask)  # (K, mk) bool

    diag = jnp.zeros((K + 1, bs, bs), dtype)
    # x-x block
    xx = Wd + (sigma_x + delta_x)[:, :, None] * jnp.eye(v, dtype=dtype)
    diag = diag.at[:, :v, :v].set(xx)

    eye_m = jnp.eye(mk, dtype=dtype)
    # s-s block: Sig_s + delta_x on ineq rows; +1 dummy on eq rows
    ss = jnp.where(ineq_row[:, :, None],
                   (sigma_s + delta_x)[:, :, None] * eye_m,
                   eye_m)
    diag = diag.at[:K, v:v + mk, v:v + mk].set(ss)
    # y-y block: -delta_c
    yy = -delta_c * eye_m
    diag = diag.at[:K, v + mk:, v + mk:].set(
        jnp.broadcast_to(yy, (K, mk, mk)))
    # y-x / x-y: A_k
    diag = diag.at[:K, v + mk:, :v].set(A)
    diag = diag.at[:K, :v, v + mk:].set(jnp.swapaxes(A, -1, -2))
    # y-s / s-y: -I on ineq rows
    ys = jnp.where(ineq_row[:, :, None], -eye_m, jnp.zeros_like(eye_m))
    diag = diag.at[:K, v + mk:, v:v + mk].set(ys)
    diag = diag.at[:K, v:v + mk, v + mk:].set(jnp.swapaxes(ys, -1, -2))
    # terminal block K: s/y dummies
    diag = diag.at[K, v:, v:].set(jnp.eye(2 * mk, dtype=dtype))

    sub = jnp.zeros((K + 1, bs, bs), dtype)
    sub = sub.at[:K, :v, :v].set(Wo)
    sub = sub.at[:K, :v, v + mk:].set(jnp.swapaxes(B, -1, -2))
    return BTDMatrix(diag=diag, sub=sub)


def pack_rhs(nlp: CanonicalNLP, r_x, r_s, r_c, r_d):
    """(n,), (mi,), (me,), (mi,) -> flat stage layout ((K+1)*bs,)."""
    ch: ChainInfo = nlp.chain
    K, v, mk, bs = ch.K, ch.v, ch.mk, ch.bs
    dtype = r_x.dtype
    s = nlp.struct
    out = jnp.zeros((K + 1, bs), dtype)
    out = out.at[:, :v].set(r_x.reshape(K + 1, v))
    s_flat = jnp.zeros((K * mk,), dtype)
    y_flat = jnp.zeros((K * mk,), dtype)
    if s.mi:
        ii = jnp.asarray(s.ineq_idx)
        s_flat = s_flat.at[ii].set(r_s)
        y_flat = y_flat.at[ii].set(r_d)
    if s.me:
        y_flat = y_flat.at[jnp.asarray(s.eq_idx)].set(r_c)
    out = out.at[:K, v:v + mk].set(s_flat.reshape(K, mk))
    out = out.at[:K, v + mk:].set(y_flat.reshape(K, mk))
    return out.reshape(-1)


def unpack_sol(nlp: CanonicalNLP, sol):
    """Inverse of pack_rhs: -> (dx (n,), ds (mi,), dy_c (me,), dy_d (mi,))."""
    ch: ChainInfo = nlp.chain
    K, v, mk, bs = ch.K, ch.v, ch.mk, ch.bs
    s = nlp.struct
    S = sol.reshape(K + 1, bs)
    dx = S[:, :v].reshape(-1)
    s_flat = S[:K, v:v + mk].reshape(-1)
    y_flat = S[:K, v + mk:].reshape(-1)
    ds = s_flat[jnp.asarray(s.ineq_idx)] if s.mi else jnp.zeros((0,), sol.dtype)
    dy_c = y_flat[jnp.asarray(s.eq_idx)] if s.me else jnp.zeros((0,), sol.dtype)
    dy_d = y_flat[jnp.asarray(s.ineq_idx)] if s.mi else jnp.zeros((0,), sol.dtype)
    return dx, ds, dy_c, dy_d


def expected_inertia(nlp: CanonicalNLP):
    ch: ChainInfo = nlp.chain
    s = nlp.struct
    n_dummy = s.me + 2 * ch.mk
    return s.n + s.mi + n_dummy, s.me + s.mi


def chain_diag_kind(nlp: CanonicalNLP):
    """(K+1, bs) int8 diagonal kinds for delta re-adds without reassembly:
    0 = x/s slot (+delta_x), 1 = y slot (-delta_c), 2 = dummy (+1, fixed)."""
    import numpy as np
    ch: ChainInfo = nlp.chain
    K, v, mk = ch.K, ch.v, ch.mk
    kind = np.full((K + 1, ch.bs), 2, np.int8)
    kind[:, :v] = 0
    eq = np.asarray(ch.eq_mask)                      # (K, mk) bool
    kind[:K, v:v + mk] = np.where(eq, 2, 0)          # s slots (eq rows dummy)
    kind[:K, v + mk:] = 1                            # y slots
    return kind


class ChainFactorResult(NamedTuple):
    fac: BCRFactor
    K: BTDMatrix             # assembled matrix (for refinement matvecs)
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def chained_factorize_kkt(nlp: CanonicalNLP, opts: Options, it: Iterate,
                          AB, Wblocks, mu, delta_w_last,
                          delta_cd_override=None) -> ChainFactorResult:
    """Inertia-corrected BTD factorization (same perturbation schedule as the
    dense path, PDPerturbationHandler).  ``delta_cd_override`` replaces the
    mu-based regularization value (CGPerturbationHandler)."""
    from jax import lax
    dtype = it.x.dtype
    exp_pos, exp_neg = expected_inertia(nlp)
    # Block elimination without pivoting requires every *diagonal block* to be
    # invertible, which — unlike for the full KKT — is not implied by a
    # full-rank Jacobian (a constraint row whose in-block entries vanish makes
    # the block singular while the couplings keep the full system fine).  The
    # structured backends therefore always run dual-regularized: delta_c is
    # floored at jacobian_regularization_value (the "perturb_always_cd"
    # regime), which keeps each block quasi-definite.
    base_cd = (delta_cd_override if delta_cd_override is not None
               else opts.jacobian_regularization_value
               * mu ** opts.jacobian_regularization_exponent)
    delta_cd = jnp.maximum(base_cd, opts.jacobian_regularization_value)

    if opts.chain_shard:
        # Explicit shard_map distribution of the chain axis (SPIKE/Schur
        # domain decomposition): assemble ONCE with zero deltas, then the
        # whole perturbation retry loop runs inside one shard_map with the
        # deltas re-added on the local diagonals (parallel/chain_shard.py).
        from ..parallel.chain_shard import dist_factorize_retry
        K0 = assemble_btd(nlp, it, AB, Wblocks, jnp.zeros((), dtype),
                          jnp.zeros((), dtype))
        kind = jnp.asarray(chain_diag_kind(nlp))
        fac, dxv, dcv, trials, ok, gave_up = dist_factorize_retry(
            btd_cast(K0, opts.factorization_dtype), kind, opts, delta_cd,
            delta_w_last, exp_pos, exp_neg)
        # K with the final deltas, for the refinement matvec
        eye_b = jnp.eye(K0.b, dtype=dtype)
        add = jnp.where(kind == 0, dxv,
                        jnp.where(kind == 1, -dcv, 0.0)).astype(dtype)
        Kb = BTDMatrix(diag=K0.diag + add[:, :, None] * eye_b[None],
                       sub=K0.sub)
        failed = jnp.logical_not(ok)
        new_last = jnp.where(dxv > 0, dxv, delta_w_last)
        return ChainFactorResult(fac=fac, K=Kb, delta_x=dxv, delta_c=dcv,
                                 delta_w_last=new_last, failed=failed,
                                 num_trials=trials)

    def factor(delta_x, delta_c):
        Kbtd = assemble_btd(nlp, it, AB, Wblocks, delta_x, delta_c)
        fac = bcr_factorize(btd_cast(Kbtd, opts.factorization_dtype),
                            pivot_tol=opts.ldlt_pivot_tol,
                            equilibrate=opts.linear_system_scaling == "mc19")
        ok = jnp.logical_and(
            jnp.logical_and(fac.num_pos == exp_pos, fac.num_neg == exp_neg),
            jnp.logical_not(fac.singular))
        return Kbtd, fac, ok

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
        # On repeated singularity escalate delta_c too (the block-elimination
        # analogue of MA27's pivot-tolerance IncreaseQuality escalation).
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
    return ChainFactorResult(fac=fac, K=Kb, delta_x=dxv, delta_c=dcv,
                             delta_w_last=new_last, failed=failed,
                             num_trials=trials)


def chained_solve_refined(Kbtd: BTDMatrix, fac: BCRFactor, rhs_flat,
                          opts: Options):
    """bcr solve + iterative refinement against the assembled BTD matrix.

    refinement_precision='double' (see step.solve_with_refinement): the
    solution accumulates and the BTD residual matvec runs in float64 while
    the BCR factorization stays in the model dtype — the TPU f32 path's
    route to ~1e-7 tolerances at residual-only f64 cost."""
    from jax import lax
    # output dtype follows the assembled system (rhs may be f64 under the
    # high-precision-residual mode); the factorization may be lower
    # precision still (factorization_dtype)
    from ..parallel.chain_shard import ChainShardFactor, dist_solve
    if isinstance(fac, ChainShardFactor):
        solve_fn = dist_solve
        fac_dt = fac.reduced.Ainv_root.dtype
    else:
        solve_fn = bcr_solve
        fac_dt = fac.Ainv_root.dtype
    model_dt = Kbtd.diag.dtype
    precise = opts.refinement_precision == "double"
    acc_dt = jnp.float64 if precise else model_dt

    sol = solve_fn(fac, rhs_flat.astype(fac_dt)).astype(acc_dt)
    rhs_a = rhs_flat.astype(acc_dt)
    if precise:
        K_a = BTDMatrix(diag=Kbtd.diag.astype(acc_dt),
                        sub=Kbtd.sub.astype(acc_dt))
    else:
        K_a = Kbtd
    rhs_norm = jnp.maximum(jnp.max(jnp.abs(rhs_a)),
                           jnp.asarray(1e-30, acc_dt))

    def ratio(s):
        return jnp.max(jnp.abs(rhs_a - K_a.matvec(s))) / rhs_norm

    def body(carry):
        i, sol, rr_prev = carry
        r = rhs_a - K_a.matvec(sol)
        sol = sol + solve_fn(fac, r.astype(fac_dt)).astype(acc_dt)
        return i + 1, sol, ratio(sol)

    def cond(carry):
        i, _, rr = carry
        return jnp.logical_or(
            i < opts.min_refinement_steps,
            jnp.logical_and(i < opts.max_refinement_steps,
                            rr > opts.residual_ratio_max))

    if opts.fast_step_computation:
        return sol.astype(model_dt), jnp.zeros((), model_dt)

    if opts.residual_improvement_factor < 1e19:
        def body_imp(carry):
            i, sol, rr_prev = carry
            i2, sol2, rr2 = body((i, sol, rr_prev))
            improved = rr2 <= opts.residual_improvement_factor * rr_prev
            keep = jnp.logical_or(improved, i < opts.min_refinement_steps)
            sol_out = jnp.where(keep, sol2, sol)
            rr_out = jnp.where(keep, rr2, rr_prev)
            i_out = jnp.where(keep, i2,
                              jnp.asarray(opts.max_refinement_steps,
                                          jnp.int32))
            return i_out, sol_out, rr_out

        _, sol, rr = lax.while_loop(
            cond, body_imp, (jnp.zeros((), jnp.int32), sol, ratio(sol)))
    else:
        _, sol, rr = lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), sol, ratio(sol)))
    return sol.astype(model_dt), rr.astype(model_dt)
