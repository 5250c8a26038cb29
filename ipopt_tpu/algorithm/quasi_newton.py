"""Limited-memory quasi-Newton (L-BFGS / SR1) Hessian approximation.

Reference parity: ``LimMemQuasiNewtonUpdater``
(``src/Algorithm/IpLimMemQuasiNewtonUpdater.hpp:81-310``):
- pairs s_k = x_{k+1} - x_k,  y_k = grad_x L(x_{k+1}, lambda_{k+1})
  - grad_x L(x_k, lambda_{k+1})  (same multipliers, no bound-multiplier terms),
- Powell damping / update skipping (CheckSkippingBFGS),
- sigma (initial diagonal) strategies scalar1..4 / constant,
- compact representation  B = sigma I - [sigma S, Y] M^{-1} [sigma S, Y]^T,
  M = [[sigma S^T S, L], [L^T, -D]], D = diag(s_i^T y_i), L strictly lower
  s_i^T y_j (i > j).

TPU-native design: fixed-size ring buffers (n, hist) in the solver carry; the
dense W is materialized for the dense KKT path (the low-rank Sherman-Morrison
augmented solver of ``IpLowRankAugSystemSolver`` arrives with the structured
KKT backend).  All ops are masked for partially-filled history, so the whole
thing vmaps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    S: jnp.ndarray        # (n, hist) step history (ring buffer)
    Y: jnp.ndarray        # (n, hist) gradient-difference history
    count: jnp.ndarray    # int32 number of valid pairs (<= hist)
    head: jnp.ndarray     # int32 ring position of next write
    sigma: jnp.ndarray    # current initial-diagonal scale
    skips: jnp.ndarray    # consecutive skipped updates


def lbfgs_init(n: int, hist: int, dtype, init_val=1.0) -> LBFGSState:
    return LBFGSState(
        S=jnp.zeros((n, hist), dtype), Y=jnp.zeros((n, hist), dtype),
        count=jnp.zeros((), jnp.int32), head=jnp.zeros((), jnp.int32),
        sigma=jnp.asarray(init_val, dtype), skips=jnp.zeros((), jnp.int32))


def lbfgs_update(st: LBFGSState, s, y, opts) -> LBFGSState:
    """Insert a new pair with Ipopt's skipping rule.

    BFGS: skip when s^T y <= 0 relative to ||s|| ||y|| (curvature condition
    fails; limited_memory_max_skipping consecutive skips reset the history).
    SR1 (limited_memory_update_type=sr1): no curvature requirement — only a
    degenerate |s^T y| is skipped (the compact middle matrix would get a
    near-zero diagonal entry).

    sigma (the B0 diagonal) follows limited_memory_initialization
    (IpLimMemQuasiNewtonUpdater.cpp:46-54): scalar1 = s'y/s's, scalar2 =
    y'y/s'y, scalar3 = arithmetic and scalar4 = geometric average of the
    two, constant = limited_memory_init_val; clipped to
    [limited_memory_init_val_min, limited_memory_init_val_max] (:426-428).
    """
    sty = jnp.dot(s, y)
    s_norm = jnp.sqrt(jnp.dot(s, s))
    y_norm = jnp.sqrt(jnp.dot(y, y))
    eps = jnp.finfo(s.dtype).eps
    sr1 = opts.limited_memory_update_type == "sr1"
    if sr1:
        skip = jnp.abs(sty) <= jnp.sqrt(eps) * s_norm * y_norm
    else:
        skip = sty <= jnp.sqrt(eps) * s_norm * y_norm

    hist = st.S.shape[1]
    # Store the pair normalized by 1/||s||: B is invariant under per-pair
    # column scaling (U columns scale by c_i while M scales congruently by
    # diag(c) M diag(c)), and the normalization keeps the compact middle
    # matrix M well-scaled for the low-rank solver's inertia tests.
    inv_sn = jnp.where(s_norm > 0, 1.0 / jnp.maximum(s_norm, 1e-300), 1.0)
    S_new = st.S.at[:, st.head].set(s * inv_sn)
    Y_new = st.Y.at[:, st.head].set(y * inv_sn)
    strat = opts.limited_memory_initialization
    s1 = sty / jnp.maximum(jnp.dot(s, s), 1e-300)
    s2 = jnp.dot(y, y) / jnp.where(jnp.abs(sty) > 0, sty, 1e-300)
    if sr1:
        # the SR1 B0 must stay positive even for negative curvature pairs
        # ("take the abs value", IpLimMemQuasiNewtonUpdater.cpp:544-546)
        s1, s2 = jnp.abs(s1), jnp.abs(s2)
    if strat == "constant":
        sigma_raw = jnp.asarray(opts.limited_memory_init_val, s.dtype)
    elif strat == "scalar2":
        sigma_raw = s2
    elif strat == "scalar3":
        sigma_raw = 0.5 * (s1 + s2)
    elif strat == "scalar4":
        sigma_raw = jnp.sqrt(jnp.maximum(s1 * s2, 0.0))
    else:  # "scalar1" (default)
        sigma_raw = s1
    sigma_raw = jnp.where(s_norm > 0, sigma_raw, st.sigma)
    sigma_new = jnp.clip(sigma_raw, opts.limited_memory_init_val_min,
                         opts.limited_memory_init_val_max)

    skips_new = jnp.where(skip, st.skips + 1, 0)
    reset = skips_new >= opts.limited_memory_max_skipping

    def pick(a, b):
        return jnp.where(skip, a, b)

    out = LBFGSState(
        S=pick(st.S, S_new), Y=pick(st.Y, Y_new),
        count=pick(st.count, jnp.minimum(st.count + 1, hist)),
        head=pick(st.head, (st.head + 1) % hist),
        sigma=pick(st.sigma, sigma_new),
        skips=skips_new)
    # Full reset after too many skips (LimMemQuasiNewtonUpdater resets B).
    return jax.tree.map(
        lambda r, o: jnp.where(reset, r, o),
        lbfgs_init(st.S.shape[0], hist, st.S.dtype), out)._replace(
            sigma=jnp.where(reset, st.sigma, out.sigma))


class LowRankW(NamedTuple):
    """Compact (diagonal + low-rank) representation of the L-BFGS Hessian

        B = sigma I - U M^{-1} U^T,   U = [sigma S, Y]  (n, 2k)

    consumed by the Sherman-Morrison augmented-system solver
    (``LowRankAugSystemSolver``, src/Algorithm/IpLowRankAugSystemSolver.cpp),
    mirroring ``LowRankUpdateSymMatrix`` (src/LinAlg/IpLowRankUpdateSymMatrix.hpp).
    Invalid history slots are masked: U columns zeroed, M identity there, so
    the padding contributes equal (+1, 0) inertia to M and to the SMW matrix
    C = M - U^T K0^{-1} U, keeping the inertia test exact.
    """
    sigma: jnp.ndarray   # scalar initial-diagonal scale
    U: jnp.ndarray       # (n, 2k) masked low-rank factor
    M: jnp.ndarray       # (2k, 2k) masked middle matrix


def lbfgs_compact(st: LBFGSState, opts=None) -> LowRankW:
    """Compact-form pieces (sigma, U, M) with ring-buffer masking.

    BFGS (Byrd-Nocedal-Schnabel):
        B = sigma I - U M^{-1} U^T,  U = [sigma S, Y],
        M = [[sigma S'S, L], [L', -D]].
    SR1 (limited_memory_update_type=sr1, IpLimMemQuasiNewtonUpdater.cpp:523-
    660 — the eigen-split there is a LowRankUpdateSymMatrix storage detail):
        B = sigma I + V Z^{-1} V',  V = Y - sigma S,
        Z = D + L + L' - sigma S'S  ==  B = sigma I - V (-Z)^{-1} V'.
    """
    n, hist = st.S.shape
    dtype = st.S.dtype
    sr1 = opts is not None and opts.limited_memory_update_type == "sr1"
    idx = jnp.arange(hist)
    # A slot is valid if it was written within the last `count` writes:
    # positions head-count .. head-1 (mod hist); offset orders chronologically.
    offset = (idx - (st.head - st.count)) % hist
    valid = offset < st.count

    S = jnp.where(valid[None, :], st.S, 0.0)
    Y = jnp.where(valid[None, :], st.Y, 0.0)
    sig = st.sigma

    StS = S.T @ S
    StY = S.T @ Y
    D = jnp.diagonal(StY)
    # L: s_i^T y_j for i > j in *chronological* order.  With the ring mask we
    # need chronological comparison: slot i older than slot j <=> offset_i <
    # offset_j.
    older = offset[:, None] > offset[None, :]
    L = jnp.where(older, StY, 0.0)

    if sr1:
        Z = jnp.diag(D) + L + L.T - sig * StS
        # tiny symmetric regularization keeps -Z factorizable when a pair
        # makes Z nearly singular (the reference skips such updates via its
        # eigenvalue-split tolerance)
        M = -(Z) + jnp.sqrt(jnp.finfo(dtype).eps) * jnp.eye(hist, dtype=dtype)
        M = jnp.where(jnp.outer(valid, valid), M, jnp.eye(hist, dtype=dtype))
        U = jnp.where(valid[None, :], Y - sig * S, 0.0)
        return LowRankW(sigma=sig, U=U, M=M)

    M = jnp.block([[sig * StS, L], [L.T, -jnp.diag(D)]])
    vmask = jnp.concatenate([valid, valid])
    M = jnp.where(jnp.outer(vmask, vmask), M,
                  jnp.eye(2 * hist, dtype=dtype))
    U = jnp.concatenate([sig * S, Y], axis=1)
    return LowRankW(sigma=sig, U=U, M=M)


def lbfgs_dense_W(st: LBFGSState, opts=None, nl_mask=None) -> jnp.ndarray:
    """Materialize the dense B = sigma I - U M^{-1} U^T (compact form).

    ``nl_mask`` (hessian_approximation_space="nonlinear-variables" with
    num_linear_variables > 0, IpOrigIpoptNLP.cpp:124-130): restricts the
    approximation to the nonlinear block — sigma on the masked diagonal
    only (the s/y pairs are already masked at the update site, so the
    low-rank term has zero rows/columns for linear variables)."""
    n = st.S.shape[0]
    lr = lbfgs_compact(st, opts)
    # M is symmetric INDEFINITE ([[sigma S'S, L], [L', -D]]) and its leading
    # block is exactly singular for collinear pairs (e.g. any 1-D problem):
    # unpivoted LDL^T breaks down there, so use pivoted LU.
    Minv_Ut = jnp.linalg.solve(lr.M, lr.U.T)
    diag = (lr.sigma * jnp.eye(n, dtype=st.S.dtype) if nl_mask is None
            else lr.sigma * jnp.diag(nl_mask.astype(st.S.dtype)))
    return diag - lr.U @ Minv_Ut
