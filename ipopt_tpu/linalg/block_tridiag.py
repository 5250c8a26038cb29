"""Block-tridiagonal symmetric-indefinite factorization via block cyclic
reduction (BCR) — the TPU-native structured KKT backend for banded problems.

This replaces the multifrontal factorizations (MA27/MA57, SURVEY.md §2.3) for
NLPs whose augmented KKT matrix is banded after interleaving variables and
constraints in index order (chained problems: LuksanVlcek1-7, 1-D PDE control,
trajectory optimization / MPC).

Design (TPU-first):
- The matrix is block-tridiagonal (nb blocks of size b): diagonal blocks
  ``diag[i]`` and sub-diagonal couplings ``sub[i] = K(i+1, i)``.
- **Compacted block cyclic reduction**: each level eliminates the ODD-indexed
  blocks of the current (compacted) chain in parallel and keeps the even ones,
  halving the arrays by pure interleave slicing (``[1::2]`` / ``[0::2]``).
  Per-level work and storage shrink geometrically (total ~2 nb block
  factorizations across all levels); sequential depth is O(b log nb).
- Eliminated blocks are factorized AND explicitly inverted in one fused
  Pallas kernel (``pallas_block_ldlt_inv``) so every downstream operation —
  couplings, Schur updates, backsolves — is a batched MXU matmul.  (Batched
  triangular solves lower to sequential substitutions on TPU and dominated
  the earlier profile.)
- Odd-even elimination is a symmetric congruence, so by Sylvester's law the
  inertia of K is the sum of eliminated pivot-sign counts plus the root's —
  preserving the reference's factorize -> inertia -> perturb contract
  (IpSparseSymLinearSolverInterface::NumberOfNegEVals).
- Quasi-definiteness (+delta_x / -delta_c regularization) is closed under
  Schur complements, so the pivot-free elimination is well defined; trouble
  surfaces as zero/wrong-sign pivots and feeds the perturbation retry loop.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, List

import jax
import jax.numpy as jnp
from jax import lax


class BTDMatrix(NamedTuple):
    """Block-tridiagonal symmetric matrix.

    diag: (nb, b, b) symmetric diagonal blocks
    sub:  (nb, b, b); sub[i] = K(i+1, i) (sub[nb-1] ignored)
    """

    diag: jnp.ndarray
    sub: jnp.ndarray

    @property
    def nb(self):
        return self.diag.shape[0]

    @property
    def b(self):
        return self.diag.shape[1]

    def to_dense(self):
        nb, b = self.nb, self.b
        M = jnp.zeros((nb * b, nb * b), self.diag.dtype)
        for i in range(nb):
            M = M.at[i * b:(i + 1) * b, i * b:(i + 1) * b].set(self.diag[i])
            if i + 1 < nb:
                M = M.at[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b].set(self.sub[i])
                M = M.at[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b].set(self.sub[i].T)
        return M

    def matvec(self, x):
        nb, b = self.nb, self.b
        X = x.reshape(nb, b)
        out = jnp.einsum("nij,nj->ni", self.diag, X)
        out = out.at[1:].add(jnp.einsum("nij,nj->ni", self.sub[:-1], X[:-1]))
        out = out.at[:-1].add(jnp.einsum("nji,nj->ni", self.sub[:-1], X[1:]))
        return out.reshape(-1)


def _dense_ldlt_block(A):
    """Unpivoted dense LDL^T of one (b, b) block; returns (L strict+unit, d)."""
    b = A.shape[0]
    dtype = A.dtype
    idx = jnp.arange(b)
    tiny = jnp.finfo(dtype).tiny

    def body(k, M):
        dkk = M[k, k]
        safe_d = jnp.where(jnp.abs(dkk) > tiny, dkk,
                           jnp.where(dkk >= 0, tiny, -tiny))
        below = idx > k
        a_col = jnp.where(below, M[:, k], jnp.zeros_like(M[:, k]))
        M = M - jnp.outer(a_col, a_col) / safe_d
        M = M.at[:, k].set(jnp.where(below, a_col / safe_d, M[:, k]))
        return M

    M = lax.fori_loop(0, b, body, A)
    d = jnp.diagonal(M)
    L = jnp.tril(M, -1) + jnp.eye(b, dtype=dtype)
    return L, d


def _block_solve(L, d, B):
    """(L D L^T)^{-1} B for one block; B is (b, k)."""
    from .ldlt import tri_solve_unit_lower
    tiny = jnp.finfo(L.dtype).tiny
    safe_d = jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    y = tri_solve_unit_lower(L, B)
    z = y / safe_d[:, None]
    return tri_solve_unit_lower(L, z, transpose=True)


_vsolve = jax.vmap(_block_solve)
_vfactor_jnp = jax.vmap(_dense_ldlt_block)


def _vfactor_pallas(A):
    from .pallas_ldlt import pallas_block_ldlt
    return pallas_block_ldlt(A)


def batched_block_ldlt(A, use_pallas: bool = False):
    """(nb, b, b) -> (L, d).  The Pallas kernel keeps each block VMEM-resident
    for the whole elimination (~170x the vmapped-jnp fallback on TPU, at the
    HBM roofline); the fallback serves CPU/interpret runs."""
    if use_pallas and jax.default_backend() == "tpu":
        return _vfactor_pallas(A)
    return _vfactor_jnp(A)


def _tri_unit_inv_logdepth(L):
    """Inverse of (batched) unit-lower-triangular L via the nilpotent product
    formula: with L = I + S (S strictly lower, nilpotent), inv(L) =
    sum_i (-S)^i = prod_k (I + T^(2^k)), T = -S — ceil(log2 b) batched
    matmuls.  On TPU this runs on the MXU; a batched triangular solve lowers
    to sequential substitutions and was the dominant cost of the r1 profile
    (45 ms/iter on LuksanVlcek1 n=4096)."""
    import numpy as _np
    b = L.shape[-1]
    eye = jnp.eye(b, dtype=L.dtype)
    T = eye - L      # = -S, strictly lower triangular
    acc = eye + T
    steps = max(int(_np.ceil(_np.log2(max(b, 2)))), 1)
    for _ in range(steps - 1):
        T = jnp.einsum("...ij,...jk->...ik", T, T)
        acc = jnp.einsum("...ij,...jk->...ik", acc, eye + T)
    return acc


def batched_block_ldlt_inv(A, use_pallas: bool = False):
    """(nb, b, b) -> (d, Ainv): pivots (for inertia) + explicit inverses.

    TPU path: Pallas factor kernel (VMEM-resident elimination) + log-depth
    matmul inversion of the unit-triangular factor (MXU), so no sequential
    triangular substitutions appear anywhere in the factorization.  CPU keeps
    the substitution solve (also avoids this image's lapack-FFI bug, see
    ldlt.tri_solve_unit_lower)."""
    if jax.default_backend() == "cpu":
        L, d = _vfactor_jnp(A)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        Ainv = _vsolve(L, d, eye)
        return d, Ainv
    if use_pallas:
        L, d = _vfactor_pallas(A)
    else:
        L, d = _vfactor_jnp(A)
    b = A.shape[-1]
    if b <= 64:
        # small blocks: MXU log-depth inversion + one Newton step to recover
        # the f32 bits the Neumann product loses
        Li = _tri_unit_inv_logdepth(L)
        tiny = jnp.finfo(A.dtype).tiny
        safe_d = jnp.where(jnp.abs(d) > tiny, d,
                           jnp.where(d >= 0, tiny, -tiny))
        # A^{-1} = L^{-T} D^{-1} L^{-1}
        Ainv = jnp.einsum("...ki,...kj->...ij", Li, Li / safe_d[..., None])
        eye = jnp.eye(b, dtype=A.dtype)
        Ainv = jnp.einsum("...ij,...jk->...ik", Ainv,
                          2.0 * eye - jnp.einsum("...ij,...jk->...ik",
                                                 A, Ainv))
    else:
        # large blocks: the triangular condition makes the Neumann product
        # too lossy in f32 (LuksanVlcek1 b=156 diverged into restoration);
        # use the native TriangularSolve (no lapack custom call on TPU)
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), A.shape)
        Ainv = _vsolve(L, d, eye)
    return d, Ainv


class BCRLevel(NamedTuple):
    """Per-level elimination data over the level's *eliminated* blocks only
    (ne_l blocks; sizes halve per level).

    LANE-MINOR layout: the block-chain axis is LAST so every block operation
    vectorizes over the TPU's 128-wide lanes; the tiny static b-dims unroll
    into fused VPU expressions.  (Batched (ne, b, b) micro-matmuls/pallas
    grids execute near-serially on TPU — measured ~200 ms per factorize at
    nb=12500, b=16 vs a ~1 ms HBM roofline.)"""

    ds: jnp.ndarray     # (b, ne) pivots
    Ainv: jnp.ndarray   # (b, b, ne)
    Gl: jnp.ndarray     # (b, b, ne): Ainv @ K(elim_t, keep_t)
    Gr: jnp.ndarray     # (b, b, ne): Ainv @ K(keep_{t+1}, elim_t)^T
    has_right: jnp.ndarray  # (ne,) bool: keep_{t+1} exists (not padding)


# --- lane-minor block primitives (all shapes (b, b, n) / (b, n)) -----------

def _mm_ll(A, B):
    """out[i,k,n] = sum_j A[i,j,n] B[j,k,n] — unrolled over the static b so
    XLA fuses it into one VPU kernel (no dot_general batched micro-matmul)."""
    b = A.shape[0]
    out = A[:, 0:1, :] * B[0:1, :, :]
    for j in range(1, b):
        out = out + A[:, j:j + 1, :] * B[j:j + 1, :, :]
    return out


def _mmT_ll(A, B):
    """out[i,k,n] = sum_j A[i,j,n] B[k,j,n]  (A @ B^T per block)."""
    b = A.shape[0]
    out = A[:, 0:1, :] * B[:, 0:1, :].swapaxes(0, 1)
    for j in range(1, b):
        out = out + A[:, j:j + 1, :] * B[:, j:j + 1, :].swapaxes(0, 1)
    return out


def _tmm_ll(A, B):
    """out[i,k,n] = sum_j A[j,i,n] B[j,k,n]  (A^T @ B per block)."""
    b = A.shape[0]
    out = A[0:1, :, :].swapaxes(0, 1) * B[0:1, :, :]
    for j in range(1, b):
        out = out + A[j:j + 1, :, :].swapaxes(0, 1) * B[j:j + 1, :, :]
    return out


def _mv_ll(A, x):
    """out[i,n] = sum_j A[i,j,n] x[j,n]."""
    return jnp.sum(A * x[None, :, :], axis=1)


def _mvT_ll(A, x):
    """out[j,n] = sum_i A[i,j,n] x[i,n]."""
    return jnp.sum(A * x[:, None, :], axis=0)


def _gj_inv_lanes(D):
    """Unpivoted Gauss-Jordan inverse + pivot sequence of many blocks at
    once: D (b, b, n) -> (Dinv (b, b, n), piv (b, n)).

    The unpivoted GJ pivot at step k equals the k-th LDL^T pivot (both are
    ratios of leading principal minors), so one sweep yields the explicit
    inverse AND the inertia information.  Quasi-definiteness under the
    (delta_x, delta_c) regularization keeps the sweep well defined; trouble
    surfaces as zero/wrong-sign pivots for the retry loop."""
    b, _, n = D.shape
    dtype = D.dtype
    tiny = jnp.finfo(dtype).tiny
    rows = lax.broadcasted_iota(jnp.int32, (b, b, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)

    def body(k, carry):
        X, piv = carry
        pk = lax.dynamic_slice(X, (k, k, 0), (1, 1, n))          # (1, 1, n)
        safe_p = jnp.where(jnp.abs(pk) > tiny, pk,
                           jnp.where(pk >= 0, tiny, -tiny))
        col = lax.dynamic_slice(X, (0, k, 0), (b, 1, n))         # (b, 1, n)
        row = lax.dynamic_slice(X, (k, 0, 0), (1, b, n))         # (1, b, n)
        is_kr = rows == k
        is_kc = cols == k
        other = jnp.logical_and(~is_kr, ~is_kc)
        Xn = jnp.where(other, X - col * row / safe_p, X)
        Xn = jnp.where(jnp.logical_and(is_kr, ~is_kc),
                       jnp.broadcast_to(-row / safe_p, X.shape), Xn)
        Xn = jnp.where(jnp.logical_and(is_kc, ~is_kr),
                       jnp.broadcast_to(col / safe_p, X.shape), Xn)
        Xn = jnp.where(jnp.logical_and(is_kr, is_kc),
                       jnp.broadcast_to(1.0 / safe_p, X.shape), Xn)
        piv = lax.dynamic_update_slice(piv, pk[0], (k, 0))
        return Xn, piv

    # (python-unrolling the b<=32 sweep was measured at parity-or-worse on
    # the v5e — the per-iteration fori overhead is not the factorize
    # bottleneck; see BASELINE.md r5)
    X, piv = lax.fori_loop(0, b, body, (D, jnp.zeros((b, n), dtype)))
    return X, piv


def _mm_bn(A, B):
    """(p, q, n) @ (q, r, n) -> (p, r, n): batched matmul with the batch on
    the minor (lane) axis.

    Precision.HIGHEST is load-bearing: the TPU default runs f32 matmuls as
    single-pass bf16 multiplies (~8 mantissa bits) — inside a Gauss-Jordan
    elimination that destroys the factorization (chained f32 solved on CPU
    but diverged on TPU with the default)."""
    return lax.dot_general(A, B, (((1,), (0,)), ((2,), (2,))),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=A.dtype
                           ).transpose(1, 2, 0)


def _gj_inv_lanes_blocked(D, panel: int = 32):
    """Blocked (panelized) Gauss-Jordan inverse + pivots: same contract as
    ``_gj_inv_lanes`` but with b/panel MXU panel steps instead of b scalar
    rank-1 steps.

    One panel exchange step (the rank-t analog of the scalar step):
        P    <- X[p:p+t, p:p+t];  Pinv, d = scalar GJ of the t x t panel
        X_oo <- X_oo - C_o Pinv R_o
        X_oP <- + C_o Pinv          (column block, sign as in the scalar step)
        X_Po <- - Pinv R_o          (row block)
        X_PP <- Pinv
    where o = the not-yet/already-eliminated indices outside the panel.
    The panel's scalar-GJ pivots are the global unpivoted-LDL^T pivots of
    those rows (ratios of leading principal minors), so the inertia
    information is identical to the scalar sweep.  At b = 408 this turns
    408 latency-bound vector steps into 13 panel steps of (b, t)x(t, b)
    MXU matmuls per chain block."""
    b, _, n = D.shape
    dtype = D.dtype
    X = D
    piv = jnp.zeros((b, n), dtype)
    rows = lax.broadcasted_iota(jnp.int32, (b, b, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)
    for p0 in range(0, b, panel):
        t = min(panel, b - p0)
        P = lax.slice(X, (p0, p0, 0), (p0 + t, p0 + t, n))
        Pinv, d_t = _gj_inv_lanes(P)
        Crows = lax.slice(X, (0, p0, 0), (b, p0 + t, n))      # (b, t, n)
        Rcols = lax.slice(X, (p0, 0, 0), (p0 + t, b, n))      # (t, b, n)
        CPinv = _mm_bn(Crows, Pinv)                           # (b, t, n)
        PinvR = _mm_bn(Pinv, Rcols)                           # (t, b, n)
        upd = _mm_bn(CPinv, Rcols)                            # (b, b, n)
        in_r = jnp.logical_and(rows >= p0, rows < p0 + t)
        in_c = jnp.logical_and(cols >= p0, cols < p0 + t)
        other = jnp.logical_and(~in_r, ~in_c)
        Xn = jnp.where(other, X - upd, X)
        # column block (rows outside, cols in panel): + C_o Pinv
        col_blk = jnp.zeros_like(X)
        col_blk = lax.dynamic_update_slice(col_blk, CPinv, (0, p0, 0))
        Xn = jnp.where(jnp.logical_and(~in_r, in_c), col_blk, Xn)
        # row block (rows in panel, cols outside): - Pinv R_o
        row_blk = jnp.zeros_like(X)
        row_blk = lax.dynamic_update_slice(row_blk, -PinvR, (p0, 0, 0))
        Xn = jnp.where(jnp.logical_and(in_r, ~in_c), row_blk, Xn)
        # panel block: Pinv
        pp_blk = jnp.zeros_like(X)
        pp_blk = lax.dynamic_update_slice(pp_blk, Pinv, (p0, p0, 0))
        Xn = jnp.where(jnp.logical_and(in_r, in_c), pp_blk, Xn)
        X = Xn
        piv = lax.dynamic_update_slice(piv, d_t, (p0, 0))
    return X, piv


# Scalar GJ below this block size (one panel anyway); blocked above.
_GJ_PANEL_THRESHOLD = 32

# Stop the cyclic reduction once the compacted chain fits in this many
# scalar unknowns and finish with ONE dense blocked-GJ root.  MEASURED OFF
# (0 = classic single-block root): on the v5e the panelized dense root was
# NET SLOWER than the tail levels it replaced (1e5: 135 -> 143 ms/iter,
# 1e6: 1286 -> 1677 — 32 sequential panels of MXU-underutilized (N, 32)
# matmuls vs ~7 geometric levels), and the explicit f32 inverse of a
# ~1000-wide unequilibrated KKT root lost the chained solve entirely
# (status 10).  The machinery + exactness tests stay for future use.
_ROOT_DENSE_N = 0


def _gj_inv_auto(D):
    b = D.shape[0]
    if b <= _GJ_PANEL_THRESHOLD:
        return _gj_inv_lanes(D)
    return _gj_inv_lanes_blocked(D)


class BCRFactor(NamedTuple):
    levels: Tuple       # tuple of BCRLevel (static length)
    Ainv_root: jnp.ndarray
    d_root: jnp.ndarray
    nb: int             # static (pytree aux, not a leaf)
    b: int              # static
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray
    num_zero: jnp.ndarray
    singular: jnp.ndarray
    # Symmetric Ruiz equilibration (MC19 analog): the factorization is of
    # D K D with D = diag(row_scale); inertia is congruence-invariant and
    # bcr_solve unscales transparently.  Always an array ((nb, b) of ones
    # when equilibration is off) so the retry-loop carry pytree is stable.
    row_scale: jnp.ndarray = None


def _bcr_flatten(f: BCRFactor):
    children = (f.levels, f.Ainv_root, f.d_root, f.num_pos, f.num_neg,
                f.num_zero, f.singular, f.row_scale)
    return children, (f.nb, f.b)


def _bcr_unflatten(aux, children):
    nb, b = aux
    (levels, Ainv_root, d_root, num_pos, num_neg, num_zero, singular,
     row_scale) = children
    return BCRFactor(levels=levels, Ainv_root=Ainv_root, d_root=d_root,
                     nb=nb, b=b, num_pos=num_pos, num_neg=num_neg,
                     num_zero=num_zero, singular=singular,
                     row_scale=row_scale)


jax.tree_util.register_pytree_node(BCRFactor, _bcr_flatten, _bcr_unflatten)


def _block_inertia_counts(ds_blocks, pivot_tol, block_axis=-1):
    """(pos, neg, zero) pivot counts for a pivot array whose ``block_axis``
    runs over the b pivots of one block (the other axis over blocks)."""
    dtype = ds_blocks.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(ds_blocks), axis=block_axis,
                                keepdims=True), 1.0)
    base = pivot_tol if pivot_tol > 0 else jnp.finfo(dtype).eps
    is_zero = jnp.abs(ds_blocks) <= base * scale
    pos = jnp.sum(jnp.logical_and(~is_zero, ds_blocks > 0)).astype(jnp.int32)
    neg = jnp.sum(jnp.logical_and(~is_zero, ds_blocks < 0)).astype(jnp.int32)
    zer = jnp.sum(is_zero).astype(jnp.int32)
    # NaN/Inf pivots fail every comparison above and would otherwise be
    # INVISIBLE to the counts — the retry loop would then never see
    # `singular` and never escalate delta_c.  Count them as zeros.
    missing = jnp.asarray(ds_blocks.size, jnp.int32) - (pos + neg + zer)
    return pos, neg, zer + missing


def btd_ruiz_scale(K: BTDMatrix, sweeps: int = 2):
    """Symmetric Ruiz equilibration scale D (nb, b) for a BTD matrix — the
    MC19 analog (Mc19TSymScalingMethod,
    src/Algorithm/LinearSolvers/IpMc19TSymScalingMethod.cpp) over the block
    structure.  In f32 the raw KKT mixes O(1) Hessian entries with O(1/mu)
    barrier Sigmas in one block; unequilibrated elimination loses the small
    pivots to roundoff and reports wrong inertia/singularity, driving the
    perturbation loop to needless delta escalation."""
    nb, b = K.nb, K.b
    dtype = K.diag.dtype
    d = jnp.ones((nb, b), dtype)
    ones_row = jnp.ones((1, b), dtype)
    for _ in range(sweeps):
        dn = jnp.concatenate([d[1:], ones_row], axis=0)  # d of block i+1
        diag_s = jnp.abs(K.diag) * d[:, :, None] * d[:, None, :]
        sub_s = jnp.abs(K.sub) * dn[:, :, None] * d[:, None, :]
        rn = jnp.max(diag_s, axis=2)                       # within-block rows
        # rows of block i+1 see sub[i][r, :]; rows of block i see sub[i][:, r]
        rn = rn.at[1:].max(jnp.max(sub_s[:-1], axis=2))
        rn = rn.at[:-1].max(jnp.max(sub_s[:-1], axis=1))
        d = d / jnp.sqrt(jnp.maximum(rn, jnp.finfo(dtype).tiny))
    return jnp.clip(d, 1e-8, 1e8)


def btd_apply_scale(K: BTDMatrix, d) -> BTDMatrix:
    """D K D over the block-tridiagonal structure."""
    ones_row = jnp.ones((1, K.b), K.diag.dtype)
    dn = jnp.concatenate([d[1:], ones_row], axis=0)
    return BTDMatrix(diag=K.diag * d[:, :, None] * d[:, None, :],
                     sub=K.sub * dn[:, :, None] * d[:, None, :])


def btd_cast(K: BTDMatrix, dtype_str: str) -> BTDMatrix:
    """Cast the BTD blocks for a lower-precision factorization
    (factorization_dtype); the caller keeps the full-precision K for
    iterative refinement."""
    if not dtype_str:
        return K
    dt = jnp.dtype(dtype_str)
    return BTDMatrix(diag=K.diag.astype(dt), sub=K.sub.astype(dt))


def bcr_factorize(K: BTDMatrix, pivot_tol: float = 0.0,
                  equilibrate: bool = False) -> BCRFactor:
    nb, b = K.nb, K.b
    dtype = K.diag.dtype

    if equilibrate:
        row_scale = btd_ruiz_scale(K)
        K = btd_apply_scale(K, row_scale)
    else:
        row_scale = jnp.ones((nb, b), dtype)

    # Lane-minor layout for ALL the level math: chain axis last.
    diag = jnp.transpose(K.diag, (1, 2, 0))   # (b, b, nb)
    C = jnp.transpose(K.sub, (1, 2, 0))       # C[..., j] couples j+1 to j
    na = nb
    eye_l = jnp.eye(b, dtype=dtype)[:, :, None]

    levels: List[BCRLevel] = []
    num_pos = jnp.zeros((), jnp.int32)
    num_neg = jnp.zeros((), jnp.int32)
    num_zero = jnp.zeros((), jnp.int32)
    n_pad_blocks = 0

    root_nb = max(1, _ROOT_DENSE_N // b)
    while na > root_nb:
        if na % 2 == 1:
            # pad with an identity block (eliminated at this level, harmless;
            # its +b positive pivots are subtracted from the inertia below)
            diag = jnp.concatenate([diag, eye_l], axis=2)
            C = jnp.concatenate([C, jnp.zeros((b, b, 1), dtype)], axis=2)
            na += 1
            n_pad_blocks += 1

        diag_e = diag[:, :, 1::2]    # eliminated (b, b, ne)
        diag_k = diag[:, :, 0::2]    # kept
        Ca = C[:, :, 0::2]           # K(elim_t, keep_t)
        Ci = C[:, :, 1::2]           # K(keep_{t+1}, elim_t); last may be pad
        ne = diag_e.shape[2]

        Ainv, ds = _gj_inv_auto(diag_e)
        p, n_, z = _block_inertia_counts(ds, pivot_tol, block_axis=0)
        num_pos += p
        num_neg += n_
        num_zero += z

        Gl = _mm_ll(Ainv, Ca)        # Ainv Ca
        Gr = _mmT_ll(Ainv, Ci)       # Ainv Ci^T
        has_right = jnp.arange(ne) < (ne - 1) if na // 2 == ne else \
            jnp.ones((ne,), bool)
        # keep_t receives from its right eliminated neighbor elim_t:
        #   diag_k[t] -= Ca_t^T (Ainv Ca)_t
        updA = _tmm_ll(Ca, Gl)
        # keep_{t+1} receives from its left eliminated neighbor elim_t:
        #   diag_k[t+1] -= Ci_t (Ainv Ci^T)_t
        updC = _mm_ll(Ci, Gr)
        nk = diag_k.shape[2]
        diag_k = diag_k - updA
        diag_k = diag_k.at[:, :, 1:].add(-updC[:, :, : nk - 1])
        # new coupling: K(keep_{t+1}, keep_t) = -Ci_t (Ainv Ca)_t
        C_new = -_mm_ll(Ci, Gl)

        levels.append(BCRLevel(ds=ds, Ainv=Ainv, Gl=Gl, Gr=Gr,
                               has_right=has_right))
        diag = diag_k
        C = C_new[:, :, :nk]
        na = nk

    if na > 1:
        # Dense root: assemble the remaining (na, b) BTD chain as one
        # (na*b)^2 block and invert it with the panelized GJ — the pivots
        # are the root's unpivoted-LDL^T pivots, so Sylvester additivity
        # of the inertia counts is unchanged.
        N = na * b
        Kd = jnp.zeros((N, N, 1), dtype)
        for j in range(na):
            Kd = lax.dynamic_update_slice(
                Kd, diag[:, :, j:j + 1], (j * b, j * b, 0))
            if j + 1 < na:
                cj = C[:, :, j:j + 1]
                Kd = lax.dynamic_update_slice(Kd, cj, ((j + 1) * b, j * b, 0))
                Kd = lax.dynamic_update_slice(
                    Kd, jnp.transpose(cj, (1, 0, 2)), (j * b, (j + 1) * b, 0))
        Ainv_root, d_root = _gj_inv_auto(Kd)
    else:
        Ainv_root, d_root = _gj_inv_auto(diag)   # ne = 1
    p, n_, z = _block_inertia_counts(d_root, pivot_tol, block_axis=0)
    num_pos += p
    num_neg += n_
    num_zero += z
    # padded identity blocks contributed exactly +b positives each
    num_pos = num_pos - n_pad_blocks * b

    return BCRFactor(levels=tuple(levels), Ainv_root=Ainv_root, d_root=d_root,
                     nb=nb, b=b, num_pos=num_pos, num_neg=num_neg,
                     num_zero=num_zero, singular=num_zero > 0,
                     row_scale=row_scale)


def bcr_solve(fac: BCRFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = rhs with the compacted BCR factorization (lane-minor).

    If the factorization is equilibrated ((D K D) = factored form), the rhs
    is scaled in and the solution scaled out: x = D (DKD)^{-1} (D rhs)."""
    nb, b = fac.nb, fac.b
    dtype = rhs.dtype
    Rb = rhs.reshape(nb, b)
    if fac.row_scale is not None:
        Rb = Rb * fac.row_scale
    R = Rb.T                                    # (b, nb) lane-minor

    # Forward: eliminate odd positions level by level, remembering (R_e, the
    # pre-pad chain length) for the backward pass.
    stack = []
    for lvl in fac.levels:
        prepad = R.shape[1]
        if prepad % 2 == 1:
            R = jnp.concatenate([R, jnp.zeros((b, 1), dtype)], axis=1)
        R_e = R[:, 1::2]
        R_k = R[:, 0::2]
        # r_keep_t    -= K(keep_t, elim_t) Ainv r_e = Gl^T r_e
        # r_keep_{t+1}-= K(keep_{t+1}, elim_t) Ainv r_e = Gr^T r_e
        R_k = R_k - _mvT_ll(lvl.Gl, R_e)
        updR = _mvT_ll(lvl.Gr, R_e)
        R_k = R_k.at[:, 1:].add(-updR[:, : R_k.shape[1] - 1])
        stack.append((R_e, prepad))
        R = R_k

    # Root solve (dense multi-block root when the reduction stopped early).
    na_root = R.shape[1]
    if na_root > 1:
        v = R.T.reshape(-1, 1)                  # (na*b, 1) chain-major
        Xr = _mv_ll(fac.Ainv_root, v)           # (na*b, 1)
        X = Xr.reshape(na_root, b).T            # (b, na_root)
    else:
        X = _mv_ll(fac.Ainv_root, R)            # (b, 1)

    # Backward: reconstruct eliminated entries, interleave, unpad.
    for lvl, (R_e, prepad) in zip(reversed(fac.levels), reversed(stack)):
        ne = R_e.shape[1]
        nk = X.shape[1]
        x_keep = X
        # x_e = Ainv r_e - Gl x_keep_t - Gr x_keep_{t+1}
        x_e = _mv_ll(lvl.Ainv, R_e)
        x_e = x_e - _mv_ll(lvl.Gl, x_keep[:, :ne])
        # right keep neighbor (t+1); absent for the last eliminated block
        nbr = jnp.zeros((b, ne), dtype)
        take = min(ne, nk - 1)
        if take > 0:
            nbr = nbr.at[:, :take].set(x_keep[:, 1:1 + take])
        x_e = x_e - _mv_ll(lvl.Gr, nbr)
        # interleave keep/elim back into the (padded) chain, then unpad
        total = nk + ne
        Xn = jnp.zeros((b, total), dtype)
        Xn = Xn.at[:, 0::2].set(x_keep)
        Xn = Xn.at[:, 1::2].set(x_e)
        X = Xn[:, :prepad]

    Xb = X.T                                    # (nb, b)
    if fac.row_scale is not None:
        Xb = Xb * fac.row_scale
    return Xb.reshape(-1)
