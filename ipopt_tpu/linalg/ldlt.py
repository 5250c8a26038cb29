"""Dense symmetric-indefinite LDL^T factorization with inertia, in pure JAX.

This is the TPU-native replacement for the reference's sparse symmetric solver
backends (MA27/MA57/MUMPS/Pardiso, ``src/Algorithm/LinearSolvers/``).  The
contract preserved from ``SparseSymLinearSolverInterface`` (hpp:30-118):
factorize -> report inertia (NumberOfNegEVals) -> solve, with return codes
SUCCESS / SINGULAR / WRONG_INERTIA handled by the caller's perturbation loop.

Design notes (TPU-first):
- **No numerical pivoting.**  Dynamic pivoting is hostile to static shapes and
  the MXU.  The primal-dual augmented system is quasi-definite once the
  (delta_x, delta_c) regularization of Ipopt's PDPerturbationHandler is active,
  and unpivoted LDL^T of a quasi-definite matrix is well defined (Vanderbei).
  Numerical trouble surfaces as tiny/zero pivots or wrong inertia, which feeds
  the same ``IncreaseQuality``/perturb-retry path the reference uses.
- Inertia comes free from sign(diag(D)).
- Two variants: a scan-based right-looking factorization (reference semantics,
  good for small n and for vmap-batched small NLPs) and a blocked version whose
  trailing updates are (k,128)x(128,k) matmuls that XLA tiles onto the MXU.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _subst_fwd(L, B):
    """Forward substitution: solve L Y = B (L unit lower, B (n, m))."""
    n = L.shape[0]
    idx = jnp.arange(n)

    def body(k, Y):
        yk = Y[k]
        mask = (idx > k)[:, None]
        return Y - jnp.where(mask, L[:, k][:, None] * yk[None, :], 0.0)

    return lax.fori_loop(0, n, body, B)


def _subst_bwd(L, B):
    """Backward substitution: solve L^T X = B (L unit lower, B (n, m))."""
    n = L.shape[0]
    idx = jnp.arange(n)

    def body(i, X):
        k = n - 1 - i
        xk = X[k]
        mask = (idx < k)[:, None]
        return X - jnp.where(mask, L[k, :][:, None] * xk[None, :], 0.0)

    return lax.fori_loop(0, n, body, B)


def tri_solve_unit_lower(L, B, transpose: bool = False):
    """Solve L Y = B (or L^T Y = B) for unit-lower-triangular L.

    On TPU this is the native (XLA-expanded) TriangularSolve.  On CPU jax
    lowers TriangularSolve to a LAPACK ``lapack_*trsm_ffi`` custom call, and
    this image's XLA build intermittently drops the typed-FFI api_version on
    custom calls inside while-loop regions ("No registered implementation for
    untyped custom call to lapack_dtrsm_ffi for Host"), so the CPU path uses
    an explicit fori-loop substitution instead — same O(n^2 m) work.
    """
    if jax.default_backend() == "cpu":
        return _subst_bwd(L, B) if transpose else _subst_fwd(L, B)
    return lax.linalg.triangular_solve(L, B, left_side=True, lower=True,
                                       transpose_a=transpose,
                                       unit_diagonal=True)


def dense_solve(A, b):
    """Solve A x = b for a small symmetric matrix.

    TPU: jnp.linalg.solve (native LU).  CPU: our own unpivoted LDL^T with
    substitution solves, avoiding the LAPACK getrf/trsm custom calls entirely
    (see tri_solve_unit_lower for why)."""
    if jax.default_backend() != "cpu":
        return jnp.linalg.solve(A, b)
    fac = ldlt(A)
    return ldlt_solve(fac, b)


class LDLTResult(NamedTuple):
    L: jnp.ndarray        # unit lower triangular factor (strict lower + I)
    d: jnp.ndarray        # diagonal of D
    num_pos: jnp.ndarray  # inertia: positive eigenvalue count of D
    num_neg: jnp.ndarray  # inertia: negative eigenvalue count
    num_zero: jnp.ndarray  # pivots treated as zero -> singular
    singular: jnp.ndarray  # bool
    # Optional symmetric equilibration: the factorization is of (S K S) with
    # S = diag(row_scale); solves map b -> S ((SKS)^-1 (S b)).
    row_scale: jnp.ndarray = None


def _pivot_tols(d_abs_max, dtype, pivot_tol):
    eps = jnp.finfo(dtype).eps
    base = jnp.where(pivot_tol > 0, pivot_tol, eps)
    return base * jnp.maximum(d_abs_max, 1.0)


def ldlt(A: jnp.ndarray, pivot_tol: float = 0.0) -> LDLTResult:
    """Unpivoted right-looking LDL^T.  A must be symmetric (n, n).

    Sequential over columns (lax.fori_loop) with full-width rank-1 updates —
    the straightforward form; use ``ldlt_blocked`` for large n.
    """
    n = A.shape[0]
    dtype = A.dtype
    if n == 0:
        z = jnp.zeros((0,), dtype)
        zi = jnp.array(0, jnp.int32)
        return LDLTResult(jnp.zeros((0, 0), dtype), z, zi, zi, zi,
                          jnp.array(False), z)

    idx = jnp.arange(n)
    tiny = jnp.finfo(dtype).tiny

    def body(k, M):
        d = M[k, k]
        # Guard against exact zero to keep the arithmetic finite; a zero pivot
        # is reported through the inertia/singularity flags below.
        safe_d = jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
        below = idx > k
        a_col = jnp.where(below, M[:, k], jnp.zeros_like(M[:, k]))
        # Trailing submatrix update: A[i,j] -= a_i * a_j / d  for i,j > k.
        M = M - jnp.outer(a_col, a_col) / safe_d
        # Store the L column (A[:,k]/d) in the strict lower triangle.
        M = M.at[:, k].set(jnp.where(below, a_col / safe_d, M[:, k]))
        return M

    M = lax.fori_loop(0, n, body, A)
    d = jnp.diagonal(M)
    L = jnp.tril(M, -1) + jnp.eye(n, dtype=dtype)
    return _finish(L, d, dtype, pivot_tol)


def _finish(L, d, dtype, pivot_tol):
    zero_tol = _pivot_tols(jnp.max(jnp.abs(d)), dtype, pivot_tol)
    is_zero = jnp.abs(d) <= zero_tol
    num_zero = jnp.sum(is_zero).astype(jnp.int32)
    num_pos = jnp.sum(jnp.logical_and(~is_zero, d > 0)).astype(jnp.int32)
    num_neg = jnp.sum(jnp.logical_and(~is_zero, d < 0)).astype(jnp.int32)
    return LDLTResult(L, d, num_pos, num_neg, num_zero, num_zero > 0,
                      jnp.ones_like(d))


def ldlt_blocked(A: jnp.ndarray, block: int = 128, pivot_tol: float = 0.0) -> LDLTResult:
    """Blocked right-looking LDL^T: panel factorization via the scan kernel,
    trailing update via matmul (MXU-friendly).  n is padded to a multiple of
    ``block`` with identity so shapes stay static."""
    n = A.shape[0]
    dtype = A.dtype
    if n == 0 or n <= block:
        return ldlt(A, pivot_tol)

    nb = -(-n // block)
    npad = nb * block
    if npad != n:
        Ap = jnp.zeros((npad, npad), dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    else:
        Ap = A

    tiny = jnp.finfo(dtype).tiny

    def panel_factor(Akk):
        """Unblocked LDL^T of a (block, block) diagonal block."""
        bidx = jnp.arange(block)

        def body(k, M):
            dkk = M[k, k]
            safe_d = jnp.where(jnp.abs(dkk) > tiny, dkk,
                               jnp.where(dkk >= 0, tiny, -tiny))
            below = bidx > k
            a_col = jnp.where(below, M[:, k], jnp.zeros_like(M[:, k]))
            M = M - jnp.outer(a_col, a_col) / safe_d
            M = M.at[:, k].set(jnp.where(below, a_col / safe_d, M[:, k]))
            return M

        M = lax.fori_loop(0, block, body, Akk)
        dk = jnp.diagonal(M)
        Lk = jnp.tril(M, -1) + jnp.eye(block, dtype=dtype)
        return Lk, dk

    def step(carry, j):
        M = carry
        # Extract diagonal block j (dynamic slice with static size).
        r0 = j * block
        Akk = lax.dynamic_slice(M, (r0, r0), (block, block))
        Lkk, dk = panel_factor(Akk)
        # Panel below: B = A[j+1:, j_block] -> L_panel = B * Lkk^{-T} * D^{-1}
        B = lax.dynamic_slice(M, (0, r0), (npad, block))
        row_idx = jnp.arange(npad)
        below_mask = (row_idx >= r0 + block)[:, None]
        B = jnp.where(below_mask, B, 0.0)
        # Solve X Lkk^T = B  =>  Lkk X^T = B^T  =>  X = (Lkk^{-1} B^T)^T
        X = tri_solve_unit_lower(Lkk, B.T).T
        safe_dk = jnp.where(jnp.abs(dk) > tiny, dk, jnp.where(dk >= 0, tiny, -tiny))
        Lpan = X / safe_dk[None, :]
        # Trailing update: A -= Lpan * D * Lpan^T (only lower-right affects result,
        # but a full masked update keeps shapes static).
        M = M - (Lpan * dk[None, :]) @ Lpan.T * 1.0
        # Write back the factorized panel and diagonal block.
        Mpan = jnp.where(below_mask, Lpan, 0.0)
        M = lax.dynamic_update_slice(M, Lkk + jnp.diag(dk) - jnp.eye(block, dtype=dtype), (r0, r0))
        # Store panel into column block (strict below part).
        cur = lax.dynamic_slice(M, (0, r0), (npad, block))
        M = lax.dynamic_update_slice(M, jnp.where(below_mask, Mpan, cur), (0, r0))
        return M, None

    M, _ = lax.scan(step, Ap, jnp.arange(nb))
    d = jnp.diagonal(M)[:n]
    L = (jnp.tril(M, -1) + jnp.eye(npad, dtype=dtype))[:n, :n]
    return _finish(L, d, dtype, pivot_tol)


def ldlt_solve(fac: LDLTResult, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given (S A S) = L D L^T (S = equilibration, often I).
    b may be (n,) or (n, k)."""
    L, d = fac.L, fac.d
    n = L.shape[0]
    if n == 0:
        return b
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    if fac.row_scale is not None:
        B = B * fac.row_scale[:, None]
    y = tri_solve_unit_lower(L, B)
    tiny = jnp.finfo(L.dtype).tiny
    safe_d = jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    z = y / safe_d[:, None]
    x = tri_solve_unit_lower(L, z, transpose=True)
    if fac.row_scale is not None:
        x = x * fac.row_scale[:, None]
    return x[:, 0] if vec else x
