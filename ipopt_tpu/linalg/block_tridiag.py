"""Block-tridiagonal symmetric-indefinite factorization via block cyclic
reduction (BCR) — the TPU-native structured KKT backend for banded problems.

This replaces the multifrontal factorizations (MA27/MA57, SURVEY.md §2.3) for
NLPs whose augmented KKT matrix is banded after interleaving variables and
constraints in index order (chained problems: LuksanVlcek1-7, 1-D PDE control,
trajectory optimization / MPC).

Design (TPU-first):
- The matrix is block-tridiagonal (nb blocks of size b): diagonal blocks
  ``diag[i]`` and sub-diagonal couplings ``sub[i] = K(i+1, i)``.
- **Block cyclic reduction**: at each of ceil(log2(nb)) levels, all blocks at
  odd multiples of the current stride are eliminated *in parallel* (vmapped
  dense b x b LDL^T + batched matmuls on the MXU), halving the active chain.
  Sequential depth is O(b log nb) instead of O(n) for ordinary banded
  elimination — the lever that makes a 10^6-variable banded KKT fast on a
  systolic-array machine.
- Odd-even elimination is a symmetric congruence (it is LDL^T under an
  odd-even permutation), so by Sylvester's law the inertia of K is the sum of
  the eliminated blocks' D-sign counts plus the root's — preserving the
  reference's factorize -> inertia -> perturb contract
  (IpSparseSymLinearSolverInterface::NumberOfNegEVals).
- Quasi-definiteness (primal block + delta_x, dual block - delta_c) is closed
  under Schur complements, so the pivot-free elimination is well defined
  whenever the regularized KKT is quasi-definite — numerical trouble surfaces
  as zero/wrong-sign pivots and feeds the standard perturbation retry loop.
- Everything is gather-based (no scatters with colliding indices), so it
  vmaps and shards cleanly.

Memory note: per-level factors are stored as (levels, nb, b, b) arenas for
simplicity; only ~2*nb blocks are actually live across all levels.  Packing
into a 2*nb arena (and a Pallas fused kernel for the level sweep) is the
planned optimization for the 10^6-variable regime.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

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
    tiny = jnp.finfo(L.dtype).tiny
    safe_d = jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    y = lax.linalg.triangular_solve(L, B, left_side=True, lower=True,
                                    unit_diagonal=True)
    z = y / safe_d[:, None]
    return lax.linalg.triangular_solve(L, z, left_side=True, lower=True,
                                       transpose_a=True, unit_diagonal=True)


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


def batched_block_ldlt_inv(A, use_pallas: bool = False):
    """(nb, b, b) -> (d, Ainv): pivots (for inertia) + explicit inverses.

    Explicit inverses turn every downstream elimination/backsolve op into a
    batched matmul (MXU) instead of a batched triangular solve, which lowers
    to a sequential substitution on TPU and dominated the BCR profile."""
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas_ldlt import pallas_block_ldlt_inv
        _, d, Ainv = pallas_block_ldlt_inv(A)
        return d, Ainv
    L, d = _vfactor_jnp(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Ainv = _vsolve(L, d, eye)
    return d, Ainv


class BCRFactor(NamedTuple):
    Ainv: jnp.ndarray  # (levels, nb, b, b) inverses of eliminated blocks
    ds: jnp.ndarray    # (levels, nb, b) pivots (inertia bookkeeping)
    Gl: jnp.ndarray    # (levels, nb, b, b): A_i^{-1} K(i, i-s)   (left coupling)
    Gr: jnp.ndarray    # (levels, nb, b, b): A_i^{-1} K(i+s, i)^T (right coupling)
    elim: jnp.ndarray  # (levels, nb) bool
    has_r: jnp.ndarray  # (levels, nb) bool: eliminated block had a right neighbor
    Ainv_root: jnp.ndarray
    d_root: jnp.ndarray
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray
    num_zero: jnp.ndarray
    singular: jnp.ndarray


def _levels_for(nb: int) -> int:
    lv = 0
    while (1 << lv) < nb:
        lv += 1
    return lv


def _block_inertia(ds_blocks, counted_mask, pivot_tol):
    """Sign counts of the (nb, b) pivot array over counted blocks."""
    dtype = ds_blocks.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(ds_blocks), axis=1, keepdims=True), 1.0)
    base = pivot_tol if pivot_tol > 0 else jnp.finfo(dtype).eps
    zero_tol = base * scale
    is_zero = jnp.abs(ds_blocks) <= zero_tol
    pos = jnp.sum(jnp.logical_and(~is_zero, ds_blocks > 0), axis=1)
    neg = jnp.sum(jnp.logical_and(~is_zero, ds_blocks < 0), axis=1)
    zer = jnp.sum(is_zero, axis=1)
    cm = counted_mask
    return (jnp.sum(jnp.where(cm, pos, 0)).astype(jnp.int32),
            jnp.sum(jnp.where(cm, neg, 0)).astype(jnp.int32),
            jnp.sum(jnp.where(cm, zer, 0)).astype(jnp.int32))


def bcr_factorize(K: BTDMatrix, pivot_tol: float = 0.0,
                  use_pallas: bool = False) -> BCRFactor:
    nb, b = K.nb, K.b
    dtype = K.diag.dtype
    levels = _levels_for(nb)
    idx = jnp.arange(nb)

    diag = K.diag
    C = K.sub  # C[j] = K(j+stride, j) for active j (stride grows per level)

    Ai_l, ds_l, Gl_l, Gr_l, elim_l, hasr_l = [], [], [], [], [], []
    num_pos = jnp.zeros((), jnp.int32)
    num_neg = jnp.zeros((), jnp.int32)
    num_zero = jnp.zeros((), jnp.int32)

    for l in range(levels):
        s = 1 << l
        is_elim = jnp.logical_and(idx % (2 * s) == s, idx < nb)
        is_active_next = (idx % (2 * s) == 0)

        ds, Ainv = batched_block_ldlt_inv(diag, use_pallas)
        p, n_, z = _block_inertia(ds, is_elim, pivot_tol)
        num_pos += p
        num_neg += n_
        num_zero += z

        left_i = jnp.maximum(idx - s, 0)     # for j active: left eliminated nbr
        right_i = jnp.minimum(idx + s, nb - 1)
        has_left = jnp.logical_and(is_active_next, idx - s >= 0)
        has_right = jnp.logical_and(is_active_next, idx + s < nb)

        # --- per-eliminated-i solve data (gathers of *old* C) -------------
        # For eliminated i: a = i-s always exists; c = i+s may not.
        Ca_of_i = C[left_i]                       # K(i, i-s) gathered at i
        Gl = jnp.einsum("nij,njk->nik", Ainv, Ca_of_i)   # A_i^{-1} K(i, a)
        Gr = jnp.einsum("nij,nkj->nik", Ainv, C)         # A_i^{-1} K(c, i)^T
        elim_has_r = jnp.logical_and(is_elim, idx + s < nb)

        m_e = is_elim[:, None, None]
        Ai_l.append(jnp.where(m_e, Ainv, 0.0))
        ds_l.append(jnp.where(is_elim[:, None], ds, 0.0))
        Gl_l.append(jnp.where(m_e, Gl, 0.0))
        Gr_l.append(jnp.where(jnp.logical_and(is_elim, elim_has_r)[:, None, None],
                              Gr, 0.0))
        elim_l.append(is_elim)
        hasr_l.append(elim_has_r)

        # --- per-active-j diagonal updates (pure gathers) -----------------
        Y_r = jnp.einsum("nij,njk->nik", Ainv[right_i], C)  # A_{j+s}^{-1} C[j]
        # From right neighbor i=j+s (j is its 'a'): A_j -= Ca^T A_i^{-1} Ca,
        #   Ca = K(i, j) = C[j].
        updR = jnp.einsum("nki,nkj->nij", C, Y_r)
        # From left neighbor i=j-s (j is its 'c'): A_j -= Ci A_i^{-1} Ci^T,
        #   Ci = K(j, i) = C[left_i]; A_i^{-1} Ci^T = Gr gathered at i=left_i.
        Y_l = jnp.einsum("nij,nkj->nik", Ainv[left_i], C[left_i])
        updL = jnp.einsum("nij,njk->nik", C[left_i], Y_l)

        diag = (diag
                - jnp.where(has_right[:, None, None], updR, 0.0)
                - jnp.where(has_left[:, None, None], updL, 0.0))

        # --- new couplings for the halved chain ---------------------------
        # K(j+2s, j) = -K(c, i) A_i^{-1} K(i, j) with i=j+s, c=j+2s:
        #            = -C[i] @ (A_i^{-1} C[j])
        newC = -jnp.einsum("nij,njk->nik", C[right_i], Y_r)
        has_c2 = jnp.logical_and(is_active_next, idx + 2 * s < nb)
        C = jnp.where(is_active_next[:, None, None],
                      jnp.where(has_c2[:, None, None], newC, 0.0), C)

    L_root, d_root = _dense_ldlt_block(diag[0])
    Ainv_root = _block_solve(L_root, d_root, jnp.eye(b, dtype=dtype))
    p, n_, z = _block_inertia(d_root[None, :], jnp.ones((1,), bool), pivot_tol)
    num_pos += p
    num_neg += n_
    num_zero += z

    def stk(xs, shape):
        return jnp.stack(xs) if xs else jnp.zeros((0,) + shape, dtype)

    return BCRFactor(
        Ainv=stk(Ai_l, (nb, b, b)), ds=stk(ds_l, (nb, b)),
        Gl=stk(Gl_l, (nb, b, b)), Gr=stk(Gr_l, (nb, b, b)),
        elim=jnp.stack(elim_l) if elim_l else jnp.zeros((0, nb), bool),
        has_r=jnp.stack(hasr_l) if hasr_l else jnp.zeros((0, nb), bool),
        Ainv_root=Ainv_root, d_root=d_root,
        num_pos=num_pos, num_neg=num_neg, num_zero=num_zero,
        singular=num_zero > 0)


def bcr_solve(fac: BCRFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = rhs using the BCR factorization (forward eliminate rhs,
    root solve, back substitute)."""
    levels, nb, b = fac.Ainv.shape[0], fac.Ainv.shape[1], fac.Ainv.shape[2]
    R = rhs.reshape(nb, b)
    idx = jnp.arange(nb)

    for l in range(levels):
        s = 1 << l
        is_elim = fac.elim[l]
        left_i = jnp.maximum(idx - s, 0)
        right_i = jnp.minimum(idx + s, nb - 1)
        is_active = (idx % (2 * s) == 0)
        has_left = jnp.logical_and(is_active, idx - s >= 0)
        has_right = jnp.logical_and(is_active, idx + s < nb)
        # r_a -= K(a,i) A_i^{-1} r_i = Gl[i]^T r_i  (for j=a, i=right)
        # r_c -= K(c,i) A_i^{-1} r_i = Gr[i]^T r_i  (for j=c, i=left)
        updR = jnp.einsum("nji,nj->ni", fac.Gl[l][right_i], R[right_i])
        updL = jnp.einsum("nji,nj->ni", fac.Gr[l][left_i], R[left_i])
        R = (R - jnp.where(has_right[:, None], updR, 0.0)
             - jnp.where(has_left[:, None], updL, 0.0))

    x0 = fac.Ainv_root @ R[0]
    X = jnp.zeros_like(R).at[0].set(x0)

    for l in reversed(range(levels)):
        s = 1 << l
        is_elim = fac.elim[l]
        left_j = jnp.maximum(idx - s, 0)    # 'a' of eliminated i
        right_j = jnp.minimum(idx + s, nb - 1)  # 'c' of eliminated i
        y = jnp.einsum("nij,nj->ni", fac.Ainv[l], R)
        xi = (y - jnp.einsum("nij,nj->ni", fac.Gl[l], X[left_j])
              - jnp.where(fac.has_r[l][:, None],
                          jnp.einsum("nij,nj->ni", fac.Gr[l], X[right_j]), 0.0))
        X = jnp.where(is_elim[:, None], xi, X)

    return X.reshape(-1)
