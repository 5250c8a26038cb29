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
    (ne_l blocks; sizes halve per level)."""

    ds: jnp.ndarray     # (ne, b) pivots
    Ainv: jnp.ndarray   # (ne, b, b)
    Gl: jnp.ndarray     # (ne, b, b): Ainv @ K(elim_t, keep_t)
    Gr: jnp.ndarray     # (ne, b, b): Ainv @ K(keep_{t+1}, elim_t)^T
    has_right: jnp.ndarray  # (ne,) bool: keep_{t+1} exists (not padding)


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


def _bcr_flatten(f: BCRFactor):
    children = (f.levels, f.Ainv_root, f.d_root, f.num_pos, f.num_neg,
                f.num_zero, f.singular)
    return children, (f.nb, f.b)


def _bcr_unflatten(aux, children):
    nb, b = aux
    levels, Ainv_root, d_root, num_pos, num_neg, num_zero, singular = children
    return BCRFactor(levels=levels, Ainv_root=Ainv_root, d_root=d_root,
                     nb=nb, b=b, num_pos=num_pos, num_neg=num_neg,
                     num_zero=num_zero, singular=singular)


jax.tree_util.register_pytree_node(BCRFactor, _bcr_flatten, _bcr_unflatten)


def _block_inertia_counts(ds_blocks, pivot_tol):
    """(pos, neg, zero) pivot counts for a (ne, b) pivot array."""
    dtype = ds_blocks.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(ds_blocks), axis=-1, keepdims=True), 1.0)
    base = pivot_tol if pivot_tol > 0 else jnp.finfo(dtype).eps
    is_zero = jnp.abs(ds_blocks) <= base * scale
    pos = jnp.sum(jnp.logical_and(~is_zero, ds_blocks > 0)).astype(jnp.int32)
    neg = jnp.sum(jnp.logical_and(~is_zero, ds_blocks < 0)).astype(jnp.int32)
    zer = jnp.sum(is_zero).astype(jnp.int32)
    return pos, neg, zer


def bcr_factorize(K: BTDMatrix, pivot_tol: float = 0.0,
                  use_pallas: bool = False) -> BCRFactor:
    nb, b = K.nb, K.b
    dtype = K.diag.dtype

    diag = K.diag
    C = K.sub  # C[j] couples block j+1 to block j; C[last] unused
    na = nb
    eye_b = jnp.eye(b, dtype=dtype)

    levels: List[BCRLevel] = []
    num_pos = jnp.zeros((), jnp.int32)
    num_neg = jnp.zeros((), jnp.int32)
    num_zero = jnp.zeros((), jnp.int32)
    n_pad_blocks = 0

    while na > 1:
        if na % 2 == 1:
            # pad with an identity block (eliminated at this level, harmless;
            # its +b positive pivots are subtracted from the inertia below)
            diag = jnp.concatenate([diag, eye_b[None]], axis=0)
            C = jnp.concatenate([C, jnp.zeros((1, b, b), dtype)], axis=0)
            na += 1
            n_pad_blocks += 1

        diag_e = diag[1::2]          # eliminated (ne, b, b)
        diag_k = diag[0::2]          # kept
        Ca = C[0::2]                 # K(elim_t, keep_t)
        Ci = C[1::2]                 # K(keep_{t+1}, elim_t); last may be pad-zero
        ne = diag_e.shape[0]

        ds, Ainv = batched_block_ldlt_inv(diag_e, use_pallas)
        p, n_, z = _block_inertia_counts(ds, pivot_tol)
        num_pos += p
        num_neg += n_
        num_zero += z

        Gl = jnp.einsum("nij,njk->nik", Ainv, Ca)                 # Ainv Ca
        Gr = jnp.einsum("nij,nkj->nik", Ainv, Ci)                 # Ainv Ci^T
        has_right = jnp.arange(ne) < (ne - 1) if na // 2 == ne else \
            jnp.ones((ne,), bool)
        # keep_t receives from its right eliminated neighbor elim_t:
        #   diag_k[t] -= Ca_t^T (Ainv Ca)_t
        updA = jnp.einsum("nki,nkj->nij", Ca, Gl)
        # keep_{t+1} receives from its left eliminated neighbor elim_t:
        #   diag_k[t+1] -= Ci_t (Ainv Ci^T)_t
        updC = jnp.einsum("nij,njk->nik", Ci, Gr)
        diag_k = diag_k - updA
        diag_k = diag_k.at[1:].add(-updC[: diag_k.shape[0] - 1])
        # new coupling: K(keep_{t+1}, keep_t) = -Ci_t (Ainv Ca)_t
        C_new = -jnp.einsum("nij,njk->nik", Ci, Gl)

        levels.append(BCRLevel(ds=ds, Ainv=Ainv, Gl=Gl, Gr=Gr,
                               has_right=has_right))
        diag = diag_k
        C = C_new[: diag.shape[0]]
        na = diag.shape[0]

    L_root, d_root = _dense_ldlt_block(diag[0])
    Ainv_root = _block_solve(L_root, d_root, eye_b)
    p, n_, z = _block_inertia_counts(d_root[None, :], pivot_tol)
    num_pos += p
    num_neg += n_
    num_zero += z
    # padded identity blocks contributed exactly +b positives each
    num_pos = num_pos - n_pad_blocks * b

    return BCRFactor(levels=tuple(levels), Ainv_root=Ainv_root, d_root=d_root,
                     nb=nb, b=b, num_pos=num_pos, num_neg=num_neg,
                     num_zero=num_zero, singular=num_zero > 0)


def bcr_solve(fac: BCRFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = rhs with the compacted BCR factorization."""
    nb, b = fac.nb, fac.b
    dtype = rhs.dtype
    R = rhs.reshape(nb, b)

    # Forward: eliminate odd positions level by level, remembering (R_e, the
    # pre-pad chain length) for the backward pass.
    stack = []
    for lvl in fac.levels:
        prepad = R.shape[0]
        if prepad % 2 == 1:
            R = jnp.concatenate([R, jnp.zeros((1, b), dtype)], axis=0)
        R_e = R[1::2]
        R_k = R[0::2]
        # r_keep_t    -= K(keep_t, elim_t) Ainv r_e = Gl^T r_e
        # r_keep_{t+1}-= K(keep_{t+1}, elim_t) Ainv r_e = Gr^T r_e
        R_k = R_k - jnp.einsum("nji,nj->ni", lvl.Gl, R_e)
        updR = jnp.einsum("nji,nj->ni", lvl.Gr, R_e)
        R_k = R_k.at[1:].add(-updR[: R_k.shape[0] - 1])
        stack.append((R_e, prepad))
        R = R_k

    # Root solve.
    X = (fac.Ainv_root @ R[0])[None, :]

    # Backward: reconstruct eliminated entries, interleave, unpad.
    for lvl, (R_e, prepad) in zip(reversed(fac.levels), reversed(stack)):
        ne = R_e.shape[0]
        nk = X.shape[0]
        x_keep = X
        # x_e = Ainv r_e - Gl x_keep_t - Gr x_keep_{t+1}
        x_e = jnp.einsum("nij,nj->ni", lvl.Ainv, R_e)
        x_e = x_e - jnp.einsum("nij,nj->ni", lvl.Gl, x_keep[:ne])
        # right keep neighbor (t+1); absent for the last eliminated block
        nbr = jnp.zeros((ne, b), dtype)
        take = min(ne, nk - 1)
        if take > 0:
            nbr = nbr.at[:take].set(x_keep[1:1 + take])
        x_e = x_e - jnp.einsum("nij,nj->ni", lvl.Gr, nbr)
        # interleave keep/elim back into the (padded) chain, then unpad
        total = nk + ne
        Xn = jnp.zeros((total, b), dtype)
        Xn = Xn.at[0::2].set(x_keep)
        Xn = Xn.at[1::2].set(x_e)
        X = Xn[:prepad]

    return X.reshape(-1)
