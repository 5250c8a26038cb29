"""Pallas TPU kernel: batched dense LDL^T factorization of many small blocks.

This is the innermost hot op of every structured path — the batched-NLP dense
KKT factorization, the per-scenario blocks of the arrow backend, and each BCR
level's block factorizations all reduce to "factorize (nb, b, b) symmetric
blocks".  The jnp fallback performs b sequential full-array updates that
round-trip HBM each step; the Pallas kernel keeps each block resident in VMEM
for the whole elimination, so the only HBM traffic is one read + one write
per block (b^2 * 8 bytes each) — the bandwidth lower bound.

Grid: one program per block.  Within the kernel, a fori_loop performs the
right-looking elimination on the VMEM-resident tile with VPU rank-1 updates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ldlt_block_kernel(a_ref, m_ref):
    """Factor one (1, b, b) block in VMEM.  Output layout: strict lower = L,
    diagonal = d (the packed form used by the solvers)."""
    b = a_ref.shape[-1]
    M = a_ref[0]
    dtype = M.dtype
    tiny = jnp.finfo(dtype).tiny
    row_ids = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (b, b), 1)

    def body(k, M):
        dkk = jnp.sum(jnp.where(jnp.logical_and(row_ids == k, col_ids == k),
                                M, 0.0))
        safe_d = jnp.where(jnp.abs(dkk) > tiny, dkk,
                           jnp.where(dkk >= 0, tiny, -tiny))
        # column k below the diagonal, as a (b, 1) mask-select
        colk = jnp.sum(jnp.where(col_ids == k, M, 0.0), axis=1, keepdims=True)
        a_col = jnp.where(row_ids[:, :1] > k, colk, 0.0)      # (b, 1)
        # trailing rank-1 update (VPU): M -= a a^T / d on the submatrix
        M = M - (a_col * a_col.T) / safe_d
        # write L column: M[:,k] = a_col/d below diagonal
        M = jnp.where(jnp.logical_and(col_ids == k, row_ids > k),
                      jnp.broadcast_to(a_col / safe_d, (b, b)), M)
        return M

    M = lax.fori_loop(0, b, body, M)
    m_ref[0] = M


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_ldlt(A: jnp.ndarray, interpret: bool = False):
    """Batched LDL^T: A (nb, b, b) -> (L (nb, b, b) unit-lower, d (nb, b)).

    The kernel writes the packed form (strict lower = L, diag = d); unpacking
    is fused by XLA into the consumers.
    """
    nb, b, _ = A.shape
    M = pl.pallas_call(
        _ldlt_block_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, b, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, b, b), A.dtype),
        interpret=interpret,
    )(A)
    d = jnp.diagonal(M, axis1=1, axis2=2)
    eye = jnp.eye(b, dtype=A.dtype)
    L = jnp.tril(M, -1) + eye[None]
    return L, d


# ---------------------------------------------------------------------------
# Factor + explicit inverse: used by the block elimination backends so every
# downstream operation (Schur updates, couplings, backsolves) is a batched
# matmul on the MXU instead of a batched triangular solve (which lowers to a
# sequential substitution on TPU and dominated the BCR profile).
# ---------------------------------------------------------------------------

def _gj_inv_kernel(a_ref, inv_ref, d_ref):
    """One Gauss-Jordan sweep producing BOTH the inverse and the pivot
    sequence of one (1, b, b) block.

    The unpivoted GJ pivot at step k equals the k-th LDL^T pivot (both are
    ratios of leading principal minors), so a single sweep yields the
    explicit inverse AND the inertia information — one VMEM-resident working
    tile, half the flops of a separate factor+invert.
    """
    b = a_ref.shape[-1]
    dtype = a_ref.dtype
    tiny = jnp.finfo(dtype).tiny
    row_ids = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (b, b), 1)

    cols1 = lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def jbody(k, carry):
        X, d = carry
        pk = jnp.sum(jnp.where(jnp.logical_and(row_ids == k, col_ids == k),
                               X, 0.0))
        d = jnp.where(cols1 == k, pk, d)  # masked write (no scatter in Mosaic)
        safe_p = jnp.where(jnp.abs(pk) > tiny, pk,
                           jnp.where(pk >= 0, tiny, -tiny))
        col = jnp.sum(jnp.where(col_ids == k, X, 0.0), axis=1, keepdims=True)
        row = jnp.sum(jnp.where(row_ids == k, X, 0.0), axis=0, keepdims=True)
        is_k_row = (row_ids == k)
        is_k_col = (col_ids == k)
        other = jnp.logical_and(~is_k_row, ~is_k_col)
        Xn = X - (col * row) / safe_p
        Xn = jnp.where(other, Xn, X)
        Xn = jnp.where(jnp.logical_and(is_k_row, ~is_k_col),
                       -row / safe_p, Xn)
        Xn = jnp.where(jnp.logical_and(is_k_col, ~is_k_row),
                       col / safe_p, Xn)
        Xn = jnp.where(jnp.logical_and(is_k_row, is_k_col),
                       1.0 / safe_p, Xn)
        return Xn, d

    X, d = lax.fori_loop(0, b, jbody,
                         (a_ref[0], jnp.zeros((1, b), dtype)))
    inv_ref[0] = X
    d_ref[0] = jnp.broadcast_to(d, (8, b))  # row-padded for tile alignment


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_ldlt_inv(A: jnp.ndarray, interpret: bool = False):
    """Batched pivots+inverse: A (nb, b, b) -> (None, d (nb, b), Ainv).

    (The explicit L factor is not produced — the block-elimination backends
    only consume pivot signs and inverses.)
    """
    nb, b, _ = A.shape
    inv, d8 = pl.pallas_call(
        _gj_inv_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, b, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, b, b), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nb, b, b), A.dtype),
                   jax.ShapeDtypeStruct((nb, 8, b), A.dtype)),
        interpret=interpret,
    )(A)
    return None, d8[:, 0, :], inv
