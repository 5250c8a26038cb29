"""General-sparsity KKT backend: static symbolic analysis -> bandwidth-
reducing permutation -> block-tridiagonal BCR factorization.

Reference parity: the MA27/MA57 capability class — *any* sparse NLP, any
structure — fed through triplet sparsity
(``src/Algorithm/LinearSolvers/IpMa27TSolverInterface.hpp:276-297``,
``IpTSymLinearSolver.hpp:33-84``).  In the reference the user always declares
the Jacobian/Hessian sparsity through TNLP (``IpTNLP.hpp:99`` get_nlp_info
nnz counts + structure callbacks); here the same declaration is
``NLP.jac_g_sparsity`` / ``NLP.lag_hess_sparsity`` (COO row/col arrays), and
for small problems the pattern is auto-detected exactly by dense AD probing
at randomized points.

TPU-native design (SURVEY.md §7 step 4 "static symbolic analysis →
block/banded Pallas LDLᵀ"):

1.  At canonicalize time (pure numpy, once): build the augmented-KKT pattern
    over the unknowns [x | s | y_c | y_d], run reverse Cuthill–McKee, measure
    the half-bandwidth ``bw``, and pick a block size ``b >= bw`` — the
    permuted KKT is then *block-tridiagonal* and the existing BCR machinery
    (``linalg/block_tridiag.py``: batched MXU block elimination, exact
    Sylvester inertia, explicit-inverse Pallas kernels) applies unchanged.
    This mirrors MA27's split into symbolic analysis (once) and numeric
    factorization (per iteration).
2.  Greedy distance-2 colorings of the Jacobian columns and the Hessian
    columns give compressed-AD seed matrices, so the per-iteration numeric
    values cost ``n_colors_J`` JVPs of g plus ``n_colors_H``
    Hessian-vector products — never a dense Jacobian or Hessian
    (Curtis–Powell–Reid / coloring-based compressed derivatives).
3.  Per iteration (inside jit): gather the entry values from the compressed
    derivative matrices and scatter-add them (precomputed static targets)
    into the (nb, b, b) diag/sub arrays; factorize with ``bcr_factorize``
    inside the same inertia-correction retry loop the dense path uses.

Everything here keeps the reference's factorize -> inertia -> perturb
contract; quasi-definiteness under the (delta_x, delta_c) regularization
makes the pivot-free block elimination well defined (delta_c is floored —
see CLAUDE.md / chained_kkt.py for why block eliminations need it).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Any

import numpy as np
import jax
import jax.numpy as jnp

from .options import Options
from .problem import NLP, CanonicalNLP, canonicalize


# ---------------------------------------------------------------------------
# Pattern detection (exact, dense-AD probing — for problems small enough;
# large problems declare their pattern, exactly like TNLP does)
# ---------------------------------------------------------------------------

_AUTODETECT_MAX_DENSE = 8_000_000  # max n*m (or n*n) entries probed densely


def detect_jacobian_sparsity(g_fn, x0: np.ndarray, n_probe: int = 2):
    """Exact Jacobian pattern by dense jacfwd at randomized points.

    An entry is structurally nonzero if it is nonzero (or NaN) at any probe
    point; probing >1 random point avoids accidental zeros (e.g. x_i * x_j
    at x_j = 0).  Counterpart of the user-declared eval_jac_g structure."""
    n = x0.shape[0]
    rng = np.random.RandomState(0)
    pat = None
    for _ in range(n_probe):
        xp = jnp.asarray(x0 + 0.1 * rng.standard_normal(n)
                         + 0.01 * rng.uniform(0.5, 1.5, n))
        J = np.asarray(jax.jacfwd(g_fn)(xp))
        nz = ~np.isclose(np.nan_to_num(J, nan=1.0), 0.0)
        pat = nz if pat is None else (pat | nz)
    rows, cols = np.nonzero(pat)
    return rows.astype(np.int32), cols.astype(np.int32)


def detect_hessian_sparsity(lag_fn, x0: np.ndarray, n_probe: int = 2):
    """Exact Lagrangian-Hessian pattern (full symmetric) by dense jax.hessian
    probing with randomized multipliers folded into ``lag_fn``."""
    n = x0.shape[0]
    rng = np.random.RandomState(1)
    pat = None
    for _ in range(n_probe):
        xp = jnp.asarray(x0 + 0.1 * rng.standard_normal(n)
                         + 0.01 * rng.uniform(0.5, 1.5, n))
        H = np.asarray(jax.hessian(lag_fn)(xp))
        nz = ~np.isclose(np.nan_to_num(H, nan=1.0), 0.0)
        pat = nz if pat is None else (pat | nz)
    pat = pat | pat.T
    rows, cols = np.nonzero(pat)
    return rows.astype(np.int32), cols.astype(np.int32)


def greedy_coloring(rows: np.ndarray, cols: np.ndarray, n_cols: int,
                    n_rows: int) -> np.ndarray:
    """Greedy distance-2 column coloring: columns sharing a row get distinct
    colors, so the compressed matrix (A @ seeds) recovers every entry
    directly (Curtis–Powell–Reid).

    Fast path for banded patterns: if every row's column span w is small,
    ``col % w`` is a valid coloring (two columns in one row differ by < w),
    avoiding the O(n_cols) python greedy loop at n = 1e6 scale."""
    import scipy.sparse as sp
    if len(rows) == 0 or n_cols == 0:
        return np.zeros((n_cols,), np.int32)
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    # per-row column span (vectorized)
    cmax = np.full(n_rows, -1, np.int32)
    cmin = np.full(n_rows, np.iinfo(np.int32).max, np.int32)
    np.maximum.at(cmax, rows, cols)
    np.minimum.at(cmin, rows, cols)
    nonempty = cmax >= 0
    w = int(np.max(np.where(nonempty, cmax - cmin + 1, 0), initial=1))
    if w <= 64:
        return (np.arange(n_cols, dtype=np.int64) % w).astype(np.int32)
    A = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                      shape=(max(n_rows, 1), n_cols)).tocsc()
    B = (A.T @ A).tocsr()
    colors = np.full((n_cols,), -1, np.int32)
    for j in range(n_cols):
        nbr = B.indices[B.indptr[j]:B.indptr[j + 1]]
        used = set(int(c) for c in colors[nbr] if c >= 0)
        c = 0
        while c in used:
            c += 1
        colors[j] = c
    return colors


# ---------------------------------------------------------------------------
# The static descriptor
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class BandedInfo:
    """Static symbolic-analysis result, attached to ``CanonicalNLP.chain``.

    All arrays are numpy (trace-time constants).  Index spaces:
      unknown u in [0, N):  x (0..n-1), s (n..n+mi-1), y_c, y_d
      pos[u]:               position after the RCM permutation
    """

    n: int
    mi: int
    me: int
    N: int              # n + mi + me + mi
    b: int              # block size (>= half bandwidth)
    nb: int             # number of blocks; nb*b >= N
    perm: np.ndarray    # (N,) original unknown at permuted position k
    pos: np.ndarray     # (N,) permuted position of unknown u (inverse perm)
    # Jacobian: COO in (g-row, free-x-col) space + column colors
    j_rows: np.ndarray
    j_cols: np.ndarray
    j_colors: np.ndarray   # (n,) color of each x column
    n_colors_j: int
    # Hessian: full-symmetric COO + column colors
    h_rows: np.ndarray
    h_cols: np.ndarray
    h_colors: np.ndarray
    n_colors_h: int
    # g-row -> y-unknown index (n+mi+eqpos / n+mi+me+ineqpos)
    row_unknown: np.ndarray  # (m,)
    # scatter targets, concatenated value-vector order:
    #   [h_vals | j_vals | j_vals(T) | sig_x | sig_s | (-1) couplings x2 |
    #    y diag (-delta_c) | pad (+1)]
    n_pad: int = 0
    # gather-form assembly indices: asm_src (n_unique, Kdup) value indices
    # per occupied slot (padded with n_vals -> reads an appended 0) and
    # asm_inv (2*nb*b*b,) slot -> occupied-slot index (padded with n_unique);
    # slot = is_sub*nb*b*b + blk*b*b + r*b + c.  asm_slot is the host-side
    # per-value slot list (kept for tests/debugging; never uploaded).
    asm_slot: np.ndarray = None
    asm_src: np.ndarray = None
    asm_inv: np.ndarray = None
    n_vals: int = 0
    # (nb, b) int8 kind of each permuted diagonal position: 0 = x/s (gets
    # +delta_x), 1 = y (gets -delta_c), 2 = pad — lets the inertia retry
    # loop re-add deltas on the diagonal instead of re-assembling.
    diag_kind: np.ndarray = None

    def _key(self):
        return (self.n, self.mi, self.me, self.N, self.b, self.nb,
                self.perm.tobytes(), self.j_rows.tobytes(),
                self.j_cols.tobytes(), self.h_rows.tobytes(),
                self.h_cols.tobytes())

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, BandedInfo) and self._key() == other._key()


def _targets_oriented(pos, b, ui, uj):
    """Oriented scatter target for an entry K(ui, uj) that appears in a
    *full-symmetric* COO list (both orientations present).  Same-block
    entries fill their own (r, c) slot; the lower cross-block orientation
    fills sub; the upper cross-block orientation is dropped (keep=False) —
    its mirror fills sub instead."""
    pi = pos[ui]
    pj = pos[uj]
    blki = pi // b
    blkj = pj // b
    same = blki == blkj
    cross_lower = blki == blkj + 1
    keep = same | cross_lower
    is_sub = cross_lower
    blk = np.where(same, blki, np.minimum(blki, blkj))
    return is_sub, blk, pi % b, pj % b, keep


def _targets_for_pairs(pos, b, ua, ub):
    """Scatter target for symmetric entries connecting unknowns ua, ub
    (vectorized numpy).  Returns (is_sub, blk, r, c) for the K(hi, lo)
    orientation — callers emit both orientations for in-block off-diagonals.
    """
    pa = pos[ua]
    pb = pos[ub]
    hi = np.maximum(pa, pb)
    lo = np.minimum(pa, pb)
    blk_hi = hi // b
    blk_lo = lo // b
    if np.any(blk_hi - blk_lo > 1):
        raise AssertionError("bandwidth exceeded block size — RCM/b bug")
    is_sub = blk_hi != blk_lo
    blk = np.where(is_sub, blk_lo, blk_hi)
    return is_sub, blk, hi % b, lo % b


_I32 = np.int32


def analyze_sparsity(n: int, mi: int, me: int,
                     j_rows, j_cols, eq_mask,
                     h_rows, h_cols,
                     min_block: int = 8,
                     block_align: int = 8,
                     j_colors=None, h_colors=None) -> BandedInfo:
    """The symbolic phase: pattern -> RCM -> block size -> scatter targets."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m = len(eq_mask)
    N = n + mi + me + mi

    # g-row -> y unknown (all index math in int32: N < 2^31 always, and the
    # int64 passes dominated the symbolic wall time at n = 1e6)
    eq_mask = np.asarray(eq_mask, bool)
    eq_pos = np.cumsum(eq_mask, dtype=_I32) - 1
    ineq_pos = np.cumsum(~eq_mask, dtype=_I32) - 1
    row_unknown = np.where(eq_mask, n + mi + eq_pos,
                           n + mi + me + ineq_pos).astype(_I32)

    # --- aggregate the aug pattern (undirected edges between unknowns) -----
    # The Hessian COO is full-symmetric by contract (both orientations
    # present), so it enters once; Jacobian and s<->y couplings enter in both
    # orientations; the diagonal is irrelevant to RCM adjacency.  One
    # coo->csr pass merges duplicates (no G + G.T round trip).
    hr32 = np.asarray(h_rows, _I32)
    hc32 = np.asarray(h_cols, _I32)
    ea = [hr32]
    eb = [hc32]
    if len(j_rows):
        ju = row_unknown[np.asarray(j_rows, _I32)]
        jx = np.asarray(j_cols, _I32)
        ea += [ju, jx]
        eb += [jx, ju]
    if mi:
        sk = n + np.arange(mi, dtype=_I32)
        yk = n + mi + me + np.arange(mi, dtype=_I32)
        ea += [sk, yk]
        eb += [yk, sk]
    EA = np.concatenate(ea)
    EB = np.concatenate(eb)

    G = sp.coo_matrix((np.ones(len(EA), np.int8), (EA, EB)),
                      shape=(N, N)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(G, symmetric_mode=True), _I32)
    pos = np.empty(N, _I32)
    pos[perm] = np.arange(N, dtype=_I32)

    # half bandwidth
    bw = int(np.max(np.abs(pos[EA] - pos[EB]))) if len(EA) else 1
    b = max(min_block, -(-max(bw, 1) // block_align) * block_align)
    nb = -(-N // b)
    n_pad = nb * b - N

    # --- colorings ---------------------------------------------------------
    if j_colors is None:
        j_colors = greedy_coloring(np.asarray(j_rows), np.asarray(j_cols),
                                   n, m)
    n_colors_j = int(j_colors.max()) + 1 if n and len(j_rows) else 0
    if h_colors is None:
        h_colors = greedy_coloring(np.asarray(h_rows), np.asarray(h_cols),
                                   n, n)
    n_colors_h = int(h_colors.max()) + 1 if n and len(h_rows) else 0

    # --- scatter targets (value-vector order documented in BandedInfo) -----
    # Per-segment flat SLOT ids are built immediately (slot = is_sub*nb*b*b
    # + blk*b*b + r*b + c) instead of materializing four full-size target
    # arrays: this host is page-fault-bound (~200 MB/s first touch), so
    # symbolic time at n=1e6 is dominated by allocation volume, not FLOPs.
    bb = b * b
    if 2 * nb * bb >= 2**31:
        # the dense block arrays themselves would exceed 8 GB and the int32
        # slot/gather indices would wrap — refuse loudly instead of silently
        # dropping wrapped entries in assembly
        raise ValueError(
            f"banded backend block storage too large: 2*nb*b^2 = {2 * nb * bb}"
            f" >= 2^31 (nb={nb}, b={b}); the RCM bandwidth is too wide for "
            f"this problem — use the arrow/chain backend or nested dissection")
    sdt = _I32
    segs = []

    def _slot(is_sub, blk, r, c):
        return (np.asarray(is_sub, sdt) * sdt(nb * bb)
                + np.asarray(blk, sdt) * sdt(bb)
                + np.asarray(r, sdt) * sdt(b) + np.asarray(c, sdt))

    def emit(ua, ub, both: bool):
        """Emit K(hi,lo); for in-block off-diagonal entries also K(lo,hi)
        when ``both`` (the BTD diag blocks store the full symmetric block,
        sub blocks store only the lower coupling)."""
        is_sub, blk, r, c = _targets_for_pairs(pos, b, ua, ub)
        segs.append(_slot(is_sub, blk, r, c))
        if both:
            in_blk_off = (~is_sub) & (r != c)
            # mirrored entry for in-block off-diagonals; harmless zero-add
            # rows for the rest (targets must stay static-shape): mirror of
            # a diagonal entry adds 0 there instead.
            r2 = np.where(in_blk_off, c, r)
            c2 = np.where(in_blk_off, r, c)
            segs.append(_slot(is_sub, blk, r2, c2))
            return in_blk_off
        return None

    # 1. Hessian entries: the full-symmetric COO already contains both
    #    orientations — oriented targeting (each orientation fills its own
    #    slot; the upper cross-block orientation is dropped, its mirror
    #    fills sub).
    h_keep_mask = None
    if len(h_rows):
        is_sub, blk, r, c, h_keep_mask = _targets_oriented(
            pos, b, np.asarray(h_rows, _I32), np.asarray(h_cols, _I32))
        segs.append(_slot(is_sub, blk, r, c))
    # 2+3. Jacobian entries: connect y-row unknown and x column — emit the
    #      K(hi,lo) entry and the mirrored in-block entry.
    j_mirror_mask = None
    if len(j_rows):
        j_mirror_mask = emit(row_unknown[np.asarray(j_rows, _I32)],
                             np.asarray(j_cols, _I32), both=True)
    # 4. sigma_x + delta_x on the x diagonal
    ux = np.arange(n, dtype=_I32)
    emit(ux, ux, both=False)
    # 5. sigma_s + delta_x on the s diagonal
    if mi:
        us = n + np.arange(mi, dtype=_I32)
        emit(us, us, both=False)
    # 6. the -1 couplings s <-> y_d (emit both orientations)
    s_mirror_mask = None
    if mi:
        s_mirror_mask = emit(n + np.arange(mi, dtype=_I32),
                             n + mi + me + np.arange(mi, dtype=_I32),
                             both=True)
    # 7. -delta_c on the y diagonal
    uy = n + mi + np.arange(me + mi, dtype=_I32)
    emit(uy, uy, both=False)
    # 8. +1 dummy padding diagonal
    if n_pad:
        pp = N + np.arange(n_pad, dtype=_I32)
        blk = pp // b
        segs.append(_slot(np.zeros(n_pad, bool), blk, pp % b, pp % b))

    # --- gather-form assembly indices (vectorized numpy) -------------------
    slot = np.concatenate(segs)
    n_vals = len(slot)
    # duplicate order within a slot is irrelevant (values are summed), so the
    # (faster) non-stable introsort is fine
    order = np.argsort(slot)
    ss = slot[order]
    first = np.ones(n_vals, bool)
    first[1:] = ss[1:] != ss[:-1]
    group_id = np.cumsum(first, dtype=_I32) - 1  # occupied-slot index
    n_unique = int(group_id[-1]) + 1 if n_vals else 0
    starts = np.flatnonzero(first).astype(_I32)
    kpos = np.arange(n_vals, dtype=_I32) - starts[group_id]
    kdup = int(kpos.max()) + 1 if n_vals else 1
    asm_src = np.full((n_unique, kdup), n_vals, np.int32)
    asm_src[group_id, kpos] = order
    asm_inv = np.full((2 * nb * bb,), n_unique, np.int32)
    asm_inv[ss[first]] = np.arange(n_unique, dtype=np.int32)

    # (nb, b) diagonal-position kinds for the delta re-add (see BandedInfo)
    kind_u = np.empty(nb * b, np.int8)
    kind_u[:] = 2
    kind_of = np.empty(N, np.int8)
    kind_of[: n + mi] = 0
    kind_of[n + mi:] = 1
    kind_u[:N] = kind_of[perm]
    diag_kind = kind_u.reshape(nb, b)

    info = BandedInfo(
        n=n, mi=mi, me=me, N=N, b=b, nb=nb, perm=perm, pos=pos,
        j_rows=np.asarray(j_rows, np.int32), j_cols=np.asarray(j_cols, np.int32),
        j_colors=j_colors, n_colors_j=max(n_colors_j, 1),
        h_rows=np.asarray(h_rows, np.int32), h_cols=np.asarray(h_cols, np.int32),
        h_colors=h_colors, n_colors_h=max(n_colors_h, 1),
        row_unknown=row_unknown,
        n_pad=n_pad, asm_slot=np.asarray(slot, np.int32),
        asm_src=asm_src, asm_inv=asm_inv, n_vals=n_vals,
        diag_kind=diag_kind)
    # stash the mirror/keep masks (value duplication patterns) on the object
    object.__setattr__(info, "_j_mirror_mask", j_mirror_mask)
    object.__setattr__(info, "_s_mirror_mask", s_mirror_mask)
    object.__setattr__(info, "_h_keep_mask", h_keep_mask)
    return info


# ---------------------------------------------------------------------------
# Canonicalization entry point
# ---------------------------------------------------------------------------

def _aux_from_info(info: "BandedInfo"):
    """Device-array copies of the symbolic-analysis index data.  These ride
    on CanonicalNLP.aux_arrays (pytree LEAVES), so at n = 1e6 scale the
    multi-million-entry scatter indices are jit *arguments* instead of HLO
    constants (the remote-compile relay rejects oversized modules)."""
    aux = {
        "asm_src": jnp.asarray(info.asm_src),
        "asm_inv": jnp.asarray(info.asm_inv),
        "diag_kind": jnp.asarray(info.diag_kind),
        "j_rows": jnp.asarray(info.j_rows),
        "j_cols": jnp.asarray(info.j_cols),
        "j_colors": jnp.asarray(info.j_colors),
        "h_rows": jnp.asarray(info.h_rows),
        "h_cols": jnp.asarray(info.h_cols),
        "h_colors": jnp.asarray(info.h_colors),
        "perm": jnp.asarray(info.perm),
    }
    if info._j_mirror_mask is not None:
        aux["j_mirror"] = jnp.asarray(info._j_mirror_mask)
    if info._s_mirror_mask is not None:
        aux["s_mirror"] = jnp.asarray(info._s_mirror_mask)
    if info._h_keep_mask is not None:
        aux["h_keep"] = jnp.asarray(info._h_keep_mask)
    return aux


def _ax(nlp: CanonicalNLP, key: str, np_fallback):
    """aux_arrays lookup with np fallback (hand-built CanonicalNLPs)."""
    aux = nlp.aux_arrays
    if isinstance(aux, dict) and key in aux:
        return aux[key]
    return jnp.asarray(np_fallback)


def canonicalize_sparse(nlp: NLP, options: Optional[Options] = None
                        ) -> CanonicalNLP:
    """Canonicalize a flat NLP for the banded-BCR backend.

    Pattern source: ``nlp.jac_g_sparsity`` / ``nlp.lag_hess_sparsity`` (COO
    (rows, cols) tuples, TNLP-style declaration) or exact auto-detection by
    dense AD probing (gated by problem size)."""
    opts = options or Options()
    base = canonicalize(nlp, opts.replace(nlp_scaling_method="none"))
    s = base.struct
    if s.n != s.n_full:
        raise ValueError(
            "the banded backend does not support eliminated fixed variables;"
            " use fixed_variable_treatment='relax_bounds' or 'make_constraint'")
    n, mi, me, m = s.n, s.mi, s.me, s.m

    jac_pat = getattr(nlp, "jac_g_sparsity", None)
    hess_pat = getattr(nlp, "lag_hess_sparsity", None)
    # Probe point for pattern auto-detection, from the USER x0 (host numpy).
    # base.x0 is a device array and a device->host transfer here would poison
    # the tunnel dispatch path for the whole process (see BASELINE.md).
    if jac_pat is None or hess_pat is None:
        x0 = np.asarray(nlp.x0, np.float64).reshape(-1)

    if jac_pat is None and m:
        if n * m > _AUTODETECT_MAX_DENSE:
            raise ValueError(
                f"problem too large for dense sparsity auto-detection "
                f"(n*m = {n * m}); declare NLP.jac_g_sparsity")
        g_raw = (lambda x: nlp.g(x)) if nlp.params is None else \
            (lambda x: nlp.g(x, base.params))
        j_rows, j_cols = detect_jacobian_sparsity(g_raw, x0)
    elif jac_pat is not None:
        j_rows = np.asarray(jac_pat[0], np.int32)
        j_cols = np.asarray(jac_pat[1], np.int32)
    else:
        j_rows = np.zeros((0,), np.int32)
        j_cols = np.zeros((0,), np.int32)

    if hess_pat is None:
        if n * n > _AUTODETECT_MAX_DENSE:
            raise ValueError(
                f"problem too large for dense Hessian auto-detection "
                f"(n^2 = {n * n}); declare NLP.lag_hess_sparsity")
        rng = np.random.RandomState(7)
        y_rand = jnp.asarray(rng.standard_normal(m))

        def lag(x):
            val = nlp.f(x) if nlp.params is None else nlp.f(x, base.params)
            if m:
                gv = nlp.g(x) if nlp.params is None else nlp.g(x, base.params)
                val = val + jnp.dot(y_rand, gv)
            return val

        h_rows, h_cols = detect_hessian_sparsity(lag, x0)
    else:
        hr = np.asarray(hess_pat[0], np.int64)
        hc = np.asarray(hess_pat[1], np.int64)
        # Exact dedup + symmetry test on the flat (r*n + c) keys: np.unique is
        # O(nnz log nnz) int64 sorting (cheap vs the scipy symmetrize round
        # trip at n = 1e6), removes duplicate declarations (which would
        # otherwise double-count entries in assembly), and makes the
        # already-symmetric fast path an exact set comparison.
        keys = np.unique(hr * n + hc)
        keys_t = np.unique(hc * n + hr)
        if keys.size == keys_t.size and np.array_equal(keys, keys_t):
            h_rows = (keys // n).astype(np.int32)
            h_cols = (keys % n).astype(np.int32)
        else:
            # symmetrize a triangle declaration into the full pattern
            full = np.unique(np.concatenate([keys, keys_t]))
            h_rows = (full // n).astype(np.int32)
            h_cols = (full % n).astype(np.int32)

    # map eq/ineq: eq_mask over user g rows
    eq_mask = np.zeros((m,), bool)
    eq_mask[s.eq_idx] = True

    multifrontal = opts.linear_solver == "multifrontal"
    if multifrontal:
        # nested-dissection multifrontal: general fill-in capability for
        # patterns whose RCM bandwidth is too wide for banded BCR (3-D
        # grids; MA27 multifrontal role, IpMa27TSolverInterface.hpp:276)
        from .linalg.nested_dissection import nd_analyze, nd_aux
        _analyze = nd_analyze
        _mk_aux = nd_aux
    else:
        _analyze = analyze_sparsity
        _mk_aux = _aux_from_info
    info = _analyze(n, mi, me, j_rows, j_cols, eq_mask,
                    h_rows, h_cols)

    # Symbolic analysis for the RESTORATION NLP (x widened by per-row n/p
    # slacks; g_r = g - p + n): the pattern is the original plus identity
    # couplings into the slack columns and a full x-diagonal for the
    # proximity term — all static, so the nested resto IPM can run on the
    # banded backend too (IpRestoMinC_1Nrm is solver-agnostic).
    if not opts.resto_phase:
        object.__setattr__(info, "_resto_info", None)
        base = base._replace(chain=info, aux_arrays=_mk_aux(info))
        if opts.nlp_scaling_method == "gradient-based":
            base = _sparse_gradient_scaling(base, opts)
        return base
    nr = n + 2 * m
    jr_rows = [j_rows]
    jr_cols = [j_cols]
    if m:
        rr = np.arange(m, dtype=np.int32)
        jr_rows += [rr, rr]
        jr_cols += [(n + rr).astype(np.int32), (n + m + rr).astype(np.int32)]
    jr_rows = np.concatenate(jr_rows) if m else j_rows
    jr_cols = np.concatenate(jr_cols) if m else j_cols
    diag_x = np.arange(n, dtype=np.int32)
    hr_rows = np.concatenate([h_rows, diag_x])
    hr_cols = np.concatenate([h_cols, diag_x])
    import scipy.sparse as sp
    Hd = sp.coo_matrix((np.ones(len(hr_rows), np.int8), (hr_rows, hr_cols)),
                       shape=(nr, nr))
    Hd = (Hd != 0).tocoo()
    # resto J coloring from the original one: each slack column appears in
    # exactly one row, so all n-columns share one new color and all
    # p-columns another (no python greedy loop at 1e6 scale)
    ncj = int(info.j_colors.max()) + 1 if len(j_rows) else 0
    jc_resto = np.concatenate([
        info.j_colors,
        np.full(m, ncj, np.int32), np.full(m, ncj + 1, np.int32)]) if m \
        else info.j_colors
    resto_info = _analyze(nr, mi, me, jr_rows, jr_cols, eq_mask,
                          Hd.row.astype(np.int32),
                          Hd.col.astype(np.int32),
                          j_colors=jc_resto)
    object.__setattr__(info, "_resto_info", resto_info)

    base = base._replace(chain=info,
                         aux_arrays={**_mk_aux(info),
                                     "resto": _mk_aux(resto_info)})
    if opts.nlp_scaling_method == "gradient-based":
        base = _sparse_gradient_scaling(base, opts)
    return base


def _sparse_gradient_scaling(nlp: CanonicalNLP, opts: Options) -> CanonicalNLP:
    """GradientScaling via the compressed Jacobian (no dense J)."""
    s = nlp.struct
    info: BandedInfo = nlp.chain
    max_grad = opts.nlp_scaling_max_gradient
    min_val = opts.nlp_scaling_min_value
    x0 = nlp.x0
    dtype = x0.dtype

    from .scaling import grad_scale_factor

    # One jitted program: eager execution here costs dozens of tunnel
    # compiles/dispatches and dominated the symbolic wall time on TPU.
    # The nlp pytree is a jit ARGUMENT so the million-entry aux index arrays
    # ride as program inputs, not embedded HLO constants (the remote-compile
    # relay rejects oversized modules — same rationale as _aux_from_info).
    def _scales(cn, x0):
        gf = cn.eval_grad_f(x0)
        gnorm = jnp.max(jnp.abs(gf), initial=0.0)
        df = grad_scale_factor(gnorm, opts,
                               opts.nlp_scaling_obj_target_gradient)
        df = df * opts.obj_scaling_factor
        if s.m:
            Jcomp = compressed_jacobian_raw(cn, x0)  # (m, ncJ), raw rows
            row_norm = jnp.max(jnp.abs(Jcomp), axis=1, initial=0.0)
            dg = grad_scale_factor(row_norm, opts,
                                   opts.nlp_scaling_constr_target_gradient)
            c_scale = dg[jnp.asarray(s.eq_idx)] if s.me else cn.c_scale
            d_scale = dg[jnp.asarray(s.ineq_idx)] if s.mi else cn.d_scale
        else:
            c_scale, d_scale = cn.c_scale, cn.d_scale
        return df, c_scale, d_scale

    df, c_scale, d_scale = jax.jit(_scales)(nlp, x0)
    return nlp._replace(
        obj_scale=jnp.asarray(df, dtype),
        c_scale=c_scale.astype(dtype), d_scale=d_scale.astype(dtype),
        d_L=nlp.d_L * d_scale, d_U=nlp.d_U * d_scale)


# ---------------------------------------------------------------------------
# Per-iteration numeric values (compressed AD)
# ---------------------------------------------------------------------------

def _g_raw(nlp: CanonicalNLP, x):
    """User g (raw, unscaled, unsplit) as a function of the free variables."""
    return nlp.g(nlp.x_full(x), nlp.params)


def compressed_jacobian_raw(nlp: CanonicalNLP, x):
    """(m, n_colors_j) compressed raw Jacobian: column j's entries land in
    color column j_colors[j]; coloring guarantees no collisions."""
    info: BandedInfo = nlp.chain
    dtype = x.dtype
    seeds = (_ax(nlp, "j_colors", info.j_colors)[None, :]
             == jnp.arange(info.n_colors_j)[:, None]).astype(dtype)

    def jvp_one(sv):
        return jax.jvp(lambda xx: _g_raw(nlp, xx), (x,), (sv,))[1]

    return jax.vmap(jvp_one)(seeds).T


def _row_scale(nlp: CanonicalNLP):
    """(m,) per-user-row scale factor (c_scale / d_scale scattered back)."""
    s = nlp.struct
    # pure-eq / pure-ineq: row order is the identity, skip the (m,) index
    # constants (they dominate the module size at n = 1e6)
    if s.mi == 0 and s.me == s.m:
        return jnp.broadcast_to(nlp.c_scale, (s.m,)).astype(nlp.x0.dtype)
    if s.me == 0 and s.mi == s.m:
        return jnp.broadcast_to(nlp.d_scale, (s.m,)).astype(nlp.x0.dtype)
    rs = jnp.ones((s.m,), nlp.x0.dtype)
    if s.me:
        rs = rs.at[jnp.asarray(s.eq_idx)].set(nlp.c_scale)
    if s.mi:
        rs = rs.at[jnp.asarray(s.ineq_idx)].set(nlp.d_scale)
    return rs


def jacobian_values(nlp: CanonicalNLP, x):
    """Scaled J entry values aligned with (j_rows, j_cols)."""
    info: BandedInfo = nlp.chain
    Jcomp = compressed_jacobian_raw(nlp, x)
    rs = _row_scale(nlp)
    r = _ax(nlp, "j_rows", info.j_rows)
    c = _ax(nlp, "j_cols", info.j_cols)
    return Jcomp[r, _ax(nlp, "j_colors", info.j_colors)[c]] * rs[r]


def sparse_hessian_values(nlp: CanonicalNLP, it):
    """Scaled Lagrangian-Hessian entry values aligned with (h_rows, h_cols).

    n_colors_h HVPs of the (already scaled) Lagrangian via the coloring
    seeds — the backend-shaped 'W' of this backend."""
    info: BandedInfo = nlp.chain
    x, y_c, y_d = it.x, it.y_c, it.y_d
    dtype = x.dtype
    seeds = (_ax(nlp, "h_colors", info.h_colors)[None, :]
             == jnp.arange(info.n_colors_h)[:, None]).astype(dtype)

    def lag(xx):
        val = nlp.eval_f(xx)
        if nlp.struct.me:
            val = val + jnp.dot(y_c, nlp.eval_c(xx))
        if nlp.struct.mi:
            val = val + jnp.dot(y_d, nlp.eval_d(xx))
        return val

    glag = jax.grad(lag)

    def hvp_one(sv):
        return jax.jvp(glag, (x,), (sv,))[1]

    Hcomp = jax.vmap(hvp_one)(seeds).T  # (n, ncH)
    r = _ax(nlp, "h_rows", info.h_rows)
    c = _ax(nlp, "h_cols", info.h_cols)
    return Hcomp[r, _ax(nlp, "h_colors", info.h_colors)[c]]


# ---------------------------------------------------------------------------
# Assembly / factorize / solve (the backend contract used by step.py)
# ---------------------------------------------------------------------------

def assemble_banded(nlp: CanonicalNLP, it, j_vals, h_vals, delta_x, delta_c):
    """Gather the value vector into BTDMatrix (diag, sub) arrays.

    TPU-first: a scatter-add over millions of entries serializes on TPU
    (~23 ms at n=1e5); instead duplicates are combined by a static (n_unique,
    Kdup) gather-sum and the dense block arrays are produced by one static
    inverse-permutation gather (empty slots read an appended zero)."""
    from .kkt import sigmas
    from .linalg.block_tridiag import BTDMatrix
    info: BandedInfo = nlp.chain
    dtype = it.x.dtype
    sig = sigmas(nlp, it)

    vals = []
    if len(info.h_rows):
        vals.append(jnp.where(_ax(nlp, "h_keep", info._h_keep_mask),
                              h_vals, 0.0))
    if len(info.j_rows):
        vals.append(j_vals)
        # mirrored in-block entries (zeroed where the entry was a coupling)
        vals.append(jnp.where(_ax(nlp, "j_mirror", info._j_mirror_mask),
                              j_vals, 0.0))
    vals.append(sig.sigma_x + delta_x)
    if info.mi:
        vals.append(sig.sigma_s + delta_x)
        mones = -jnp.ones((info.mi,), dtype)
        vals.append(mones)
        vals.append(jnp.where(_ax(nlp, "s_mirror", info._s_mirror_mask),
                              mones, 0.0))
    vals.append(jnp.broadcast_to(-delta_c, (info.me + info.mi,)))
    if info.n_pad:
        vals.append(jnp.ones((info.n_pad,), dtype))
    v = jnp.concatenate([jnp.asarray(x, dtype).reshape(-1) for x in vals])

    # gather form: duplicates combined by the static (n_unique, Kdup) sum
    # (asm_src pads with n_vals -> reads the appended zero), then one static
    # inverse-permutation gather fills the dense block arrays (empty slots
    # read the appended zero through asm_inv's n_unique padding)
    v_ext = jnp.concatenate([v, jnp.zeros((1,), dtype)])
    slot_vals = jnp.sum(v_ext[_ax(nlp, "asm_src", info.asm_src)], axis=1)
    slot_ext = jnp.concatenate([slot_vals, jnp.zeros((1,), dtype)])
    flat = slot_ext[_ax(nlp, "asm_inv", info.asm_inv)]
    both = flat.reshape(2, info.nb, info.b, info.b)
    return BTDMatrix(diag=both[0], sub=both[1])


def add_diag_deltas(nlp: CanonicalNLP, Kb, delta_x, delta_c):
    """Re-add (delta_x, -delta_c) on the diagonal of a zero-delta base
    assembly — the inertia-correction retry loop re-regularizes without
    re-scattering the million-entry value vector."""
    from .linalg.block_tridiag import BTDMatrix
    info: BandedInfo = nlp.chain
    kind = _ax(nlp, "diag_kind", info.diag_kind)          # (nb, b)
    add = jnp.where(kind == 0, delta_x,
                    jnp.where(kind == 1, -delta_c, 0.0)).astype(Kb.diag.dtype)
    eye_b = jnp.eye(info.b, dtype=Kb.diag.dtype)
    return BTDMatrix(diag=Kb.diag + add[:, :, None] * eye_b[None], sub=Kb.sub)


def expected_inertia_banded(nlp: CanonicalNLP):
    info: BandedInfo = nlp.chain
    return info.n + info.mi + info.n_pad, info.me + info.mi


class BandedFactorResult(NamedTuple):
    fac: Any
    K: Any
    delta_x: jnp.ndarray
    delta_c: jnp.ndarray
    delta_w_last: jnp.ndarray
    failed: jnp.ndarray
    num_trials: jnp.ndarray


def banded_factorize_kkt(nlp: CanonicalNLP, opts: Options, it, h_vals, mu,
                         delta_w_last,
                         delta_cd_override=None) -> BandedFactorResult:
    """Inertia-corrected banded factorization — same perturbation schedule as
    the dense/chained paths (PDPerturbationHandler +
    block-elimination delta_c floor, see chained_kkt.py)."""
    from jax import lax
    from .linalg.block_tridiag import bcr_factorize
    dtype = it.x.dtype
    exp_pos, exp_neg = expected_inertia_banded(nlp)
    j_vals = jacobian_values(nlp, it.x)
    base_cd = (delta_cd_override if delta_cd_override is not None
               else opts.jacobian_regularization_value
               * mu ** opts.jacobian_regularization_exponent)
    delta_cd = jnp.maximum(base_cd, opts.jacobian_regularization_value)

    # One zero-delta base assembly; the retry loop only re-adds the deltas on
    # the diagonal (the million-entry scatter is the expensive part).
    zero_d = jnp.zeros((), dtype)
    K_base = assemble_banded(nlp, it, j_vals, h_vals, zero_d, zero_d)

    def factor(dxv, dcv):
        Kb = add_diag_deltas(nlp, K_base, dxv, dcv)
        from .linalg.block_tridiag import btd_cast
        fac = bcr_factorize(btd_cast(Kb, opts.factorization_dtype),
                            pivot_tol=opts.ldlt_pivot_tol,
                            equilibrate=opts.linear_system_scaling == "mc19")
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
        # Escalate delta_c on EVERY failed round (not only on singularity):
        # under an RCM ordering a y-row can be eliminated before its x
        # partners, so with huge near-bound Sigma entries in the same block
        # the elimination loses the tiny -delta_c pivots to roundoff and
        # reports wrong inertia rather than singularity; a larger dual
        # regularization is the only lever that restores quasi-definite
        # conditioning (the MA27 pivot-tolerance IncreaseQuality analog).
        new_dc = jnp.minimum(jnp.maximum(dcv * 100.0, delta_cd), 1e-2)
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
    return BandedFactorResult(fac=fac, K=Kb, delta_x=dxv, delta_c=dcv,
                              delta_w_last=new_last, failed=failed,
                              num_trials=trials)


def pack_rhs_banded(nlp: CanonicalNLP, r_x, r_s, r_c, r_d):
    """[x|s|y_c|y_d] RHS -> permuted, padded flat vector (nb*b,)."""
    info: BandedInfo = nlp.chain
    dtype = r_x.dtype
    rhs = jnp.concatenate([r_x, r_s, r_c, r_d])
    rhs_p = rhs[_ax(nlp, "perm", info.perm)]
    if info.n_pad:
        rhs_p = jnp.concatenate([rhs_p, jnp.zeros((info.n_pad,), dtype)])
    return rhs_p


def unpack_sol_banded(nlp: CanonicalNLP, sol):
    info: BandedInfo = nlp.chain
    n, mi, me = info.n, info.mi, info.me
    sol_orig = jnp.zeros((info.N,), sol.dtype).at[
        _ax(nlp, "perm", info.perm)].set(sol[:info.N])
    dx = sol_orig[:n]
    ds = sol_orig[n:n + mi]
    dy_c = sol_orig[n + mi:n + mi + me]
    dy_d = sol_orig[n + mi + me:]
    return dx, ds, dy_c, dy_d

# ---------------------------------------------------------------------------
# Nested-dissection multifrontal backend (linear_solver="multifrontal"):
# general fill-in capability for patterns whose RCM bandwidth is too wide
# for banded BCR — the MA27/MA57 multifrontal role
# (IpMa27TSolverInterface.hpp:276-297).  Same factorize -> inertia ->
# perturb contract as the banded path.
# ---------------------------------------------------------------------------

def nd_factorize_kkt(nlp: CanonicalNLP, opts: Options, it, h_vals, mu,
                     delta_w_last,
                     delta_cd_override=None) -> BandedFactorResult:
    """Inertia-corrected multifrontal factorization (PDPerturbationHandler
    schedule; delta_c floor for block-elimination safety as in the banded
    path)."""
    from jax import lax
    from .linalg.nested_dissection import (NDInfo, nd_assemble,
                                           nd_add_diag_deltas, nd_factorize)
    info: NDInfo = nlp.chain
    aux = nlp.aux_arrays
    dtype = it.x.dtype
    exp_pos, exp_neg = info.n + info.mi, info.me + info.mi
    j_vals = jacobian_values(nlp, it.x)
    base_cd = (delta_cd_override if delta_cd_override is not None
               else opts.jacobian_regularization_value
               * mu ** opts.jacobian_regularization_exponent)
    delta_cd = jnp.maximum(base_cd, opts.jacobian_regularization_value)

    zero_d = jnp.zeros((), dtype)
    K_base = nd_assemble(nlp, aux, info, it, j_vals, h_vals, zero_d, zero_d)

    def factor(dxv, dcv):
        Kf = nd_add_diag_deltas(info, aux, K_base, dxv, dcv)
        fd = opts.factorization_dtype
        Kf_fac = tuple(F.astype(jnp.dtype(fd)) for F in Kf) if fd else Kf
        fac = nd_factorize(info, aux, Kf_fac, pivot_tol=opts.ldlt_pivot_tol)
        ok = jnp.logical_and(
            jnp.logical_and(fac.num_pos == exp_pos, fac.num_neg == exp_neg),
            jnp.logical_not(fac.singular))
        return Kf, fac, ok

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
        new_dc = jnp.minimum(jnp.maximum(dcv * 100.0, delta_cd), 1e-2)
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
    return BandedFactorResult(fac=fac, K=Kb, delta_x=dxv, delta_c=dcv,
                              delta_w_last=new_last, failed=failed,
                              num_trials=trials)


def nd_solve_parts(nlp: CanonicalNLP, opts: Options, fac, K, parts):
    """solve_any contract for the multifrontal backend: concat the four RHS
    blocks ([x|s|y_c|y_d] — unknown order is identity here, no permutation),
    solve + refine, split back."""
    from .linalg.nested_dissection import NDInfo, nd_solve_refined
    info: NDInfo = nlp.chain
    rhs = jnp.concatenate(parts)
    sol, rr = nd_solve_refined(info, nlp.aux_arrays, K, fac, rhs, opts)
    n, mi, me = info.n, info.mi, info.me
    return (sol[:n], sol[n:n + mi], sol[n + mi:n + mi + me],
            sol[n + mi + me:]), rr
