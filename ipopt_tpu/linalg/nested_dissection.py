"""Nested-dissection multifrontal LDL^T for general sparse KKT systems.

This supplies the MA27/MA57 fill-in capability for patterns whose RCM
bandwidth is too wide for the banded-BCR backend (3-D PDE grids,
``/root/reference/examples/ScalableProblems/MittelmannDistCntrl3D*``; the
reference's multifrontal capability lives in
``src/Algorithm/LinearSolvers/IpMa27TSolverInterface.hpp:276-297``).

TPU-first design (no translation of any HSL code exists or is possible —
the reference links closed-source Fortran):

* Symbolic (host numpy): recursive BFS-level-set bisection of the
  augmented-system adjacency graph builds a separator tree; every tree node
  owns a *front* = its separator (eliminated here) plus its boundary
  (transitive adjacency of the subtree, a subset of ancestor separators).
* Numeric (jit, static shapes): fronts are grouped by tree depth and padded
  to uniform size, so each level is ONE batched dense partial-LDL^T —
  (n_d, f_d, f_d) blocks eliminated with the same vmapped kernels as the
  BCR path (MXU matmuls, no scalar loops).  Child Schur complements are
  extend-added into parent fronts by static precomputed scatter indices.
* Inertia comes from the pivot signs across all levels (padding pivots are
  exactly +1 and subtracted statically), preserving the reference's
  factorize -> inertia -> perturb contract (IpPDPerturbationHandler.cpp).
* The solve is two static sweeps over the levels (forward bottom-up,
  backward top-down) of batched unit-triangular solves + one scatter per
  level; iterative refinement re-uses the assembled fronts as the exact
  matvec of the regularized KKT matrix.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .block_tridiag import _dense_ldlt_block, _block_inertia_counts
from .ldlt import tri_solve_unit_lower

_I32 = np.int32


# ---------------------------------------------------------------------------
# Symbolic phase (host numpy)
# ---------------------------------------------------------------------------

def _ragged_neighbors(indptr, indices, verts):
    """All CSR neighbors of ``verts`` (with repeats) — vectorized gather."""
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros((0,), _I32)
    offs = np.repeat(starts - np.concatenate([[0], np.cumsum(counts)[:-1]]),
                     counts)
    return indices[np.arange(total, dtype=np.int64) + offs]


def _bfs_levels(indptr, indices, verts, start, member_stamp, stamp):
    """BFS levels within the vertex subset marked ``member_stamp == stamp``.
    Returns (order, levels) over reached vertices only."""
    lev = {}
    frontier = np.array([start], _I32)
    lev_arr = np.full(len(member_stamp), -1, _I32)
    lev_arr[start] = 0
    out = [frontier]
    d = 0
    while frontier.size:
        neigh = _ragged_neighbors(indptr, indices, frontier)
        neigh = neigh[(member_stamp[neigh] == stamp) & (lev_arr[neigh] < 0)]
        frontier = np.unique(neigh)
        lev_arr[frontier] = d + 1
        d += 1
        if frontier.size:
            out.append(frontier)
    reached = np.concatenate(out)
    return reached, lev_arr[reached]


@dataclasses.dataclass
class _Node:
    elim: np.ndarray          # vertices eliminated at this node
    children: Tuple[int, ...]  # node ids
    depth: int
    bd: np.ndarray = None      # boundary (sorted), filled bottom-up
    sub: np.ndarray = None     # subtree vertices (sorted)


def _dissect(indptr, indices, verts, depth, leaf_max, nodes, member_stamp,
             stamp_ctr):
    """Recursive bisection; appends postorder to ``nodes``; returns node id."""
    if len(verts) <= leaf_max:
        nodes.append(_Node(elim=np.asarray(verts, _I32), children=(),
                           depth=depth))
        return len(nodes) - 1

    stamp = stamp_ctr[0] = stamp_ctr[0] + 1
    member_stamp[verts] = stamp
    reached, lev = _bfs_levels(indptr, indices, verts, int(verts[0]),
                               member_stamp, stamp)

    if len(reached) < len(verts):
        # disconnected: bin-pack WHOLE components into two balanced halves
        # (splitting through a component would make every vertex boundary)
        comps = [reached]
        seen = np.zeros(len(member_stamp), bool)
        seen[reached] = True
        rest = verts[~seen[verts]]
        while rest.size:
            stamp = stamp_ctr[0] = stamp_ctr[0] + 1
            member_stamp[rest] = stamp
            c, _ = _bfs_levels(indptr, indices, rest, int(rest[0]),
                               member_stamp, stamp)
            comps.append(c)
            seen[c] = True
            rest = rest[~seen[rest]]
        comps.sort(key=len, reverse=True)
        binA, binB, szA, szB = [], [], 0, 0
        for c in comps:
            if szA <= szB:
                binA.append(c)
                szA += len(c)
            else:
                binB.append(c)
                szB += len(c)
        cl = _dissect(indptr, indices, np.concatenate(binA), depth + 1,
                      leaf_max, nodes, member_stamp, stamp_ctr)
        cr = _dissect(indptr, indices, np.concatenate(binB), depth + 1,
                      leaf_max, nodes, member_stamp, stamp_ctr)
        nodes.append(_Node(elim=np.zeros((0,), _I32), children=(cl, cr),
                           depth=depth))
        return len(nodes) - 1

    # pseudo-peripheral restart from a farthest vertex
    stamp = stamp_ctr[0] = stamp_ctr[0] + 1
    member_stamp[verts] = stamp
    start2 = int(reached[np.argmax(lev)])
    reached, lev = _bfs_levels(indptr, indices, verts, start2,
                               member_stamp, stamp)
    # cut at the level set containing the median vertex
    order = np.argsort(lev, kind="stable")
    cut_level = int(lev[order[len(order) // 2]])
    sep = reached[lev == cut_level]
    left = reached[lev < cut_level]
    right = reached[lev > cut_level]
    if len(left) == 0 or len(right) == 0 or len(sep) >= len(verts) // 2 + 1:
        # separator does not shrink the problem (clique-ish graph): leaf
        nodes.append(_Node(elim=np.asarray(verts, _I32), children=(),
                           depth=depth))
        return len(nodes) - 1
    cl = _dissect(indptr, indices, left, depth + 1, leaf_max, nodes,
                  member_stamp, stamp_ctr)
    cr = _dissect(indptr, indices, right, depth + 1, leaf_max, nodes,
                  member_stamp, stamp_ctr)
    nodes.append(_Node(elim=np.asarray(sep, _I32), children=(cl, cr),
                       depth=depth))
    return len(nodes) - 1


class NDLevel(NamedTuple):
    """Static per-depth batch descriptor (ints only; arrays ride in aux)."""
    n_nodes: int
    p: int      # padded eliminated-variable count per front
    u: int      # padded boundary count per front
    f: int      # p + u
    offset: int  # flat-slot offset of this level in the assembly buffer


@dataclasses.dataclass(frozen=True, eq=False)
class NDInfo:
    """Symbolic-analysis result for the nested-dissection backend, attached
    to ``CanonicalNLP.chain``.  Duck-type compatible with ``BandedInfo`` for
    the shared compressed-AD value evaluators (``sparse.jacobian_values`` /
    ``sparse_hessian_values``)."""

    n: int
    mi: int
    me: int
    N: int
    # Jacobian / Hessian COO + colorings (same contract as BandedInfo)
    j_rows: np.ndarray
    j_cols: np.ndarray
    j_colors: np.ndarray
    n_colors_j: int
    h_rows: np.ndarray
    h_cols: np.ndarray
    h_colors: np.ndarray
    n_colors_h: int
    row_unknown: np.ndarray
    # tree levels, deepest first (processing order of the factorization)
    levels: Tuple[NDLevel, ...] = ()
    total_slots: int = 0          # sum of n_d * f_d^2
    n_pad_elim: int = 0           # padding pivots (each contributes +1)
    # gather-form assembly (same trick as the banded backend)
    asm_src: np.ndarray = None    # (n_unique, kdup) value indices
    asm_inv: np.ndarray = None    # (total_slots,) -> occupied-slot index
    n_vals: int = 0
    # per-level index arrays (numpy fallbacks; device copies ride in aux):
    elim_gid: Tuple[np.ndarray, ...] = ()   # (n_d, p_d) var id, pad -> N
    bd_gid: Tuple[np.ndarray, ...] = ()     # (n_d, u_d) var id, pad -> N
    child_scatter: Tuple[np.ndarray, ...] = ()  # (n_d, u_d, u_d) flat idx
    # into the PARENT level's (n_par, f_par, f_par) buffer; pad -> OOB
    diag_kind: Tuple[np.ndarray, ...] = ()  # (n_d, p_d) int8 0=x/s 1=y 2=pad
    _resto_info: Any = None

    def _key(self):
        return (self.n, self.mi, self.me, self.N, self.levels,
                self.j_rows.tobytes(), self.j_cols.tobytes(),
                self.h_rows.tobytes(), self.h_cols.tobytes())

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, NDInfo) and self._key() == other._key()


def nd_analyze(n: int, mi: int, me: int,
               j_rows, j_cols, eq_mask, h_rows, h_cols,
               leaf_max: int = 32,
               j_colors=None, h_colors=None) -> NDInfo:
    """Pattern -> separator tree -> level-batched front layout + index maps."""
    import scipy.sparse as sp
    from ..sparse import greedy_coloring

    m = len(eq_mask)
    N = n + mi + me + mi

    eq_mask = np.asarray(eq_mask, bool)
    eq_pos = np.cumsum(eq_mask, dtype=_I32) - 1
    ineq_pos = np.cumsum(~eq_mask, dtype=_I32) - 1
    row_unknown = np.where(eq_mask, n + mi + eq_pos,
                           n + mi + me + ineq_pos).astype(_I32)

    # ---- adjacency of the augmented system -------------------------------
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
    G = (G + G.T).tocsr()     # make adjacency symmetric for BFS
    indptr = G.indptr.astype(np.int64)
    indices = G.indices.astype(_I32)

    # ---- separator tree ---------------------------------------------------
    nodes: list = []
    member_stamp = np.zeros(N, np.int64)
    _dissect(indptr, indices, np.arange(N, dtype=_I32), 0, leaf_max, nodes,
             member_stamp, [0])

    # ---- bottom-up: subtree + boundary (nodes list is postorder) ----------
    for t in nodes:
        subs = [np.sort(t.elim)]
        bds = []
        for c in t.children:
            subs.append(nodes[c].sub)
            bds.append(nodes[c].bd)
        t.sub = np.sort(np.concatenate(subs)) if subs else np.zeros((0,), _I32)
        adj_e = np.unique(_ragged_neighbors(indptr, indices, t.elim)) \
            if len(t.elim) else np.zeros((0,), _I32)
        cand = np.union1d(np.union1d(
            bds[0] if bds else np.zeros((0,), _I32),
            bds[1] if len(bds) > 1 else np.zeros((0,), _I32)), adj_e)
        t.bd = np.setdiff1d(cand, t.sub, assume_unique=False).astype(_I32)

    # ---- level batching (deepest depth first) -----------------------------
    max_depth = max(t.depth for t in nodes)
    by_depth = [[] for _ in range(max_depth + 1)]
    for tid, t in enumerate(nodes):
        by_depth[t.depth].append(tid)
    # processing order: depth = max_depth .. 0
    levels = []
    level_nodes = []        # per processing level: list of node ids
    offset = 0
    depth_to_level = {}
    for li, d in enumerate(range(max_depth, -1, -1)):
        ids = by_depth[d]
        p = max(max((len(nodes[t].elim) for t in ids), default=0), 1)
        u = max((len(nodes[t].bd) for t in ids), default=0)
        f = p + u
        levels.append(NDLevel(n_nodes=len(ids), p=p, u=u, f=f, offset=offset))
        level_nodes.append(ids)
        depth_to_level[d] = li
        offset += len(ids) * f * f
    total_slots = offset

    # ---- global elimination rank + per-vertex location --------------------
    rank = np.full(N, -1, np.int64)
    node_of = np.full(N, -1, _I32)          # node id where v is eliminated
    elim_slot = np.full(N, -1, _I32)        # slot within that node's front
    node_level = np.zeros(len(nodes), _I32)
    node_idx_in_level = np.zeros(len(nodes), _I32)
    r = 0
    for li, ids in enumerate(level_nodes):
        for k, tid in enumerate(ids):
            node_level[tid] = li
            node_idx_in_level[tid] = k
            e = nodes[tid].elim
            node_of[e] = tid
            elim_slot[e] = np.arange(len(e), dtype=_I32)
            rank[e] = r + np.arange(len(e))
            r += len(e)
    assert r == N and np.all(rank >= 0), "dissection lost vertices"

    # boundary lookup table: sorted (node_id * N + var) -> bd position
    bd_keys = []
    bd_vals = []
    for tid, t in enumerate(nodes):
        if len(t.bd):
            bd_keys.append(np.int64(tid) * N + t.bd.astype(np.int64))
            bd_vals.append(np.arange(len(t.bd), dtype=_I32))
    if bd_keys:
        bd_keys = np.concatenate(bd_keys)
        bd_vals = np.concatenate(bd_vals)
        o = np.argsort(bd_keys)
        bd_keys = bd_keys[o]
        bd_vals = bd_vals[o]
    else:
        bd_keys = np.zeros((0,), np.int64)
        bd_vals = np.zeros((0,), _I32)

    parent = np.full(len(nodes), -1, _I32)
    for pid, pt in enumerate(nodes):
        for c in pt.children:
            parent[c] = pid

    lvl_p = np.array([lv.p for lv in levels], _I32)
    lvl_f = np.array([lv.f for lv in levels], np.int64)
    lvl_off = np.array([lv.offset for lv in levels], np.int64)

    def _front_coords(ua, ub):
        """Owner node + (front position of ua, of ub) — vectorized."""
        ua = np.asarray(ua, _I32)
        ub = np.asarray(ub, _I32)
        first = np.where(rank[ua] <= rank[ub], ua, ub)
        towner = node_of[first]

        def pos_of(v):
            own = node_of[v] == towner
            key = towner.astype(np.int64) * N + v.astype(np.int64)
            j = np.searchsorted(bd_keys, key)
            j = np.minimum(j, max(len(bd_keys) - 1, 0))
            hit = len(bd_keys) > 0
            bdpos = bd_vals[j] if hit else np.zeros(len(v), _I32)
            valid = hit and True
            ok = (bd_keys[j] == key) if hit else np.zeros(len(v), bool)
            del valid
            # every non-owned endpoint MUST be in the owner's boundary
            if not np.all(own | ok):
                raise AssertionError("ND front structure violated")
            return np.where(own, elim_slot[v],
                            lvl_p[node_level[towner]] + bdpos).astype(_I32)

        return towner, pos_of(ua), pos_of(ub)

    def _slot(towner, i, j):
        li = node_level[towner]
        return (lvl_off[li]
                + node_idx_in_level[towner].astype(np.int64)
                * lvl_f[li] * lvl_f[li]
                + i.astype(np.int64) * lvl_f[li] + j.astype(np.int64))

    # ---- value-vector slot streams (order mirrors nd_assemble) -----------
    segs = []
    if len(h_rows):
        t_, pi, pj = _front_coords(np.asarray(h_rows, _I32),
                                   np.asarray(h_cols, _I32))
        segs.append(_slot(t_, pi, pj))       # oriented: full-symmetric COO
    if len(j_rows):
        ju = row_unknown[np.asarray(j_rows, _I32)]
        jx = np.asarray(j_cols, _I32)
        t_, pi, pj = _front_coords(ju, jx)
        segs.append(_slot(t_, pi, pj))
        segs.append(_slot(t_, pj, pi))       # mirror (ju != jx always)
    ux = np.arange(n, dtype=_I32)
    t_, pi, pj = _front_coords(ux, ux)
    segs.append(_slot(t_, pi, pj))           # sigma_x diagonal
    if mi:
        us = n + np.arange(mi, dtype=_I32)
        t_, pi, pj = _front_coords(us, us)
        segs.append(_slot(t_, pi, pj))       # sigma_s diagonal
        uy = n + mi + me + np.arange(mi, dtype=_I32)
        t_, pi, pj = _front_coords(us, uy)
        segs.append(_slot(t_, pi, pj))       # -1 coupling
        segs.append(_slot(t_, pj, pi))       # mirror
    uy = n + mi + np.arange(me + mi, dtype=_I32)
    t_, pi, pj = _front_coords(uy, uy)
    segs.append(_slot(t_, pi, pj))           # -delta_c diagonal

    # ---- per-level index arrays + padding-pivot slots ---------------------
    elim_gid = []
    bd_gid = []
    diag_kind = []
    child_scatter = []
    pad_slots = []
    n_pad_elim = 0
    kind_of = np.empty(N, np.int8)
    kind_of[: n + mi] = 0
    kind_of[n + mi:] = 1
    for li, (lv, ids) in enumerate(zip(levels, level_nodes)):
        eg = np.full((lv.n_nodes, lv.p), N, _I32)
        bg = np.full((lv.n_nodes, max(lv.u, 1)), N, _I32)
        dk = np.full((lv.n_nodes, lv.p), 2, np.int8)
        for k, tid in enumerate(ids):
            e = nodes[tid].elim
            eg[k, :len(e)] = e
            dk[k, :len(e)] = kind_of[e]
            b_ = nodes[tid].bd
            bg[k, :len(b_)] = b_
            # padding pivots: +1.0 on the elim diagonal
            for q in range(len(e), lv.p):
                pad_slots.append(lv.offset + k * lv.f * lv.f
                                 + q * lv.f + q)
                n_pad_elim += 1
        elim_gid.append(eg)
        bd_gid.append(bg[:, :lv.u] if lv.u else bg[:, :0])
        diag_kind.append(dk)
        # child -> parent extend-add scatter (children are at level li,
        # parents at li+1 in processing order)
        if li + 1 <= len(levels) - 1:
            plv = levels[li + 1]
            cs = np.full((lv.n_nodes, max(lv.u, 1), max(lv.u, 1)),
                         np.int64(plv.n_nodes) * plv.f * plv.f, np.int64)
            for k, tid in enumerate(ids):
                par = int(parent[tid])
                if par < 0:
                    continue
                b_ = nodes[tid].bd
                if not len(b_):
                    continue
                # position of each bd var in the parent's front
                pk = node_idx_in_level[par]
                pe = nodes[par].elim
                pos = np.empty(len(b_), np.int64)
                in_pe = np.isin(b_, pe)
                if in_pe.any():
                    pos[in_pe] = elim_slot[b_[in_pe]]
                if (~in_pe).any():
                    pos[~in_pe] = plv.p + np.searchsorted(
                        nodes[par].bd, b_[~in_pe])
                base = np.int64(pk) * plv.f * plv.f
                cs[k, :len(b_), :len(b_)] = (base
                                             + pos[:, None] * plv.f
                                             + pos[None, :])
            child_scatter.append(cs[:, :lv.u, :lv.u] if lv.u
                                 else cs[:, :0, :0])
        else:
            child_scatter.append(np.zeros((lv.n_nodes, 0, 0), np.int64))
    if pad_slots:
        segs.append(np.asarray(pad_slots, np.int64))

    # ---- gather-form assembly indices (same as the banded backend) --------
    slot = np.concatenate(segs) if segs else np.zeros((0,), np.int64)
    n_vals = len(slot)
    order = np.argsort(slot)
    ss = slot[order]
    firstm = np.ones(n_vals, bool)
    firstm[1:] = ss[1:] != ss[:-1]
    group_id = np.cumsum(firstm, dtype=np.int64) - 1
    n_unique = int(group_id[-1]) + 1 if n_vals else 0
    starts = np.flatnonzero(firstm)
    kpos = np.arange(n_vals, dtype=np.int64) - starts[group_id]
    kdup = int(kpos.max()) + 1 if n_vals else 1
    asm_src = np.full((n_unique, kdup), n_vals, np.int64)
    asm_src[group_id, kpos] = order
    asm_inv = np.full((total_slots,), n_unique, np.int64)
    asm_inv[ss[firstm]] = np.arange(n_unique, dtype=np.int64)
    # narrow to int32 when safe (always, unless fronts exceed 2^31 slots)
    if total_slots < 2**31 and n_vals < 2**31:
        asm_src = asm_src.astype(_I32)
        asm_inv = asm_inv.astype(_I32)

    # colorings
    if j_colors is None:
        j_colors = greedy_coloring(np.asarray(j_rows), np.asarray(j_cols),
                                   n, m)
    n_colors_j = int(j_colors.max()) + 1 if n and len(j_rows) else 0
    if h_colors is None:
        h_colors = greedy_coloring(np.asarray(h_rows), np.asarray(h_cols),
                                   n, n)
    n_colors_h = int(h_colors.max()) + 1 if n and len(h_rows) else 0

    return NDInfo(
        n=n, mi=mi, me=me, N=N,
        j_rows=np.asarray(j_rows, _I32), j_cols=np.asarray(j_cols, _I32),
        j_colors=j_colors, n_colors_j=max(n_colors_j, 1),
        h_rows=np.asarray(h_rows, _I32), h_cols=np.asarray(h_cols, _I32),
        h_colors=h_colors, n_colors_h=max(n_colors_h, 1),
        row_unknown=row_unknown,
        levels=tuple(levels), total_slots=total_slots,
        n_pad_elim=n_pad_elim,
        asm_src=asm_src, asm_inv=asm_inv, n_vals=n_vals,
        elim_gid=tuple(elim_gid), bd_gid=tuple(bd_gid),
        child_scatter=tuple(child_scatter), diag_kind=tuple(diag_kind))


def nd_aux(info: NDInfo):
    """Device copies of the per-solve index data (jit ARGUMENTS, not HLO
    constants — the remote-compile relay rejects oversized modules)."""
    aux = {"asm_src": jnp.asarray(info.asm_src),
           "asm_inv": jnp.asarray(info.asm_inv)}
    for li in range(len(info.levels)):
        aux[f"elim_gid{li}"] = jnp.asarray(info.elim_gid[li])
        aux[f"bd_gid{li}"] = jnp.asarray(info.bd_gid[li])
        aux[f"child_scatter{li}"] = jnp.asarray(info.child_scatter[li])
        aux[f"diag_kind{li}"] = jnp.asarray(info.diag_kind[li])
    return aux


# ---------------------------------------------------------------------------
# Numeric phase (jit; every loop below is a static python loop over levels)
# ---------------------------------------------------------------------------

class NDFactor(NamedTuple):
    L11: Tuple[Any, ...]      # per level (n_d, p, p) unit lower
    d1: Tuple[Any, ...]       # per level (n_d, p)
    L21: Tuple[Any, ...]      # per level (n_d, u, p)
    num_pos: Any
    num_neg: Any
    num_zero: Any
    singular: Any


def _safe(d):
    tiny = jnp.finfo(d.dtype).tiny
    return jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))


_vldlt = jax.vmap(_dense_ldlt_block)


def _vtri(L, B, transpose=False):
    return jax.vmap(lambda l, b: tri_solve_unit_lower(l, b,
                                                      transpose=transpose)
                    )(L, B)


def nd_assemble(nlp, aux, info: NDInfo, it, j_vals, h_vals,
                delta_x, delta_c):
    """Value vector -> per-level (n_d, f, f) front arrays (gather form)."""
    from ..kkt import sigmas
    dtype = it.x.dtype
    sig = sigmas(nlp, it)
    vals = []
    if len(info.h_rows):
        vals.append(h_vals)
    if len(info.j_rows):
        vals.append(j_vals)
        vals.append(j_vals)
    vals.append(sig.sigma_x + delta_x)
    if info.mi:
        vals.append(sig.sigma_s + delta_x)
        mones = -jnp.ones((info.mi,), dtype)
        vals.append(mones)
        vals.append(mones)
    vals.append(jnp.broadcast_to(-delta_c, (info.me + info.mi,)))
    if info.n_pad_elim:
        vals.append(jnp.ones((info.n_pad_elim,), dtype))
    v = jnp.concatenate([jnp.asarray(x, dtype).reshape(-1) for x in vals])
    v_ext = jnp.concatenate([v, jnp.zeros((1,), dtype)])
    slot_vals = jnp.sum(v_ext[aux["asm_src"]], axis=1)
    slot_ext = jnp.concatenate([slot_vals, jnp.zeros((1,), dtype)])
    flat = slot_ext[aux["asm_inv"]]
    fronts = []
    for lv in info.levels:
        seg = jax.lax.dynamic_slice_in_dim(flat, lv.offset,
                                           lv.n_nodes * lv.f * lv.f)
        fronts.append(seg.reshape(lv.n_nodes, lv.f, lv.f))
    return tuple(fronts)


def nd_add_diag_deltas(info: NDInfo, aux, fronts, delta_x, delta_c):
    out = []
    for li, (lv, F) in enumerate(zip(info.levels, fronts)):
        kind = aux[f"diag_kind{li}"]
        add = jnp.where(kind == 0, delta_x,
                        jnp.where(kind == 1, -delta_c, 0.0)
                        ).astype(F.dtype)                      # (n_d, p)
        idx = jnp.arange(lv.p)
        F = F.at[:, idx, idx].add(add)
        out.append(F)
    return tuple(out)


def nd_factorize(info: NDInfo, aux, fronts, pivot_tol: float = 0.0
                 ) -> NDFactor:
    """Level-batched partial LDL^T, deepest level first."""
    L11s, d1s, L21s = [], [], []
    num_pos = jnp.zeros((), jnp.int32)
    num_neg = jnp.zeros((), jnp.int32)
    num_zero = jnp.zeros((), jnp.int32)
    update = None
    for li, (lv, F) in enumerate(zip(info.levels, fronts)):
        if update is not None:
            plv = info.levels[li]
            flat = F.reshape(-1)
            idx = aux[f"child_scatter{li - 1}"].reshape(-1)
            flat = flat.at[idx].add(update.reshape(-1), mode="drop")
            F = flat.reshape(plv.n_nodes, plv.f, plv.f)
        p = lv.p
        F11 = F[:, :p, :p]
        L11, d1 = _vldlt(F11)
        po, ne, ze = _block_inertia_counts(d1, pivot_tol, block_axis=-1)
        num_pos, num_neg, num_zero = num_pos + po, num_neg + ne, num_zero + ze
        if lv.u:
            F12 = F[:, :p, p:]                       # (n_d, p, u)
            Y = _vtri(L11, F12)                      # L11^{-1} F12
            L21 = (Y / _safe(d1)[:, :, None]).transpose(0, 2, 1)
            U = F[:, p:, p:] - jnp.einsum("npu,npv->nuv", Y,
                                          Y / _safe(d1)[:, :, None])
        else:
            L21 = jnp.zeros((lv.n_nodes, 0, p), F.dtype)
            U = jnp.zeros((lv.n_nodes, 0, 0), F.dtype)
        L11s.append(L11)
        d1s.append(d1)
        L21s.append(L21)
        update = U
    num_pos = num_pos - jnp.asarray(info.n_pad_elim, jnp.int32)
    singular = num_zero > 0
    return NDFactor(L11=tuple(L11s), d1=tuple(d1s), L21=tuple(L21s),
                    num_pos=num_pos, num_neg=num_neg, num_zero=num_zero,
                    singular=singular)


def nd_solve(info: NDInfo, aux, fac: NDFactor, rhs):
    """(N,) solve via forward (bottom-up) / diagonal / backward (top-down)."""
    dtype = rhs.dtype
    rhs_e = jnp.concatenate([rhs, jnp.zeros((1,), dtype)])
    zs = []
    for li, lv in enumerate(info.levels):
        eg = aux[f"elim_gid{li}"]
        b1 = rhs_e[eg]                                   # (n_d, p)
        z1 = _vtri(fac.L11[li].astype(dtype), b1[:, :, None])[:, :, 0]
        zs.append(z1)
        if lv.u:
            upd = -jnp.einsum("nup,np->nu", fac.L21[li].astype(dtype), z1)
            rhs_e = rhs_e.at[aux[f"bd_gid{li}"].reshape(-1)].add(
                upd.reshape(-1))
    sol_e = jnp.zeros((info.N + 1,), dtype)
    for li in reversed(range(len(info.levels))):
        lv = info.levels[li]
        zhat = zs[li] / _safe(fac.d1[li]).astype(dtype)
        if lv.u:
            x_bd = sol_e[aux[f"bd_gid{li}"]]             # (n_d, u)
            zhat = zhat - jnp.einsum("nup,nu->np",
                                     fac.L21[li].astype(dtype), x_bd)
        x1 = _vtri(fac.L11[li].astype(dtype), zhat[:, :, None],
                   transpose=True)[:, :, 0]
        sol_e = sol_e.at[aux[f"elim_gid{li}"].reshape(-1)].set(
            x1.reshape(-1))
    return sol_e[:info.N]


def nd_matvec(info: NDInfo, aux, fronts, x):
    """K @ x using the assembled fronts (each K entry lives in exactly one
    front; padding slots read/write the dump position N)."""
    dtype = x.dtype
    x_e = jnp.concatenate([x, jnp.zeros((1,), dtype)])
    y_e = jnp.zeros((info.N + 1,), dtype)
    for li, lv in enumerate(info.levels):
        gid = jnp.concatenate([aux[f"elim_gid{li}"], aux[f"bd_gid{li}"]],
                              axis=1) if lv.u else aux[f"elim_gid{li}"]
        xf = x_e[gid]                                    # (n_d, f)
        yf = jnp.einsum("nij,nj->ni", fronts[li].astype(dtype), xf)
        y_e = y_e.at[gid.reshape(-1)].add(yf.reshape(-1))
    return y_e[:info.N]


def nd_solve_refined(info: NDInfo, aux, fronts, fac: NDFactor, rhs, opts):
    """Solve + iterative refinement against the assembled fronts (same
    contract as chained_kkt.chained_solve_refined; refinement_precision=
    'double' accumulates in f64 on the f32 TPU path)."""
    from jax import lax
    model_dt = fronts[0].dtype
    fac_dt = fac.L11[0].dtype
    precise = opts.refinement_precision == "double"
    acc_dt = jnp.float64 if precise else model_dt

    sol = nd_solve(info, aux, fac, rhs.astype(fac_dt)).astype(acc_dt)
    rhs_a = rhs.astype(acc_dt)
    fronts_a = tuple(F.astype(acc_dt) for F in fronts) if precise else fronts
    rhs_norm = jnp.maximum(jnp.max(jnp.abs(rhs_a)),
                           jnp.asarray(1e-30, acc_dt))

    def ratio(s):
        return jnp.max(jnp.abs(rhs_a - nd_matvec(info, aux, fronts_a, s))) \
            / rhs_norm

    if opts.fast_step_computation:
        return sol.astype(model_dt), jnp.zeros((), model_dt)

    def body(carry):
        i, sol, rr_prev = carry
        r = rhs_a - nd_matvec(info, aux, fronts_a, sol)
        sol = sol + nd_solve(info, aux, fac, r.astype(fac_dt)).astype(acc_dt)
        return i + 1, sol, ratio(sol)

    def cond(carry):
        i, _, rr = carry
        return jnp.logical_or(
            i < opts.min_refinement_steps,
            jnp.logical_and(i < opts.max_refinement_steps,
                            rr > opts.residual_ratio_max))

    i0 = jnp.zeros((), jnp.int32)
    _, sol, rr = lax.while_loop(cond, body, (i0, sol, ratio(sol)))
    return sol.astype(model_dt), rr.astype(model_dt)
