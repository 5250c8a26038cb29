"""Explicitly distributed chain-axis factorization of BTD KKT systems.

This is the MUMPS-over-MPI role of the reference (SURVEY §2.9) done the TPU
way: a Schur domain decomposition (the block-tridiagonal "SPIKE" scheme)
over a named mesh axis via ``shard_map`` with explicit collectives.

Design (and why not per-level ppermute): block cyclic reduction needs a
neighbor exchange at every one of its log2(nb) levels; on a ring that is
log2(nb) latency-bound ppermute rounds for ever-shrinking payloads.  The
Schur scheme needs exactly ONE collective per factorize and one per solve:

  1. each device eliminates the interior of its contiguous chunk of the
     block chain with the existing lane-minor BCR kernel (fully local,
     MXU-resident — the layout/sharding conflict flagged in the r3 verdict
     dissolves because the lane-minor chain axis inside a shard is the
     *local* chain, never the mesh axis);
  2. the resulting 2x2-block Schur complements (the chunk's two boundary
     blocks) are all-gathered — (4 b^2 + b) floats per device, riding ICI —
     and the reduced (2P, b) block-tridiagonal system is factored/solved
     REDUNDANTLY on every device (cheaper than communicating it back);
  3. the interior back-substitution is again fully local.

Inertia is exact by the Haynsworth inertia-additivity theorem:
inertia(K) = sum_p inertia(A_II^p) (psum over the mesh) + inertia(reduced).
Comms volume per factorize: all_gather of (2x2 Schur + coupling) =
5 b^2 f32 per device; per solve: all_gather of 2 b f32.  Compare a
replicated BCR factorize: everything everywhere (nb b^2).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
from jax import lax

from ..linalg.block_tridiag import (BTDMatrix, BCRFactor, bcr_factorize,
                                    bcr_solve)


class ChainShardFactor(NamedTuple):
    """Per-shard factorization state (lives inside the shard_map scope)."""
    interior: BCRFactor        # local interior BCR factorization (k-2 blocks)
    X1: Any                    # (k-2, b, b) interior^{-1} C1 (first-boundary)
    X2: Any                    # (k-2, b, b) interior^{-1} C2 (last-boundary)
    reduced: BCRFactor         # (2P, b) boundary system (replicated)
    sub0: Any                  # (b, b) coupling interior<->first (scaled)
    subl: Any                  # (b, b) coupling last<->interior (scaled)
    dscale: Any                # (k, b) local Ruiz scale (ones if disabled)
    num_pos: Any
    num_neg: Any
    num_zero: Any
    singular: Any


def _multi_solve(fac: BCRFactor, B):
    """bcr_solve with a (nb*b, r) block of right-hand sides."""
    return jax.vmap(lambda col: bcr_solve(fac, col),
                    in_axes=1, out_axes=1)(B)


def shard_factorize(K_local: BTDMatrix, axis_name: str,
                    equilibrate: bool = False,
                    pivot_tol: float = 0.0) -> ChainShardFactor:
    """Factorize inside shard_map: ``K_local`` is this device's contiguous
    (k, b, b) chunk; ``sub[k-1]`` couples the next chunk's first block to our
    last (zero on the final device).  Requires k >= 3.

    ``equilibrate`` applies a per-chunk symmetric Ruiz scale (the MC19
    analog): the global matrix becomes D K D with D = concat of local
    scales, so the inertia is congruence-invariant and exact; the
    cross-chunk coupling is made consistent by exchanging the neighbor's
    first-block scale through the same all_gather that carries the Schur
    blocks.  In f32 the chunk-interior elimination otherwise loses the tiny
    +-delta pivots to roundoff against the O(1/mu) Sigma entries."""
    from ..linalg.block_tridiag import btd_ruiz_scale, btd_apply_scale
    k, b = K_local.nb, K_local.b
    assert k >= 3, "chain sharding needs >= 3 blocks per device"
    dtype = K_local.diag.dtype
    P = lax.psum(1, axis_name)
    p_idx = lax.axis_index(axis_name)

    if equilibrate:
        # scale from the chunk with the cross-chunk coupling masked out
        K_in = BTDMatrix(diag=K_local.diag,
                         sub=K_local.sub.at[k - 1].set(0.0))
        dsc = btd_ruiz_scale(K_in)                       # (k, b)
        K_s = btd_apply_scale(K_in, dsc)
        # neighbor's first-block scale, for the cross coupling E_p:
        # E_p^s = d_first^{p+1} E_p d_last^{p}
        d_first_all = lax.all_gather(dsc[0], axis_name)  # (P, b)
        d_first_next = d_first_all[(p_idx + 1) % P]
        E_s = (d_first_next[:, None] * K_local.sub[k - 1]
               * dsc[k - 1][None, :])
        diag = K_s.diag
        sub = K_s.sub.at[k - 1].set(E_s)
    else:
        dsc = jnp.ones((k, b), dtype)
        diag, sub = K_local.diag, K_local.sub
    # interior chunk: blocks 1..k-2; its last sub entry would couple the
    # boundary block k-1 — masked out of the interior matrix
    sub_i = sub[1:k - 1].at[k - 3].set(jnp.zeros((b, b), dtype))
    interior = bcr_factorize(BTDMatrix(diag=diag[1:k - 1], sub=sub_i),
                             pivot_tol=pivot_tol)

    # spikes: interior^{-1} applied to the two boundary coupling columns.
    # A(block1, block0) = sub[0] (sub[i] couples block i+1 to i);
    # A(block k-2, block k-1) = sub[k-2]^T.
    C1 = jnp.zeros(((k - 2) * b, b), dtype).at[:b, :].set(sub[0])
    C2 = jnp.zeros(((k - 2) * b, b), dtype).at[-b:, :].set(sub[k - 2].T)
    X1 = _multi_solve(interior, C1)
    X2 = _multi_solve(interior, C2)

    # 2x2 block Schur complement on (first, last): S = A_BB - C^T A_II^{-1} C
    S11 = diag[0] - sub[0].T @ X1[:b, :]
    S22 = diag[k - 1] - sub[k - 2] @ X2[-b:, :]
    S21 = -sub[k - 2] @ X1[-b:, :]          # A(last, first) fill-in

    # ONE all_gather of the tiny boundary data; the reduced (2P, b)
    # block-tridiagonal is then factored redundantly on every device
    gathered = lax.all_gather((S11, S22, S21, sub[k - 1]), axis_name)
    g11, g22, g21, gE = gathered            # each (P, b, b)
    red_diag = jnp.stack([g11, g22], axis=1).reshape(2 * P, b, b)
    # sub[i] couples reduced block i+1 to i: [S21_p, E_p] alternating
    red_sub = jnp.stack([g21, gE], axis=1).reshape(2 * P, b, b)
    reduced = bcr_factorize(BTDMatrix(diag=red_diag, sub=red_sub),
                            pivot_tol=pivot_tol)

    num_pos = lax.psum(interior.num_pos, axis_name) + reduced.num_pos
    num_neg = lax.psum(interior.num_neg, axis_name) + reduced.num_neg
    num_zero = lax.psum(interior.num_zero, axis_name) + reduced.num_zero
    del p_idx
    return ChainShardFactor(interior=interior, X1=X1, X2=X2, reduced=reduced,
                            sub0=sub[0], subl=sub[k - 2], dscale=dsc,
                            num_pos=num_pos, num_neg=num_neg,
                            num_zero=num_zero, singular=num_zero > 0)


def shard_solve(fac: ChainShardFactor, rhs_local, axis_name: str):
    """Solve inside shard_map: ``rhs_local`` is this device's (k*b,) chunk."""
    b = fac.sub0.shape[0]
    k = rhs_local.shape[0] // b
    p_idx = lax.axis_index(axis_name)
    # solve D K D y = D r, return x = D y (no-op when unequilibrated)
    R = rhs_local.reshape(k, b) * fac.dscale

    w_I = bcr_solve(fac.interior, R[1:k - 1].reshape(-1)).reshape(k - 2, b)
    r_f = R[0] - fac.sub0.T @ w_I[0]
    r_l = R[k - 1] - fac.subl @ w_I[k - 3]

    # ONE all_gather of the boundary rhs; redundant reduced solve
    gf, gl = lax.all_gather((r_f, r_l), axis_name)        # (P, b) each
    red_rhs = jnp.stack([gf, gl], axis=1).reshape(-1)      # (2P*b,)
    xr = bcr_solve(fac.reduced, red_rhs).reshape(-1, b)
    x_f = xr[2 * p_idx]
    x_l = xr[2 * p_idx + 1]

    x_I = (w_I.reshape(-1) - fac.X1 @ x_f - fac.X2 @ x_l).reshape(k - 2, b)
    y = jnp.concatenate([x_f[None], x_I, x_l[None]], axis=0)
    return (y * fac.dscale).reshape(-1)


# ---------------------------------------------------------------------------
# Whole-array entry points (wrap shard_map over an explicit mesh)
# ---------------------------------------------------------------------------

# Ambient mesh for the chained backend (Options stays a hashable static
# arg, so the mesh itself is registered out-of-band, like the custom-KKT
# hook registry).
_CHAIN_MESH = {"mesh": None, "axis": "chain"}


def set_chain_mesh(mesh, axis: str = "chain"):
    """Register the mesh/axis that ``Options(chain_shard=True)`` uses."""
    _CHAIN_MESH["mesh"] = mesh
    _CHAIN_MESH["axis"] = axis


def _lead1(tree):
    """Give every leaf a leading length-1 axis (the local shard), so EVERY
    shard_map output rides a plain P(axis) spec.  Replicated P() out-specs
    with check_rep=False miscompile under lax control flow (observed on the
    CPU backend: identical inputs give different counts inside while_loop),
    so no spec here ever omits the mesh axis."""
    return jax.tree.map(lambda a: a[None], tree)


def _unlead(tree):
    return jax.tree.map(lambda a: a[0], tree)


def dist_factorize(K: BTDMatrix) -> ChainShardFactor:
    """Distributed factorize of a (replicated or sharded) BTD matrix over
    the registered chain mesh.  Returns a ChainShardFactor whose solve-state
    leaves are stitched with a leading (n_devices,) shard axis and whose
    inertia counts are plain scalars."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    mesh, axis = _CHAIN_MESH["mesh"], _CHAIN_MESH["axis"]
    assert mesh is not None, "set_chain_mesh(mesh) before chain_shard=True"
    nP = mesh.shape[axis]
    assert K.nb % nP == 0 and K.nb // nP >= 3, (K.nb, nP)

    def body(diag, sub):
        f = shard_factorize(BTDMatrix(diag=diag, sub=sub), axis)
        state = (f.interior, f.X1, f.X2, f.reduced, f.sub0, f.subl,
                 f.dscale)
        counts = (f.num_pos, f.num_neg, f.num_zero, f.singular)
        return _lead1((state, counts))

    state, counts = shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis), check_rep=False)(K.diag, K.sub)
    # counts are psum-replicated: every shard carries the same value
    num_pos, num_neg, num_zero, singular = (c[0] for c in counts)
    interior, X1, X2, reduced, sub0, subl, dscale = state
    return ChainShardFactor(interior=interior, X1=X1, X2=X2, reduced=reduced,
                            sub0=sub0, subl=subl, dscale=dscale,
                            num_pos=num_pos, num_neg=num_neg,
                            num_zero=num_zero, singular=singular)


def dist_factorize_retry(K0: BTDMatrix, diag_kind, opts, delta_cd,
                         delta_w_last, exp_pos: int, exp_neg: int):
    """Assemble-once inertia-corrected distributed factorization.

    The WHOLE perturbation retry loop (PDPerturbationHandler schedule, same
    formulas as chained_factorize_kkt) runs INSIDE one shard_map: the
    while_loop condition is replicated (identical on every device), the
    collectives sit inside the loop body — the standard manual-SPMD pattern.
    (Calling shard_map from inside a lax.while_loop instead miscompiles on
    the CPU backend: identical inputs returned different inertia counts.)

    ``K0`` is the zero-delta base assembly; ``diag_kind`` is (nb, b) int8
    (0 = +delta_x, 1 = -delta_c, 2 = untouched dummy/pad) so each retry
    re-adds the deltas on the local diagonal instead of re-assembling.
    Returns (fac, delta_x, delta_c, trials, ok, gave_up).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    mesh, axis = _CHAIN_MESH["mesh"], _CHAIN_MESH["axis"]
    assert mesh is not None, "set_chain_mesh(mesh) before chain_shard=True"
    nP = mesh.shape[axis]
    assert K0.nb % nP == 0 and K0.nb // nP >= 3, (K0.nb, nP)
    b = K0.b
    k_loc = K0.nb // nP
    dtype = K0.diag.dtype

    # Inputs enter REPLICATED (P() in-specs) and each device slices its own
    # chunk: letting GSPMD backward-propagate a dim-0 sharding onto the
    # scatter-assembled K corrupts the assembly when it sits under lax
    # control flow (XLA:CPU partitioner bug, verified by direct-vs-in-cond
    # comparison of the assembled matrix — diff 1.0 at a dummy slot).
    def body(diag_f, sub_f, kind_f, dcd, dwl):
        p = lax.axis_index(axis)
        diag0 = lax.dynamic_slice_in_dim(diag_f, p * k_loc, k_loc)
        sub0 = lax.dynamic_slice_in_dim(sub_f, p * k_loc, k_loc)
        kind = lax.dynamic_slice_in_dim(kind_f, p * k_loc, k_loc)
        eye_b = jnp.eye(b, dtype=dtype)

        # equilibrate in f32 unconditionally (and under mc19): the chunk
        # fronts mix O(1/mu) Sigmas with the tiny +-delta pivots, which the
        # f32 elimination otherwise loses to roundoff (wrong inertia, retry
        # spiral) — verified on LuksanVlcek1 f32 at dx=1e-4
        equil = (opts.linear_system_scaling == "mc19"
                 or dtype == jnp.float32)

        def factor(dxv, dcv):
            add = jnp.where(kind == 0, dxv,
                            jnp.where(kind == 1, -dcv, 0.0)).astype(dtype)
            diag = diag0 + add[:, :, None] * eye_b[None]
            f = shard_factorize(BTDMatrix(diag=diag, sub=sub0), axis,
                                equilibrate=equil,
                                pivot_tol=opts.ldlt_pivot_tol)
            return f

        zero = jnp.zeros((), dtype)
        dc0 = dcd * jnp.ones((), dtype)
        fac0 = factor(zero, dc0)

        def cond(carry):
            trial, dxv, dcv, fac, gave_up = carry
            return jnp.logical_and(
                jnp.logical_not(jnp.logical_or(_okc(fac), gave_up)),
                trial < opts.max_inertia_correction_rounds)

        def _okc(fac):
            return jnp.logical_and(
                jnp.logical_and(fac.num_pos == exp_pos,
                                fac.num_neg == exp_neg),
                jnp.logical_not(fac.singular))

        def loop_body(carry):
            trial, dxv, dcv, fac, gave_up = carry
            was_singular = fac.singular
            only_dc = jnp.logical_and(was_singular, dcv <= dcd)
            new_dc = jnp.where(was_singular,
                               jnp.minimum(jnp.maximum(dcv * 100.0, dcd),
                                           1e-4),
                               dcv)
            first_try = (dxv == 0)
            start_val = jnp.where(dwl == 0,
                                  opts.first_hessian_perturbation,
                                  jnp.maximum(opts.min_hessian_perturbation,
                                              dwl * opts.perturb_dec_fact))
            inc_fact = jnp.where(dwl == 0, opts.perturb_inc_fact_first,
                                 opts.perturb_inc_fact)
            bumped = jnp.where(first_try, start_val, dxv * inc_fact)
            new_dx = jnp.where(only_dc, dxv, bumped)
            gave_up = new_dx > opts.max_hessian_perturbation
            fac = factor(new_dx, new_dc)
            return trial + 1, new_dx, new_dc, fac, gave_up

        trials, dxv, dcv, fac, gave_up = jax.lax.while_loop(
            cond, loop_body,
            (jnp.ones((), jnp.int32), zero, dc0, fac0,
             jnp.zeros((), bool)))
        ok = _okc(fac)
        state = (fac.interior, fac.X1, fac.X2, fac.reduced, fac.sub0,
                 fac.subl, fac.dscale)
        scalars = (fac.num_pos, fac.num_neg, fac.num_zero, fac.singular,
                   dxv, dcv, trials, ok, gave_up)
        return _lead1((state, scalars))

    state, scalars = shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(axis), check_rep=False)(
        K0.diag, K0.sub, diag_kind,
        delta_cd.astype(dtype), delta_w_last.astype(dtype))
    num_pos, num_neg, num_zero, singular, dxv, dcv, trials, ok, gave_up = (
        s[0] for s in scalars)
    interior, X1, X2, reduced, sub0, subl, dscale = state
    fac = ChainShardFactor(interior=interior, X1=X1, X2=X2, reduced=reduced,
                           sub0=sub0, subl=subl, dscale=dscale,
                           num_pos=num_pos, num_neg=num_neg,
                           num_zero=num_zero, singular=singular)
    return fac, dxv, dcv, trials, ok, gave_up


def dist_solve(fac: ChainShardFactor, rhs):
    """Distributed solve with a ``dist_factorize`` result; rhs is the full
    (nb*b,) vector."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    mesh, axis = _CHAIN_MESH["mesh"], _CHAIN_MESH["axis"]
    b = fac.sub0.shape[-1]
    state = (fac.interior, fac.X1, fac.X2, fac.reduced, fac.sub0, fac.subl,
             fac.dscale)

    nP = mesh.shape[axis]
    n_tot = rhs.reshape(-1).shape[0]
    k_loc = n_tot // (nP * b)

    # rhs enters replicated and is sliced locally (same partitioner-bug
    # rationale as dist_factorize_retry: the rhs is scatter-packed inside
    # the IPM loop and must not be backward-sharded by GSPMD)
    def body(st, r_full):
        interior, X1, X2, reduced, sub0, subl, dscale = _unlead(st)
        f = ChainShardFactor(interior=interior, X1=X1, X2=X2,
                             reduced=reduced, sub0=sub0, subl=subl,
                             dscale=dscale, num_pos=None, num_neg=None,
                             num_zero=None, singular=None)
        p = lax.axis_index(axis)
        r = lax.dynamic_slice_in_dim(r_full, p * k_loc * b, k_loc * b)
        return shard_solve(f, r, axis).reshape(-1, b)

    out = shard_map(body, mesh=mesh, in_specs=(P(axis), P()),
                    out_specs=P(axis), check_rep=False)(
        state, rhs.reshape(-1))
    # replicate the solution before it re-enters auto-partitioned code (the
    # downstream line-search scatters must not inherit a dim-0 sharding)
    from jax.sharding import NamedSharding
    out = jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(None, None)))
    return out.reshape(-1)

def sharded_btd_factorize_solve(K: BTDMatrix, rhs, mesh, axis: str = "chain"):
    """Factorize + solve a replicated BTD system distributed over
    ``mesh[axis]``: shards the chain axis, returns (x, num_pos, num_neg,
    num_zero).  nb must be divisible by the axis size with >= 3 blocks per
    device."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    nP = mesh.shape[axis]
    assert K.nb % nP == 0 and K.nb // nP >= 3, (K.nb, nP)

    def body(diag, sub, r):
        f = shard_factorize(BTDMatrix(diag=diag, sub=sub), axis)
        x = shard_solve(f, r.reshape(-1), axis)
        return (x.reshape(-1, K.b), f.num_pos, f.num_neg, f.num_zero)

    # check_rep=False: the BCR kernels' fori_loop carries mix device-varying
    # and replicated arrays, which the VMA tracker cannot type; correctness
    # is asserted by the multi-device equality test instead
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=(P(axis), P(), P(), P()),
                   check_rep=False)
    x, po, ne, ze = fn(K.diag, K.sub, rhs.reshape(K.nb, K.b))
    return x.reshape(-1), po, ne, ze
