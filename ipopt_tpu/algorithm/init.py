"""Iterate initialization.

Reference parity: ``DefaultIterateInitializer``
(``src/Algorithm/IpDefaultIterateInitializer.cpp:113-346,473-600``):
- push x0 inside bounds with margin p_L = min(bound_push*max(1,|x_L|),
  bound_frac*(x_U-x_L)) for two-sided bounds, else bound_push*max(1,|x_L|);
- s0 = d(x0) pushed the same way with slack_bound_push/frac;
- z_L = z_U = v_L = v_U = bound_mult_init_val (or mu-based);
- y_c, y_d from a least-squares solve of the dual feasibility conditions,
  zeroed when ||y||_inf > constr_mult_init_max (least_square_mults,
  ``IpDefaultIterateInitializer.cpp:334-346``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..types import Iterate
from ..problem import CanonicalNLP
from ..options import Options


def push_inside(v, lo, hi, has_lo, has_hi, push, frac):
    """The push_variables logic (IpDefaultIterateInitializer.cpp:473)."""
    two = has_lo & has_hi
    width = jnp.where(two, hi - lo, 1.0)
    p_lo = jnp.where(has_lo,
                     jnp.where(two,
                               jnp.minimum(push * jnp.maximum(1.0, jnp.abs(lo)),
                                           frac * width),
                               push * jnp.maximum(1.0, jnp.abs(lo))),
                     0.0)
    p_hi = jnp.where(has_hi,
                     jnp.where(two,
                               jnp.minimum(push * jnp.maximum(1.0, jnp.abs(hi)),
                                           frac * width),
                               push * jnp.maximum(1.0, jnp.abs(hi))),
                     0.0)
    out = jnp.where(has_lo, jnp.maximum(v, lo + p_lo), v)
    out = jnp.where(has_hi, jnp.minimum(out, hi - p_hi), out)
    # If bounds cross after pushing (tiny interval), fall back to midpoint.
    mid_ok = jnp.logical_or(~two, lo + p_lo <= hi - p_hi)
    out = jnp.where(mid_ok, out, 0.5 * (lo + hi))
    return out


def least_squares_y(nlp: CanonicalNLP, x, s, grad_f, J_c, J_d, z_L, z_U,
                    v_L, v_U, y_max):
    """Least-squares equality multipliers: minimize over (y_c, y_d)

        || grad_f + J_c^T y_c + J_d^T y_d - z_L + z_U ||^2
      + ||            - y_d            - v_L + v_U ||^2

    (LeastSquareMultipliers via the aug system in the reference,
    ``IpLeastSquareMults.cpp``; dense normal-equations here).  If
    ||y||_inf > constr_mult_init_max, reset to zero (least_square_mults).
    """
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = x.dtype
    if me + mi == 0:
        return jnp.zeros((0,), dtype), jnp.zeros((0,), dtype)
    # A has rows [x-block; s-block], columns [y_c, y_d].
    A = jnp.zeros((n + mi, me + mi), dtype)
    A = A.at[:n, :me].set(J_c.T)
    A = A.at[:n, me:].set(J_d.T)
    A = A.at[n:, me:].set(-jnp.eye(mi, dtype=dtype))
    b = jnp.concatenate([grad_f - z_L + z_U, -v_L + v_U])
    # Solve min ||A y + b|| via normal equations with tiny Tikhonov for rank
    # deficiency (the reference's aug-system solve handles this via inertia).
    AtA = A.T @ A + 1e-12 * jnp.eye(me + mi, dtype=dtype)
    from ..linalg.ldlt import dense_solve
    y = dense_solve(AtA, -(A.T @ b))
    too_big = jnp.max(jnp.abs(y), initial=0.0) > y_max
    y = jnp.where(too_big, jnp.zeros_like(y), y)
    return y[:me], y[me:]


def least_squares_primal_x(nlp: CanonicalNLP, x0):
    """least_square_init_primal (IpDefaultIterateInitializer.cpp:200-222,
    349-395): the min-norm (x, s) satisfying the constraints linearized at
    x0 — the aug-system solve with W = 0, D = I — negated.  The reference
    then recomputes s from d(x) anyway (:239), so only x is used.  Falls
    back to x0 when the normal system is singular (retval false path)."""
    n, mi = nlp.n, nlp.mi
    dtype = x0.dtype
    J_c = nlp.eval_jac_c(x0)
    J_d = nlp.eval_jac_d(x0)
    cv = nlp.eval_c(x0)
    dv = nlp.eval_d(x0)
    m = cv.shape[0] + dv.shape[0]
    A = jnp.zeros((m, n + mi), dtype)
    A = A.at[:cv.shape[0], :n].set(J_c)
    A = A.at[cv.shape[0]:, :n].set(J_d)
    A = A.at[cv.shape[0]:, n:].set(-jnp.eye(mi, dtype=dtype))
    b = jnp.concatenate([cv, dv])
    from ..linalg.ldlt import dense_solve
    AAt = A @ A.T + 1e-12 * jnp.eye(m, dtype=dtype)
    sol = A.T @ dense_solve(AAt, b)
    x_ls = -sol[:n]
    ok = jnp.all(jnp.isfinite(x_ls))
    return jnp.where(ok, x_ls, x0)


def least_squares_duals(nlp: CanonicalNLP, x, grad_f, J_c, J_d):
    """least_square_init_duals (IpDefaultIterateInitializer.cpp:299-345,
    397-474): solve the aug system with W = 0, D_x = -(#bounds per row),
    deltas 0, rhs = (grad_f, 0, 0, 0); extract z_L = -sol_x, z_U = +sol_x
    (per bounded side), v_L = -sol_s, v_U = +sol_s, y = -sol_y.  Returns
    (ok, z_L, z_U, v_L, v_U, y_c, y_d); ok False on a singular system."""
    n, mi, me = nlp.n, nlp.mi, nlp.me
    dtype = x.dtype
    N = n + mi + me + mi
    kx = (nlp.has_xL.astype(dtype) + nlp.has_xU.astype(dtype))
    ks = (nlp.has_dL.astype(dtype) + nlp.has_dU.astype(dtype))
    K = jnp.zeros((N, N), dtype)
    K = K.at[jnp.arange(n), jnp.arange(n)].set(-kx)
    K = K.at[n + jnp.arange(mi), n + jnp.arange(mi)].set(-ks)
    r0 = n + mi
    K = K.at[r0:r0 + me, :n].set(J_c)
    K = K.at[:n, r0:r0 + me].set(J_c.T)
    K = K.at[r0 + me:, :n].set(J_d)
    K = K.at[:n, r0 + me:].set(J_d.T)
    K = K.at[r0 + me:, n:n + mi].set(-jnp.eye(mi, dtype=dtype))
    K = K.at[n:n + mi, r0 + me:].set(-jnp.eye(mi, dtype=dtype))
    rhs = jnp.concatenate([grad_f, jnp.zeros((N - n,), dtype)])
    from ..linalg.ldlt import dense_solve
    sol = dense_solve(K + 1e-12 * jnp.eye(N, dtype=dtype), rhs)
    sol_x, sol_s = sol[:n], sol[n:n + mi]
    y_c, y_d = -sol[r0:r0 + me], -sol[r0 + me:]
    ok = jnp.all(jnp.isfinite(sol))
    z_L = jnp.where(nlp.has_xL, -sol_x, 0.0)
    z_U = jnp.where(nlp.has_xU, sol_x, 0.0)
    v_L = jnp.where(nlp.has_dL, -sol_s, 0.0)
    v_U = jnp.where(nlp.has_dU, sol_s, 0.0)
    return ok, z_L, z_U, v_L, v_U, y_c, y_d


def default_initialize(nlp: CanonicalNLP, opts: Options, x0=None) -> Iterate:
    dtype = nlp.x0.dtype
    x = nlp.x0 if x0 is None else jnp.asarray(x0, dtype)
    if (opts.least_square_init_primal and getattr(nlp, "chain", None) is None
            and nlp.struct.me + nlp.struct.mi > 0):
        x = least_squares_primal_x(nlp, x)
    x = push_inside(x, nlp.x_L, nlp.x_U, nlp.has_xL, nlp.has_xU,
                    opts.bound_push, opts.bound_frac)
    d0 = nlp.eval_d(x)
    s = push_inside(d0, nlp.d_L, nlp.d_U, nlp.has_dL, nlp.has_dU,
                    opts.slack_bound_push, opts.slack_bound_frac)

    if opts.bound_mult_init_method == "mu-based":
        sl_xL = jnp.where(nlp.has_xL, x - nlp.x_L, 1.0)
        sl_xU = jnp.where(nlp.has_xU, nlp.x_U - x, 1.0)
        sl_sL = jnp.where(nlp.has_dL, s - nlp.d_L, 1.0)
        sl_sU = jnp.where(nlp.has_dU, nlp.d_U - s, 1.0)
        z_L = jnp.where(nlp.has_xL, opts.mu_init / sl_xL, 0.0)
        z_U = jnp.where(nlp.has_xU, opts.mu_init / sl_xU, 0.0)
        v_L = jnp.where(nlp.has_dL, opts.mu_init / sl_sL, 0.0)
        v_U = jnp.where(nlp.has_dU, opts.mu_init / sl_sU, 0.0)
    else:
        val = opts.bound_mult_init_val
        z_L = jnp.where(nlp.has_xL, val, 0.0).astype(dtype)
        z_U = jnp.where(nlp.has_xU, val, 0.0).astype(dtype)
        v_L = jnp.where(nlp.has_dL, val, 0.0).astype(dtype)
        v_U = jnp.where(nlp.has_dU, val, 0.0).astype(dtype)

    if getattr(nlp, "chain", None) is not None:
        # Structured backends skip the dense least-squares multiplier estimate
        # (a structured lsq via the BTD system is a later refinement); Ipopt's
        # fallback when ||y_lsq|| > constr_mult_init_max is y = 0 anyway.
        y_c = jnp.zeros((nlp.struct.me,), x.dtype)
        y_d = jnp.zeros((nlp.struct.mi,), x.dtype)
    else:
        grad_f = nlp.eval_grad_f(x)
        J_c = nlp.eval_jac_c(x)
        J_d = nlp.eval_jac_d(x)
        if opts.least_square_init_duals and nlp.struct.me + nlp.struct.mi > 0:
            # least_square_init_duals: ALL duals from one aug solve; bound
            # multipliers floored at bound_mult_init_val on success
            # (IpDefaultIterateInitializer.cpp:299-345).
            ok, zL2, zU2, vL2, vU2, y_c2, y_d2 = least_squares_duals(
                nlp, x, grad_f, J_c, J_d)
            z_L = jnp.where(jnp.logical_and(ok, nlp.has_xL),
                            jnp.maximum(zL2, z_L), z_L)
            z_U = jnp.where(jnp.logical_and(ok, nlp.has_xU),
                            jnp.maximum(zU2, z_U), z_U)
            v_L = jnp.where(jnp.logical_and(ok, nlp.has_dL),
                            jnp.maximum(vL2, v_L), v_L)
            v_U = jnp.where(jnp.logical_and(ok, nlp.has_dU),
                            jnp.maximum(vU2, v_U), v_U)
            y_c_ls, y_d_ls = least_squares_y(
                nlp, x, s, grad_f, J_c, J_d, z_L, z_U, v_L, v_U,
                opts.constr_mult_init_max)
            y_c = jnp.where(ok, y_c2, y_c_ls)
            y_d = jnp.where(ok, y_d2, y_d_ls)
        else:
            y_c, y_d = least_squares_y(nlp, x, s, grad_f, J_c, J_d, z_L, z_U,
                                       v_L, v_U, opts.constr_mult_init_max)
    return Iterate(x=x, s=s, y_c=y_c, y_d=y_d, z_L=z_L, z_U=z_U,
                   v_L=v_L, v_U=v_U)


def warm_start_initialize(nlp: CanonicalNLP, opts: Options, it0: Iterate) -> Iterate:
    """WarmStartIterateInitializer (IpWarmStartIterateInitializer.cpp:31-129):
    push the user point with the (smaller) warm-start pushes; clip multipliers."""
    x = push_inside(it0.x, nlp.x_L, nlp.x_U, nlp.has_xL, nlp.has_xU,
                    opts.warm_start_bound_push, opts.warm_start_bound_frac)
    d0 = nlp.eval_d(x)
    s = it0.s if opts.warm_start_entire_iterate else d0
    s = push_inside(s, nlp.d_L, nlp.d_U, nlp.has_dL, nlp.has_dU,
                    opts.warm_start_slack_bound_push, opts.warm_start_slack_bound_frac)
    mp = opts.warm_start_mult_bound_push
    mmax = opts.warm_start_mult_init_max

    def clip_mult(z, has):
        z = jnp.clip(z, mp, mmax)
        return jnp.where(has, z, 0.0)

    return Iterate(
        x=x, s=s,
        y_c=jnp.clip(it0.y_c, -mmax, mmax),
        y_d=jnp.clip(it0.y_d, -mmax, mmax),
        z_L=clip_mult(it0.z_L, nlp.has_xL), z_U=clip_mult(it0.z_U, nlp.has_xU),
        v_L=clip_mult(it0.v_L, nlp.has_dL), v_U=clip_mult(it0.v_U, nlp.has_dU))
