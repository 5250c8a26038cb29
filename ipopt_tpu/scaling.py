"""NLP scaling strategies.

Reference parity: ``GradientScaling`` (``src/Algorithm/IpGradientScaling.cpp:19-63``):
scale the objective and each constraint so the max gradient component at x0 is
at most ``nlp_scaling_max_gradient``:

    df   = max_grad / max(max_grad, ||grad f(x0)||_inf)
    dc_i = max_grad / max(max_grad, ||grad c_i(x0)||_inf)

(scaling factors are <= 1, floored at ``nlp_scaling_min_value``), plus
``NoNLPScaling`` and ``UserScaling`` (from the NLP's own factors).  The scaled
problem is what the algorithm sees; SolveResult unscales (finalize()).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .options import Options


def grad_scale_factor(norm, opts: Options, target: float):
    """Gradient-based scale factor (IpGradientScaling.cpp:104-125): cap mode
    (factor <= 1 bringing the max gradient to nlp_scaling_max_gradient) or,
    when a positive target is set, exact targeting target/norm."""
    cap = jnp.where(norm > opts.nlp_scaling_max_gradient,
                    opts.nlp_scaling_max_gradient / norm, 1.0)
    tgt = jnp.where(norm > 0, target / jnp.where(norm > 0, norm, 1.0), 1.0)
    d = tgt if target > 0 else cap
    return jnp.maximum(d, opts.nlp_scaling_min_value)


def compute_scaling(cnlp, opts: Options):
    """Fill the obj_scale/c_scale/d_scale fields of a CanonicalNLP."""
    if opts.nlp_scaling_method == "none":
        return cnlp
    if opts.nlp_scaling_method == "user-scaling":
        # User factors arrive via obj_scaling_factor (others via future
        # NLP metadata); obj_scaling_factor < 0 flips to maximization.
        return cnlp._replace(
            obj_scale=jnp.asarray(opts.obj_scaling_factor, cnlp.x0.dtype))
    if opts.nlp_scaling_method == "equilibration-based":
        return _equilibration_scaling(cnlp, opts)

    # gradient-based (the default)
    max_grad = opts.nlp_scaling_max_gradient
    min_val = opts.nlp_scaling_min_value
    x0 = cnlp.x0
    dtype = x0.dtype

    gf = jax.grad(lambda x: cnlp.f(cnlp.x_full(x), cnlp.params))(x0)
    gnorm = jnp.max(jnp.abs(gf), initial=0.0)
    df = grad_scale_factor(gnorm, opts,
                           opts.nlp_scaling_obj_target_gradient)
    df = df * opts.obj_scaling_factor

    me, mi = cnlp.struct.me, cnlp.struct.mi
    c_scale = jnp.ones((me,), dtype)
    d_scale = jnp.ones((mi,), dtype)
    if me + mi > 0:
        def graw(x):
            return cnlp.g(cnlp.x_full(x), cnlp.params)
        J = jax.jacfwd(graw)(x0)          # (m, n_full-free? no: n) rows in g order
        row_norm = jnp.max(jnp.abs(J), axis=1, initial=0.0)
        dg = grad_scale_factor(row_norm, opts,
                               opts.nlp_scaling_constr_target_gradient)
        if me:
            c_scale = dg[jnp.asarray(cnlp.struct.eq_idx)]
        if mi:
            d_scale = dg[jnp.asarray(cnlp.struct.ineq_idx)]

    # Scaling the inequality rows rescales their bounds too.
    return cnlp._replace(
        obj_scale=jnp.asarray(df, dtype),
        c_scale=c_scale.astype(dtype),
        d_scale=d_scale.astype(dtype),
        d_L=cnlp.d_L * d_scale,
        d_U=cnlp.d_U * d_scale)


def _equilibration_scaling(cnlp, opts: Options):
    """Equilibration-based scaling — the MC19 analog (EquilibrationScaling,
    src/Algorithm/IpEquilibrationScaling.cpp): scale constraint rows and
    variables so the [grad_f; J] matrix has rows/columns of comparable
    magnitude.  Implemented as Ruiz iteration (sqrt of inf-norms) on the
    dense [grad_f; J] stack at x0; variable scaling is folded into the row
    scaling only (variable-space scaling changes the user's x and is left to
    a later round, as nlp_scaling in the reference also primarily rescales
    f and g)."""
    import jax
    import jax.numpy as jnp
    x0 = cnlp.x0
    dtype = x0.dtype
    min_val = opts.nlp_scaling_min_value

    gf = jax.grad(lambda x: cnlp.f(cnlp.x_full(x), cnlp.params))(x0)
    rows = [gf[None, :]]
    if cnlp.struct.m:
        J = jax.jacfwd(lambda x: cnlp.g(cnlp.x_full(x), cnlp.params))(x0)
        rows.append(J)
    M = jnp.concatenate(rows, axis=0)

    # Two Ruiz sweeps of row equilibration.
    r = jnp.ones((M.shape[0],), dtype)
    for _ in range(2):
        rn = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(M * r[:, None]), axis=1),
                                  1e-30))
        r = r / rn
    r = jnp.clip(r, min_val, 1.0 / min_val)

    df = r[0] * opts.obj_scaling_factor
    me, mi = cnlp.struct.me, cnlp.struct.mi
    c_scale = cnlp.c_scale
    d_scale = cnlp.d_scale
    if cnlp.struct.m:
        dg = r[1:]
        if me:
            c_scale = dg[jnp.asarray(cnlp.struct.eq_idx)]
        if mi:
            d_scale = dg[jnp.asarray(cnlp.struct.ineq_idx)]
    return cnlp._replace(
        obj_scale=jnp.asarray(df, dtype),
        c_scale=c_scale.astype(dtype), d_scale=d_scale.astype(dtype),
        d_L=cnlp.d_L * d_scale, d_U=cnlp.d_U * d_scale)
