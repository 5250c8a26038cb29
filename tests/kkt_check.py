"""Solver-independent KKT certification of a SolveResult.

Recomputes stationarity / feasibility / complementarity directly from the
user-level problem functions with fresh autodiff — shares no code path with
the solver's internal residuals, so a pass certifies the answer, not the
implementation's self-consistency.
"""
import numpy as np
import jax
import jax.numpy as jnp


def verify_kkt(nlp, res, tol=1e-6):
    """nlp: user NLP spec (ipopt_tpu.NLP); res: SolveResult."""
    x = jnp.asarray(res.x)
    n = x.shape[0]

    def wrap(fn):
        if nlp.params is not None:
            return lambda xx: fn(xx, nlp.params)
        return fn

    f = wrap(nlp.f)
    grad = jax.grad(f)(x)

    lag_grad = np.asarray(grad, dtype=float).copy()
    viol = 0.0
    compl_err = 0.0

    if nlp.g is not None:
        g_fn = wrap(nlp.g)
        gval = np.asarray(g_fn(x), dtype=float)
        J = np.asarray(jax.jacfwd(g_fn)(x), dtype=float)
        y = np.asarray(res.y, dtype=float)
        m = gval.shape[0]
        g_L = np.broadcast_to(np.asarray(
            nlp.g_L if nlp.g_L is not None else -np.inf, float), (m,))
        g_U = np.broadcast_to(np.asarray(
            nlp.g_U if nlp.g_U is not None else np.inf, float), (m,))
        g_L = np.where(g_L <= -1e19, -np.inf, g_L)
        g_U = np.where(g_U >= 1e19, np.inf, g_U)
        lag_grad += J.T @ y
        viol = max(viol, float(np.max(np.maximum(g_L - gval, 0), initial=0)))
        viol = max(viol, float(np.max(np.maximum(gval - g_U, 0), initial=0)))
        # complementarity: y_i must vanish unless a g-bound is active
        for i in range(m):
            if g_L[i] == g_U[i]:
                continue  # equality: any sign
            dist = min(gval[i] - g_L[i] if np.isfinite(g_L[i]) else np.inf,
                       g_U[i] - gval[i] if np.isfinite(g_U[i]) else np.inf)
            compl_err = max(compl_err, abs(y[i]) * max(dist, 0.0))

    x_L = np.broadcast_to(np.asarray(
        nlp.x_L if nlp.x_L is not None else -np.inf, float), (n,))
    x_U = np.broadcast_to(np.asarray(
        nlp.x_U if nlp.x_U is not None else np.inf, float), (n,))
    x_L = np.where(x_L <= -1e19, -np.inf, x_L)
    x_U = np.where(x_U >= 1e19, np.inf, x_U)
    z_L = np.asarray(res.z_L, dtype=float)
    z_U = np.asarray(res.z_U, dtype=float)
    lag_grad += -z_L + z_U
    xn = np.asarray(x, dtype=float)
    viol = max(viol, float(np.max(np.maximum(x_L - xn, 0), initial=0)))
    viol = max(viol, float(np.max(np.maximum(xn - x_U, 0), initial=0)))
    for i in range(n):
        if np.isfinite(x_L[i]):
            compl_err = max(compl_err, z_L[i] * max(xn[i] - x_L[i], 0))
        if np.isfinite(x_U[i]):
            compl_err = max(compl_err, z_U[i] * max(x_U[i] - xn[i], 0))

    stat = float(np.max(np.abs(lag_grad)))
    # scale stationarity by multiplier magnitude (Ipopt's s_d convention)
    scale = max(1.0, float(np.mean(np.abs(np.concatenate(
        [np.atleast_1d(np.asarray(res.y, float)), z_L, z_U])))) / 100.0)
    assert stat / scale <= tol, f"stationarity {stat} (scale {scale})"
    assert viol <= tol, f"feasibility violation {viol}"
    assert compl_err <= max(tol * 100, 1e-5), f"complementarity {compl_err}"
    return stat, viol, compl_err
