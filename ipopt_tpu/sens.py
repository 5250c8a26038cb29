"""NLP sensitivity — the sIPOPT equivalent (contrib/sIPOPT/src/).

The reference computes fast approximate solutions for perturbed parameters
and reduced Hessians by Schur-complement solves on the saved KKT factorization
(``SensApplication.hpp:26-183``, ``DenseGenSchurDriver``, ``IndexPCalculator``).

TPU-native design: parameters are first-class here (``CanonicalNLP.params``),
so sensitivity is implicit differentiation of the KKT conditions:

    F(w; p) = 0   at the solution  =>   K . dw = -dF/dp . dp

with K the augmented KKT matrix at the solution (the same object the last IPM
iteration factorized) and dF/dp obtained by one JVP through the parametric
residual — no hand-derived derivative matrices.  Each parameter direction
costs one extra backsolve on the existing factorization, exactly like the
reference's Schur backsolves.

Provided operations:
- ``sensitivity_step``: dw/dp . dp for a given parameter perturbation
  (sIPOPT's ``sens_*`` suffixes / fast perturbed-solution update).
- ``perturbed_solution``: first-order corrected primal-dual point for new
  parameter values.
- ``reduced_hessian``: Schur complement of the KKT on selected variables
  (sIPOPT's ``compute_red_hessian``).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp

from .types import Iterate
from .problem import CanonicalNLP
from .options import Options
from . import kkt
from .kkt import evaluate, condensed_rhs_parts
from .algorithm.step import factorize_any, solve_any, direction_from_parts


class SensitivityResult(NamedTuple):
    dx: Any
    ds: Any
    dy_c: Any
    dy_d: Any
    dz_L: Any
    dz_U: Any
    dv_L: Any
    dv_U: Any


def _residual_parts(nlp: CanonicalNLP, opts: Options, it: Iterate, mu):
    """The 4 condensed KKT residual blocks as a function of nlp.params."""
    ev = evaluate(nlp, it.x)
    return condensed_rhs_parts(nlp, it, ev, mu, opts.kappa_d)


def _factorize_at(nlp: CanonicalNLP, opts: Options, it: Iterate, mu):
    from .algorithm.step import compute_hessian
    ev = evaluate(nlp, it.x)
    hess = compute_hessian(nlp, it)
    zero = jnp.zeros((), it.x.dtype)
    return factorize_any(nlp, opts, it, ev, hess, mu, zero)


def sensitivity_step(nlp: CanonicalNLP, opts: Options, it: Iterate,
                     dparams, mu=0.0) -> SensitivityResult:
    """dw for the parameter perturbation ``dparams`` (same pytree structure as
    ``nlp.params``).  ``it`` is the converged iterate."""
    mu = jnp.asarray(mu, it.x.dtype)

    def F(params):
        return _residual_parts(nlp._replace(params=params), opts, it, mu)

    # parts are already the NEGATED residuals (-r); d(-r)/dp . dp is exactly
    # the right-hand side of K dw = -dr/dp dp.
    _, dparts = jax.jvp(F, (nlp.params,), (dparams,))

    fr = _factorize_at(nlp, opts, it, mu)
    xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
    dx, ds, dy_c, dy_d = xsplit

    # Bound-multiplier sensitivities from the eliminated complementarity rows:
    # (x - x_L) z = mu  =>  dz = -z/(x-x_L) dx  (and sign-flipped for upper).
    sl_xL, sl_xU, sl_sL, sl_sU = kkt.slacks(nlp, it)
    dz_L = jnp.where(nlp.has_xL, -it.z_L / sl_xL * dx, 0.0)
    dz_U = jnp.where(nlp.has_xU, it.z_U / sl_xU * dx, 0.0)
    dv_L = jnp.where(nlp.has_dL, -it.v_L / sl_sL * ds, 0.0)
    dv_U = jnp.where(nlp.has_dU, it.v_U / sl_sU * ds, 0.0)
    return SensitivityResult(dx=dx, ds=ds, dy_c=dy_c, dy_d=dy_d,
                             dz_L=dz_L, dz_U=dz_U, dv_L=dv_L, dv_U=dv_U)


def perturbed_solution(nlp: CanonicalNLP, opts: Options, it: Iterate,
                       new_params, mu=0.0) -> Iterate:
    """First-order corrected solution for new parameter values (sIPOPT's
    fast update; a subsequent warm-started solve polishes it)."""
    dparams = jax.tree.map(lambda a, b: b - a, nlp.params, new_params)
    sr = sensitivity_step(nlp, opts, it, dparams, mu)
    return Iterate(
        x=it.x + sr.dx, s=it.s + sr.ds,
        y_c=it.y_c + sr.dy_c, y_d=it.y_d + sr.dy_d,
        z_L=it.z_L + sr.dz_L, z_U=it.z_U + sr.dz_U,
        v_L=it.v_L + sr.dv_L, v_U=it.v_U + sr.dv_U)


class BoundcheckResult(NamedTuple):
    """sensitivity_step_boundcheck output: the corrected step plus the
    active-set diagnostics (sens_boundcheck, SensStdStepCalc.cpp:92-260)."""
    step: SensitivityResult
    n_fixed: Any          # number of bound activations corrected
    fixed_idx: Any        # (cap,) x-indices pinned to their bound (-1 pad)
    max_violation: Any    # residual bound violation after correction


def sensitivity_step_boundcheck(nlp: CanonicalNLP, opts: Options, it: Iterate,
                                dparams, mu=0.0, bound_eps: float = 1e-3,
                                cap: int = 16, rounds: int = 2
                                ) -> BoundcheckResult:
    """Sensitivity step with bound-activity detection
    (``sens_boundcheck``/``sens_bound_eps``, SensStdStepCalc.cpp:42,92-260):
    when the predicted point x + dx violates a variable bound by more than
    ``bound_eps``, the violated coordinates are pinned to their bounds by a
    bordered-KKT correction

        [K  E'][dw]   [rhs]          S = E K^-1 E',
        [E  0 ][dl] = [du ]   via    dl = S^-1 (E dw0 - du),  dw = dw0 - B dl

    solved on the SAME saved factorization (E = unit rows of the violated
    x coordinates; fixed capacity ``cap`` with masking keeps it jittable;
    ``rounds`` re-detection sweeps mirror the reference's while loop)."""
    mu = jnp.asarray(mu, it.x.dtype)
    dtype = it.x.dtype
    n, mi, me = nlp.n, nlp.mi, nlp.me
    cap = min(cap, n)

    def F(params):
        return _residual_parts(nlp._replace(params=params), opts, it, mu)

    _, dparts = jax.jvp(F, (nlp.params,), (dparams,))
    fr = _factorize_at(nlp, opts, it, mu)
    xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
    dw = jnp.concatenate(xsplit)

    def kinv_ex(i):
        """K^-1 e_i for an x unit vector (one backsolve per active bound)."""
        e_x = jnp.zeros((n,), dtype).at[i].set(1.0)
        parts = (e_x, jnp.zeros((mi,), dtype), jnp.zeros((me,), dtype),
                 jnp.zeros((mi,), dtype))
        sp, _ = solve_any(nlp, opts, fr.fac, fr.K, parts)
        return jnp.concatenate(sp)

    fixed_idx = jnp.full((cap,), -1, jnp.int32)
    n_fixed = jnp.zeros((), jnp.int32)
    for _ in range(rounds):
        x_pred = it.x + dw[:n]
        viol_L = jnp.where(nlp.has_xL, nlp.x_L - x_pred, -jnp.inf)
        viol_U = jnp.where(nlp.has_xU, x_pred - nlp.x_U, -jnp.inf)
        viol = jnp.maximum(viol_L, viol_U)
        target = jnp.where(viol_L >= viol_U, nlp.x_L, nlp.x_U)
        vals, idx = jax.lax.top_k(viol, cap)
        active = vals > bound_eps
        # B = K^-1 E' columns for the (masked) active set
        B = jax.vmap(kinv_ex)(idx)                       # (cap, N)
        S = B[:, :n][:, idx].T * 0.5 + B[:, :n][:, idx] * 0.5  # (cap, cap)
        S = jnp.where(jnp.outer(active, active), S,
                      jnp.eye(cap, dtype=dtype))
        du = jnp.where(active, target[idx] - x_pred[idx], 0.0)
        # E dw0 already folded into du's reference point (x_pred)
        dl = jnp.linalg.solve(S, -du)
        dw = dw - B.T @ jnp.where(active, dl, 0.0)
        fixed_idx = jnp.where(jnp.arange(cap) < jnp.sum(active),
                              idx, fixed_idx)
        n_fixed = jnp.maximum(n_fixed, jnp.sum(active).astype(jnp.int32))

    dx = dw[:n]
    ds = dw[n:n + mi]
    dy_c = dw[n + mi:n + mi + me]
    dy_d = dw[n + mi + me:]
    sl_xL, sl_xU, sl_sL, sl_sU = kkt.slacks(nlp, it)
    dz_L = jnp.where(nlp.has_xL, -it.z_L / sl_xL * dx, 0.0)
    dz_U = jnp.where(nlp.has_xU, it.z_U / sl_xU * dx, 0.0)
    dv_L = jnp.where(nlp.has_dL, -it.v_L / sl_sL * ds, 0.0)
    dv_U = jnp.where(nlp.has_dU, it.v_U / sl_sU * ds, 0.0)
    x_pred = it.x + dx
    resid = jnp.maximum(
        jnp.max(jnp.where(nlp.has_xL, nlp.x_L - x_pred, -jnp.inf),
                initial=-jnp.inf),
        jnp.max(jnp.where(nlp.has_xU, x_pred - nlp.x_U, -jnp.inf),
                initial=-jnp.inf))
    return BoundcheckResult(
        step=SensitivityResult(dx=dx, ds=ds, dy_c=dy_c, dy_d=dy_d,
                               dz_L=dz_L, dz_U=dz_U, dv_L=dv_L, dv_U=dv_U),
        n_fixed=n_fixed, fixed_idx=fixed_idx, max_violation=resid)


def sensitivity_step_rhs(nlp: CanonicalNLP, opts: Options, it: Iterate,
                         d_crhs, mu=0.0) -> SensitivityResult:
    """Sensitivity w.r.t. the equality right-hand side (the AMPL sIPOPT
    protocol: parameters are variables pinned by ``sens_init_constr``
    equality rows whose rhs moves to ``sens_state_value_1`` —
    SensAmplTNLP / SensBuilder.cpp:88-140).  ``d_crhs`` is (me,) in eq-row
    order, user units."""
    mu = jnp.asarray(mu, it.x.dtype)

    def F(c_rhs):
        return _residual_parts(nlp._replace(c_rhs=c_rhs), opts, it, mu)

    _, dparts = jax.jvp(F, (nlp.c_rhs,), (jnp.asarray(d_crhs,
                                                      nlp.c_rhs.dtype),))
    fr = _factorize_at(nlp, opts, it, mu)
    xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
    dx, ds, dy_c, dy_d = xsplit
    sl_xL, sl_xU, sl_sL, sl_sU = kkt.slacks(nlp, it)
    dz_L = jnp.where(nlp.has_xL, -it.z_L / sl_xL * dx, 0.0)
    dz_U = jnp.where(nlp.has_xU, it.z_U / sl_xU * dx, 0.0)
    dv_L = jnp.where(nlp.has_dL, -it.v_L / sl_sL * ds, 0.0)
    dv_U = jnp.where(nlp.has_dU, it.v_U / sl_sU * ds, 0.0)
    return SensitivityResult(dx=dx, ds=ds, dy_c=dy_c, dy_d=dy_d,
                             dz_L=dz_L, dz_U=dz_U, dv_L=dv_L, dv_U=dv_U)


def perturbed_solution_rhs(nlp: CanonicalNLP, opts: Options, it: Iterate,
                           new_crhs, mu=0.0, n_steps: int = 1,
                           boundcheck: bool = False,
                           bound_eps: float = 1e-3) -> Iterate:
    """First-order corrected primal-dual point for a new equality rhs
    (the sens_sol_state_1 estimate).  ``n_steps`` > 1 follows a linear
    rhs schedule with one backsolve per step (n_sens_steps,
    SensAlgorithm.cpp:173); ``boundcheck`` pins bound-violating
    coordinates by the bordered-KKT correction (sens_boundcheck)."""
    new_crhs = jnp.asarray(new_crhs, nlp.c_rhs.dtype)
    cur = it
    cur_nlp = nlp
    for k in range(max(n_steps, 1)):
        frac = (k + 1) / max(n_steps, 1)
        target = nlp.c_rhs + frac * (new_crhs - nlp.c_rhs)
        d = target - cur_nlp.c_rhs
        if boundcheck:
            # reuse the param-space boundcheck machinery via an rhs wrapper
            sr = _rhs_boundcheck(cur_nlp, opts, cur, d, mu, bound_eps)
        else:
            sr = sensitivity_step_rhs(cur_nlp, opts, cur, d, mu)
        cur = Iterate(
            x=cur.x + sr.dx, s=cur.s + sr.ds,
            y_c=cur.y_c + sr.dy_c, y_d=cur.y_d + sr.dy_d,
            z_L=cur.z_L + sr.dz_L, z_U=cur.z_U + sr.dz_U,
            v_L=cur.v_L + sr.dv_L, v_U=cur.v_U + sr.dv_U)
        cur_nlp = cur_nlp._replace(c_rhs=target)
    return cur


def _rhs_boundcheck(nlp: CanonicalNLP, opts: Options, it: Iterate, d_crhs,
                    mu, bound_eps) -> SensitivityResult:
    """sensitivity_step_boundcheck with the rhs tangent instead of params."""
    mu = jnp.asarray(mu, it.x.dtype)
    dtype = it.x.dtype
    n, mi, me = nlp.n, nlp.mi, nlp.me

    def F(c_rhs):
        return _residual_parts(nlp._replace(c_rhs=c_rhs), opts, it, mu)

    _, dparts = jax.jvp(F, (nlp.c_rhs,),
                        (jnp.asarray(d_crhs, nlp.c_rhs.dtype),))
    fr = _factorize_at(nlp, opts, it, mu)
    xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
    dw = jnp.concatenate(xsplit)
    cap = min(16, n)

    def kinv_ex(i):
        e_x = jnp.zeros((n,), dtype).at[i].set(1.0)
        parts = (e_x, jnp.zeros((mi,), dtype), jnp.zeros((me,), dtype),
                 jnp.zeros((mi,), dtype))
        sp, _ = solve_any(nlp, opts, fr.fac, fr.K, parts)
        return jnp.concatenate(sp)

    for _ in range(2):
        x_pred = it.x + dw[:n]
        viol_L = jnp.where(nlp.has_xL, nlp.x_L - x_pred, -jnp.inf)
        viol_U = jnp.where(nlp.has_xU, x_pred - nlp.x_U, -jnp.inf)
        viol = jnp.maximum(viol_L, viol_U)
        target = jnp.where(viol_L >= viol_U, nlp.x_L, nlp.x_U)
        vals, idx = jax.lax.top_k(viol, cap)
        active = vals > bound_eps
        B = jax.vmap(kinv_ex)(idx)
        S = B[:, :n][:, idx].T * 0.5 + B[:, :n][:, idx] * 0.5
        S = jnp.where(jnp.outer(active, active), S,
                      jnp.eye(cap, dtype=dtype))
        du = jnp.where(active, target[idx] - x_pred[idx], 0.0)
        dl = jnp.linalg.solve(S, -du)
        dw = dw - B.T @ jnp.where(active, dl, 0.0)

    dx, ds = dw[:n], dw[n:n + mi]
    dy_c = dw[n + mi:n + mi + me]
    dy_d = dw[n + mi + me:]
    sl_xL, sl_xU, sl_sL, sl_sU = kkt.slacks(nlp, it)
    dz_L = jnp.where(nlp.has_xL, -it.z_L / sl_xL * dx, 0.0)
    dz_U = jnp.where(nlp.has_xU, it.z_U / sl_xU * dx, 0.0)
    dv_L = jnp.where(nlp.has_dL, -it.v_L / sl_sL * ds, 0.0)
    dv_U = jnp.where(nlp.has_dU, it.v_U / sl_sU * ds, 0.0)
    return SensitivityResult(dx=dx, ds=ds, dy_c=dy_c, dy_d=dy_d,
                             dz_L=dz_L, dz_U=dz_U, dv_L=dv_L, dv_U=dv_U)


def sensitivity_path(nlp: CanonicalNLP, opts: Options, it: Iterate,
                     param_schedule, mu=0.0) -> Iterate:
    """Multi-step sensitivity (``n_sens_steps``, SensAlgorithm.cpp:173):
    follow a SEQUENCE of parameter values with one Schur backsolve per
    step on the same saved factorization, re-evaluating the parametric
    residual at each intermediate predicted point (first-order
    path-following — the reference's repeated SchurDriver steps)."""
    mu = jnp.asarray(mu, it.x.dtype)
    fr = _factorize_at(nlp, opts, it, mu)
    cur_it = it
    cur_params = nlp.params
    for new_params in param_schedule:
        dparams = jax.tree.map(lambda a, b: b - a, cur_params, new_params)

        def F(params, _it=cur_it):
            ev = evaluate(nlp._replace(params=params), _it.x)
            return condensed_rhs_parts(nlp._replace(params=params), _it, ev,
                                       mu, opts.kappa_d)

        _, dparts = jax.jvp(F, (cur_params,), (dparams,))
        xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, dparts)
        dx, ds, dy_c, dy_d = xsplit
        sl_xL, sl_xU, sl_sL, sl_sU = kkt.slacks(nlp, cur_it)
        cur_it = Iterate(
            x=cur_it.x + dx, s=cur_it.s + ds,
            y_c=cur_it.y_c + dy_c, y_d=cur_it.y_d + dy_d,
            z_L=cur_it.z_L + jnp.where(nlp.has_xL,
                                       -cur_it.z_L / sl_xL * dx, 0.0),
            z_U=cur_it.z_U + jnp.where(nlp.has_xU,
                                       cur_it.z_U / sl_xU * dx, 0.0),
            v_L=cur_it.v_L + jnp.where(nlp.has_dL,
                                       -cur_it.v_L / sl_sL * ds, 0.0),
            v_U=cur_it.v_U + jnp.where(nlp.has_dU,
                                       cur_it.v_U / sl_sU * ds, 0.0))
        cur_params = new_params
    return cur_it


def reduced_hessian(nlp: CanonicalNLP, opts: Options, it: Iterate,
                    var_indices, mu=0.0):
    """Reduced Hessian w.r.t. the selected variables (sIPOPT
    ``compute_red_hessian``, SensApplication.cpp): the inverse of the
    (var, var) block of K^{-1} — i.e. the Schur complement of the remaining
    unknowns onto the selected ones."""
    mu = jnp.asarray(mu, it.x.dtype)
    idx = jnp.asarray(var_indices)
    k = idx.shape[0]
    fr = _factorize_at(nlp, opts, it, mu)

    mi, me = nlp.struct.mi, nlp.struct.me

    def col(i):
        e_x = jnp.zeros((nlp.n,), it.x.dtype).at[idx[i]].set(1.0)
        parts = (e_x, jnp.zeros((mi,), it.x.dtype),
                 jnp.zeros((me,), it.x.dtype), jnp.zeros((mi,), it.x.dtype))
        xsplit, _ = solve_any(nlp, opts, fr.fac, fr.K, parts)
        return xsplit[0][idx]

    S = jax.vmap(col)(jnp.arange(k))  # (k, k): rows = K^{-1} columns projected
    return jnp.linalg.inv(0.5 * (S + S.T))
