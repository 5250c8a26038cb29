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
