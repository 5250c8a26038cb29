"""Convergence check: OptimalityErrorConvergenceCheck equivalent
(``src/Algorithm/IpOptErrorConvCheck.cpp:146-280``).

Order of checks (CheckConvergence):
1. E_0(x) <= tol  AND  unscaled dual/primal/compl below their individual tols
   -> CONVERGED
2. acceptable-point heuristic: acceptable_iter consecutive iterates with
   E_0 <= acceptable_tol (+ individual acceptable tols) -> STOP_AT_ACCEPTABLE
3. iter_count >= max_iter -> MAXITER_EXCEEDED
4. ||x||_inf > diverging_iterates_tol -> DIVERGING_ITERATES
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..options import Options
from ..types import SolverReturn


class ConvergenceInfo(NamedTuple):
    status: jnp.ndarray            # int32 SolverReturn (CONTINUE if none)
    acceptable_count: jnp.ndarray  # updated consecutive-acceptable counter
    E_scaled: jnp.ndarray          # E_0 with s_d/s_c scaling


def check_convergence(opts: Options, iter_count, acceptable_count,
                      E, dual_inf, primal_inf, compl_inf, x_norm_inf,
                      obj_change_rel=None) -> ConvergenceInfo:
    converged = jnp.logical_and(
        E <= opts.tol,
        jnp.logical_and(
            dual_inf <= opts.dual_inf_tol,
            jnp.logical_and(primal_inf <= opts.constr_viol_tol,
                            compl_inf <= opts.compl_inf_tol)))

    acceptable = jnp.logical_and(
        E <= opts.acceptable_tol,
        jnp.logical_and(
            dual_inf <= opts.acceptable_dual_inf_tol,
            jnp.logical_and(primal_inf <= opts.acceptable_constr_viol_tol,
                            compl_inf <= opts.acceptable_compl_inf_tol)))
    if obj_change_rel is not None:
        # acceptable_obj_change_tol (IpOptErrorConvCheck.cpp:221-235):
        # |f_k - f_{k-1}| / max(1, |f_k|) must also be below the tolerance
        # (default 1e20 keeps this vacuous).
        acceptable = jnp.logical_and(
            acceptable, obj_change_rel <= opts.acceptable_obj_change_tol)
    acceptable_count = jnp.where(acceptable, acceptable_count + 1,
                                 jnp.zeros_like(acceptable_count))
    acceptable_stop = jnp.logical_and(opts.acceptable_iter > 0,
                                      acceptable_count >= opts.acceptable_iter)

    maxiter = iter_count >= opts.max_iter
    diverging = x_norm_inf > opts.diverging_iterates_tol

    status = jnp.full((), int(SolverReturn.CONTINUE), jnp.int32)
    status = jnp.where(diverging, int(SolverReturn.DIVERGING_ITERATES), status)
    status = jnp.where(maxiter, int(SolverReturn.MAXITER_EXCEEDED), status)
    status = jnp.where(acceptable_stop,
                       int(SolverReturn.STOP_AT_ACCEPTABLE_POINT), status)
    status = jnp.where(converged, int(SolverReturn.SUCCESS), status)
    return ConvergenceInfo(status=status, acceptable_count=acceptable_count,
                           E_scaled=E)
