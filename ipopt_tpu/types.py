"""Core pytree types for the TPU-native interior-point solver.

Reference parity: the 8-block iterate layout mirrors Ipopt's ``IteratesVector``
(reference ``src/Algorithm/IpIteratesVector.hpp:25``): (x, s, y_c, y_d, z_L, z_U,
v_L, v_U).  Unlike the reference's CompoundVector-of-SmartPtr design, each block
here is a flat jnp array and the whole iterate is a NamedTuple pytree, which makes
it vmap/pjit/scan-friendly by construction.

Status codes mirror ``SolverReturn`` (reference ``src/Algorithm/IpAlgTypes.hpp``)
and ``ApplicationReturnStatus`` (``src/Interfaces/IpReturnCodes_inc.h``).
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Any

import jax.numpy as jnp


class SolverReturn(enum.IntEnum):
    """Mirrors Ipopt's SolverReturn enum (IpAlgTypes.hpp)."""

    CONTINUE = -1  # internal: not yet terminated
    SUCCESS = 0
    MAXITER_EXCEEDED = 1
    CPUTIME_EXCEEDED = 2
    WALLTIME_EXCEEDED = 3
    STOP_AT_TINY_STEP = 4
    STOP_AT_ACCEPTABLE_POINT = 5
    LOCAL_INFEASIBILITY = 6
    USER_REQUESTED_STOP = 7
    FEASIBLE_POINT_FOUND = 8
    DIVERGING_ITERATES = 9
    RESTORATION_FAILURE = 10
    ERROR_IN_STEP_COMPUTATION = 11
    INVALID_NUMBER_DETECTED = 12
    TOO_FEW_DEGREES_OF_FREEDOM = 13
    INVALID_OPTION = 14
    OUT_OF_MEMORY = 15
    INTERNAL_ERROR = 16
    UNASSIGNED = 17


class ApplicationReturnStatus(enum.IntEnum):
    """Mirrors Ipopt's ApplicationReturnStatus (IpReturnCodes_inc.h)."""

    SOLVE_SUCCEEDED = 0
    SOLVED_TO_ACCEPTABLE_LEVEL = 1
    INFEASIBLE_PROBLEM_DETECTED = 2
    SEARCH_DIRECTION_BECOMES_TOO_SMALL = 3
    DIVERGING_ITERATES = 4
    USER_REQUESTED_STOP = 5
    FEASIBLE_POINT_FOUND = 6
    MAXITER_EXCEEDED = -1
    RESTORATION_FAILED = -2
    ERROR_IN_STEP_COMPUTATION = -3
    MAXCPUTIME_EXCEEDED = -4
    MAXWALLTIME_EXCEEDED = -5
    NOT_ENOUGH_DEGREES_OF_FREEDOM = -10
    INVALID_PROBLEM_DEFINITION = -11
    INVALID_OPTION = -12
    INVALID_NUMBER_DETECTED = -13
    UNRECOVERABLE_EXCEPTION = -100
    NONIPOPT_EXCEPTION_THROWN = -101
    INSUFFICIENT_MEMORY = -102
    INTERNAL_ERROR = -199


SOLVER_TO_APP_STATUS = {
    SolverReturn.SUCCESS: ApplicationReturnStatus.SOLVE_SUCCEEDED,
    SolverReturn.MAXITER_EXCEEDED: ApplicationReturnStatus.MAXITER_EXCEEDED,
    SolverReturn.CPUTIME_EXCEEDED: ApplicationReturnStatus.MAXCPUTIME_EXCEEDED,
    SolverReturn.WALLTIME_EXCEEDED: ApplicationReturnStatus.MAXWALLTIME_EXCEEDED,
    SolverReturn.STOP_AT_TINY_STEP: ApplicationReturnStatus.SEARCH_DIRECTION_BECOMES_TOO_SMALL,
    SolverReturn.STOP_AT_ACCEPTABLE_POINT: ApplicationReturnStatus.SOLVED_TO_ACCEPTABLE_LEVEL,
    SolverReturn.LOCAL_INFEASIBILITY: ApplicationReturnStatus.INFEASIBLE_PROBLEM_DETECTED,
    SolverReturn.USER_REQUESTED_STOP: ApplicationReturnStatus.USER_REQUESTED_STOP,
    SolverReturn.FEASIBLE_POINT_FOUND: ApplicationReturnStatus.FEASIBLE_POINT_FOUND,
    SolverReturn.DIVERGING_ITERATES: ApplicationReturnStatus.DIVERGING_ITERATES,
    SolverReturn.RESTORATION_FAILURE: ApplicationReturnStatus.RESTORATION_FAILED,
    SolverReturn.ERROR_IN_STEP_COMPUTATION: ApplicationReturnStatus.ERROR_IN_STEP_COMPUTATION,
    SolverReturn.INVALID_NUMBER_DETECTED: ApplicationReturnStatus.INVALID_NUMBER_DETECTED,
    SolverReturn.TOO_FEW_DEGREES_OF_FREEDOM: ApplicationReturnStatus.NOT_ENOUGH_DEGREES_OF_FREEDOM,
    SolverReturn.INVALID_OPTION: ApplicationReturnStatus.INVALID_OPTION,
    SolverReturn.OUT_OF_MEMORY: ApplicationReturnStatus.INSUFFICIENT_MEMORY,
    SolverReturn.INTERNAL_ERROR: ApplicationReturnStatus.INTERNAL_ERROR,
}


class Iterate(NamedTuple):
    """Primal-dual iterate: the 8-block layout of IpIteratesVector.hpp:25.

    Shapes: x (n,), s (mi,), y_c (me,), y_d (mi,), z_L/z_U (n,), v_L/v_U (mi,).
    Bound multipliers are stored dense with zeros where the corresponding bound
    is infinite (the reference stores only the compressed finite-bound entries
    via ExpansionMatrix; dense-with-mask is the vectorized equivalent).
    """

    x: Any
    s: Any
    y_c: Any
    y_d: Any
    z_L: Any
    z_U: Any
    v_L: Any
    v_U: Any

    def astype(self, dtype):
        return Iterate(*(jnp.asarray(v, dtype) for v in self))


class KKTResiduals(NamedTuple):
    """Raw (un-condensed) KKT residuals of the barrier problem.

    grad_lag_x : ∇f + Jc^T y_c + Jd^T y_d - z_L + z_U          (n,)
    grad_lag_s : -y_d - v_L + v_U                               (mi,)
    c          : equality constraint values                      (me,)
    d_minus_s  : d(x) - s                                        (mi,)
    compl_x_L  : (x - x_L) * z_L - mu   (0 where no bound)       (n,)
    compl_x_U  : (x_U - x) * z_U - mu                            (n,)
    compl_s_L  : (s - d_L) * v_L - mu                            (mi,)
    compl_s_U  : (d_U - s) * v_U - mu                            (mi,)
    """

    grad_lag_x: Any
    grad_lag_s: Any
    c: Any
    d_minus_s: Any
    compl_x_L: Any
    compl_x_U: Any
    compl_s_L: Any
    compl_s_U: Any
