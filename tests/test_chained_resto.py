"""Chained-backend restoration phase tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import SolverReturn, Options, ChainedNLP, solve


def infeasible_chain():
    """Inconsistent chained equalities: x_k + x_{k+1} = 1 and x_k + x_{k+1} = -1."""
    def f_stage(xk, xk1, th):
        return jnp.sum(xk ** 2)

    def g_stage(xk, xk1, th):
        ssum = xk[0] + xk1[0]
        return jnp.array([ssum - 1.0, ssum + 1.0])

    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage,
        x0=np.zeros((4, 2)), g_L=np.zeros(2), g_U=np.zeros(2),
        name="infeasible_chain")


def hard_chain():
    """Feasible but with a nasty start: equality x_{k+1} = x_k^2 with x far
    from the parabola forces restoration-grade steps."""
    def f_stage(xk, xk1, th):
        return jnp.sum((xk - 2.0) ** 2)

    def g_stage(xk, xk1, th):
        return jnp.array([xk1[0] - xk[0] ** 2])

    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage,
        x0=np.full((4, 2), -3.0), g_L=np.zeros(1), g_U=np.zeros(1),
        name="hard_chain")


def test_chained_infeasible_detected():
    res = solve(infeasible_chain(), print_level=0)
    assert int(res.status) == int(SolverReturn.LOCAL_INFEASIBILITY), \
        SolverReturn(int(res.status))


def test_chained_hard_still_solves():
    res = solve(hard_chain(), print_level=0)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT)), \
        (SolverReturn(int(res.status)), int(res.iter_count))
