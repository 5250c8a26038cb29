"""Chained (block-tridiagonal KKT) solver tests.

LuksanVlcek1 behavioral parity target (examples/ScalableProblems/
LuksanVlcek1.cpp): chained Rosenbrock objective with the trigonometric-
exponential equality constraints; solvable at any size.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, SolverReturn, Options
from ipopt_tpu.chained import ChainedNLP, canonicalize_chained


def luksan_vlcek1_chained(n):
    """n variables grouped in pairs: v=2, K = n/2 - 1 stages, 2 constraints
    per stage (constraint j: 3 consecutive variables)."""
    assert n % 2 == 0 and n >= 6

    def f_stage(xk, xk1, theta):
        # chained Rosenbrock terms whose leading index lives in group k
        x = jnp.concatenate([xk, xk1])
        return jnp.sum(100.0 * (x[:2] ** 2 - x[1:3]) ** 2 + (x[:2] - 1.0) ** 2)

    def g_stage(xk, xk1, theta):
        x = jnp.concatenate([xk, xk1])
        xkm = x[0:2]
        xk_ = x[1:3]
        xkp = x[2:4]
        return (3.0 * xk_ ** 3 + 2.0 * xkp - 5.0
                + jnp.sin(xk_ - xkp) * jnp.sin(xk_ + xkp)
                + 4.0 * xk_ - xkm * jnp.exp(xkm - xk_) - 3.0)

    def f_last(xK):
        # the final Rosenbrock term (leading index n-2) lives entirely in
        # the last variable group
        return 100.0 * (xK[0] ** 2 - xK[1]) ** 2 + (xK[0] - 1.0) ** 2

    K = n // 2 - 1
    x0 = np.full((K + 1, 2), -1.0)
    x0[:, 1] = 1.0
    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage, f_last=f_last, x0=x0,
        g_L=np.zeros(2), g_U=np.zeros(2),
        name=f"lv1_{n}")


def luksan_vlcek1_flat(n):
    """Dense reference formulation of the same problem."""
    def f(x):
        return jnp.sum(100.0 * (x[:-1] ** 2 - x[1:]) ** 2 + (x[:-1] - 1.0) ** 2)

    def g(x):
        xk = x[:-2]
        xk1 = x[1:-1]
        xk2 = x[2:]
        return (3.0 * xk1 ** 3 + 2.0 * xk2 - 5.0
                + jnp.sin(xk1 - xk2) * jnp.sin(xk1 + xk2)
                + 4.0 * xk1 - xk * jnp.exp(xk - xk1) - 3.0)

    x0 = np.full(n, -1.0)
    x0[1::2] = 1.0
    return NLP(f=f, g=g, g_L=np.zeros(n - 2), g_U=np.zeros(n - 2),
               x0=x0, name=f"lv1flat_{n}")


def test_chained_eval_matches_flat():
    n = 12
    opts = Options(nlp_scaling_method="none")
    pc = canonicalize_chained(luksan_vlcek1_chained(n), opts)
    from ipopt_tpu.problem import canonicalize
    pf = canonicalize(luksan_vlcek1_flat(n), opts)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n) * 0.1)
    np.testing.assert_allclose(float(pc.eval_f(x)), float(pf.eval_f(x)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pc.eval_c(x)), np.asarray(pf.eval_c(x)),
                               rtol=1e-12)


def test_chained_kkt_matches_dense():
    """The assembled BTD augmented system must equal the dense assembly after
    accounting for the [x|s|y] stage permutation."""
    from ipopt_tpu.algorithm.chained_kkt import (assemble_btd, pack_rhs,
                                                 unpack_sol, expected_inertia)
    from ipopt_tpu.chained import stage_jacobians, stage_hessians
    from ipopt_tpu.linalg.block_tridiag import bcr_factorize, bcr_solve
    from ipopt_tpu.algorithm.init import default_initialize

    n = 8
    opts = Options(nlp_scaling_method="none")
    pc = canonicalize_chained(luksan_vlcek1_chained(n), opts)
    it = default_initialize(pc, opts)
    AB = stage_jacobians(pc, it.x)
    Wb = stage_hessians(pc, it.x, it.y_c, it.y_d)
    Kbtd = assemble_btd(pc, it, AB, Wb, 0.5, 0.25)

    # Solve a random system via BCR and verify through the matvec.
    rng = np.random.default_rng(1)
    parts = (jnp.asarray(rng.standard_normal(pc.n)),
             jnp.zeros((pc.struct.mi,)),
             jnp.asarray(rng.standard_normal(pc.struct.me)),
             jnp.zeros((pc.struct.mi,)))
    rhs = pack_rhs(pc, *parts)
    fac = bcr_factorize(Kbtd)
    sol = bcr_solve(fac, rhs)
    np.testing.assert_allclose(np.asarray(Kbtd.matvec(sol)), np.asarray(rhs),
                               rtol=1e-8, atol=1e-8)
    # inertia with delta_x=0.5 > 0 regularization must be the expected one
    ep, en = expected_inertia(pc)
    assert int(fac.num_pos) == ep
    assert int(fac.num_neg) == en
    # pack/unpack roundtrip
    back = unpack_sol(pc, rhs)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(parts[0]))
    np.testing.assert_allclose(np.asarray(back[2]), np.asarray(parts[2]))


@pytest.mark.parametrize("n", [8, 32])
def test_chained_solves_lv1(n):
    res = solve(luksan_vlcek1_chained(n), print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS), \
        (SolverReturn(int(res.status)), int(res.iter_count))
    # objective matches the dense-path solve of the same problem
    res_flat = solve(luksan_vlcek1_flat(n), print_level=0)
    assert int(res_flat.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), float(res_flat.obj),
                               rtol=1e-6, atol=1e-8)
    # iteration counts should be in the same ballpark (same algorithm)
    assert abs(int(res.iter_count) - int(res_flat.iter_count)) <= 5


def test_batched_chained_solves():
    """Chained problems vmap like everything else (the MPC-fleet pattern)."""
    from ipopt_tpu.modellib import mittelmann_bndry_control_1d
    from ipopt_tpu.batch import stack_problems, _solve_batched_jit

    opts = Options(print_level=0)
    insts = []
    for i in range(3):
        c = canonicalize_chained(mittelmann_bndry_control_1d(32, 4), opts)
        insts.append(c._replace(x0=c.x0 + 0.01 * i))
    nb = stack_problems(insts, opts)
    res = _solve_batched_jit(nb, opts)
    assert all(int(s) == int(SolverReturn.SUCCESS)
               for s in np.asarray(res.status))
    r0 = solve(insts[0], opts)
    np.testing.assert_allclose(float(res.obj[0]), float(r0.obj), rtol=1e-10)
