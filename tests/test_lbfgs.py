import numpy as np
import pytest

from ipopt_tpu import solve, SolverReturn

import problems


def test_hs038_lbfgs():
    # Bounds-only Colville problem: classic L-BFGS territory.
    res = solve(problems.hs038(), print_level=0,
                hessian_approximation="limited-memory", max_iter=500)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(float(res.obj), 0.0, atol=1e-6)


def test_hs071_lbfgs():
    res = solve(problems.hs071(), print_level=0,
                hessian_approximation="limited-memory", max_iter=300)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT)), \
        (SolverReturn(int(res.status)), int(res.iter_count))
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-6)


def test_hs035_lbfgs():
    res = solve(problems.hs035(), print_level=0,
                hessian_approximation="limited-memory", max_iter=300)
    assert int(res.status) in (int(SolverReturn.SUCCESS),
                               int(SolverReturn.STOP_AT_ACCEPTABLE_POINT))
    np.testing.assert_allclose(float(res.obj), 1.0 / 9.0, rtol=1e-5)


def test_sherman_morrison_matches_dense_aug_solve():
    # The low-rank SMW solve must agree with assembling the dense compact-form
    # W and solving the dense augmented system (LowRankAugSystemSolver parity).
    import jax.numpy as jnp
    import numpy.random as npr
    from ipopt_tpu import Options
    from ipopt_tpu.problem import canonicalize
    from ipopt_tpu.types import Iterate
    from ipopt_tpu.kkt import evaluate, sigmas, assemble_aug_system
    from ipopt_tpu.linalg.ldlt import ldlt, ldlt_solve
    from ipopt_tpu.algorithm.quasi_newton import (lbfgs_init, lbfgs_update,
                                                  lbfgs_compact, lbfgs_dense_W)
    from ipopt_tpu.algorithm.lowrank_kkt import (lowrank_factorize_kkt,
                                                 lowrank_solve_once)

    nlp = canonicalize(problems.hs071())
    opts = Options(hessian_approximation="limited-memory", print_level=0)
    rng = npr.default_rng(0)
    n, mi, me = nlp.n, nlp.mi, nlp.me

    st = lbfgs_init(n, 6, jnp.float64)
    x = jnp.asarray([1.5, 4.0, 3.5, 1.5])
    for _ in range(4):
        s = jnp.asarray(rng.normal(size=n) * 0.1)
        g0 = nlp.eval_grad_f(x)
        g1 = nlp.eval_grad_f(x + s)
        st = lbfgs_update(st, s, g1 - g0, opts)

    it = Iterate(x=x, s=jnp.asarray([26.0]), y_c=jnp.asarray([1.0]),
                 y_d=jnp.asarray([0.5]),
                 z_L=jnp.ones(n), z_U=jnp.ones(n),
                 v_L=jnp.ones(mi), v_U=jnp.zeros(mi))
    ev = evaluate(nlp, it.x)
    lrw = lbfgs_compact(st)
    mu = jnp.asarray(0.1)
    fr = lowrank_factorize_kkt(nlp, opts, it, ev, lrw, mu,
                               jnp.zeros((), jnp.float64))
    assert not bool(fr.failed)

    rhs = jnp.asarray(rng.normal(size=n + mi + me + mi))
    parts = (rhs[:n], rhs[n:n + mi], rhs[n + mi:n + mi + me],
             rhs[n + mi + me:])
    sol_lr = jnp.concatenate(lowrank_solve_once(fr.fac, *parts))

    W = lbfgs_dense_W(st)
    sig = sigmas(nlp, it)
    K = assemble_aug_system(W, ev.J_c, ev.J_d, sig, fr.delta_x, fr.delta_x,
                            fr.delta_c, fr.delta_c)
    sol_dense = ldlt_solve(ldlt(K), rhs)
    np.testing.assert_allclose(np.asarray(sol_lr), np.asarray(sol_dense),
                               rtol=1e-8, atol=1e-10)


def test_lbfgs_aug_solver_modes_agree():
    # sherman-morrison (default) and the dense extended stand-in must converge
    # to the same optimum.
    r1 = solve(problems.hs071(), print_level=0, max_iter=300,
               hessian_approximation="limited-memory",
               limited_memory_aug_solver="sherman-morrison")
    r2 = solve(problems.hs071(), print_level=0, max_iter=300,
               hessian_approximation="limited-memory",
               limited_memory_aug_solver="extended")
    np.testing.assert_allclose(float(r1.obj), problems.HS071_F_STAR, rtol=1e-6)
    np.testing.assert_allclose(float(r2.obj), problems.HS071_F_STAR, rtol=1e-6)
