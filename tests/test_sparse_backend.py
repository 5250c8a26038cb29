"""General-sparsity (banded-BCR) KKT backend — VERDICT r1 item 1.

Reference parity: the MA27/MA57 capability class ("any sparse NLP, any
structure", IpMa27TSolverInterface.hpp:276-297, IpTSymLinearSolver.hpp:33-84):
static symbolic analysis at canonicalize time (RCM bandwidth reduction, AD
sparsity detection / TNLP-style declared patterns, distance-2 colorings),
block-tridiagonal BCR numeric factorization per iteration.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu.problem import NLP, canonicalize
from ipopt_tpu.options import Options
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.modellib import (luksan_vlcek4, luksan_vlcek5, hs071,
                                band_sparsity, HS071_F_STAR)


def _messy_sparse_nlp(n=14):
    """eq + ineq + bounds with chained sparsity (auto-detected pattern)."""
    def f(x):
        return jnp.sum((x[:-1] ** 2 - x[1:]) ** 2) + jnp.sum((x - 1.0) ** 4)

    def g(x):
        eq = x[0:4] * x[1:5] - 1.0
        ineq = x[5:9] ** 2 + x[6:10] - 0.5
        return jnp.concatenate([eq, ineq])

    g_L = np.concatenate([np.zeros(4), np.full(4, -1.0)])
    g_U = np.concatenate([np.zeros(4), np.full(4, 2.0)])
    return NLP(f=f, g=g, g_L=g_L, g_U=g_U, x0=np.linspace(0.7, 1.4, n),
               x_L=0.1, x_U=3.0)


def test_assembly_matches_dense():
    """The permuted banded KKT, densified and unpermuted, must equal the
    dense assemble_aug_system exactly (same deltas)."""
    from ipopt_tpu.sparse import (canonicalize_sparse, assemble_banded,
                                  jacobian_values, sparse_hessian_values)
    from ipopt_tpu.kkt import evaluate, sigmas, assemble_aug_system
    from ipopt_tpu.algorithm.init import default_initialize

    nlp = _messy_sparse_nlp()
    opts = Options(print_level=0, linear_solver="banded-bcr")
    cb = canonicalize_sparse(nlp, opts)
    info = cb.chain
    it = default_initialize(cb, opts)
    jv = jacobian_values(cb, it.x)
    hv = sparse_hessian_values(cb, it)
    dx, dc = 0.37, 0.011
    Kb = assemble_banded(cb, it, jv, hv, dx, dc)
    Kp = np.asarray(Kb.to_dense())[:info.N, :info.N]
    P = np.asarray(info.perm)
    Kun = np.empty_like(Kp)
    Kun[np.ix_(P, P)] = Kp

    cd = canonicalize(nlp, Options(print_level=0))
    ev = evaluate(cd, it.x)
    sig = sigmas(cd, it)
    Kref = np.asarray(assemble_aug_system(
        cd.eval_lag_hess(it.x, it.y_c, it.y_d), ev.J_c, ev.J_d,
        sig, dx, dx, dc, dc))
    assert np.max(np.abs(Kun - Kref)) < 1e-10


def test_solve_matches_dense_autodetected():
    nlp = _messy_sparse_nlp()
    rd = solve(nlp, print_level=0, tol=1e-8)
    rb = solve(nlp, print_level=0, tol=1e-8, linear_solver="banded-bcr")
    assert int(rb.status) == 0
    assert abs(float(rb.obj) - float(rd.obj)) < 1e-7
    assert np.max(np.abs(np.asarray(rb.x) - np.asarray(rd.x))) < 1e-5


@pytest.mark.parametrize("maker,n", [(luksan_vlcek4, 64),
                                     (luksan_vlcek5, 64)])
def test_luksan_vlcek_banded_vs_dense(maker, n):
    nlp = maker(n)
    rd = solve(nlp, print_level=0, tol=1e-8)
    rb = solve(nlp, print_level=0, tol=1e-8, linear_solver="banded-bcr")
    assert int(rb.status) in (0, 5)
    assert abs(float(rb.obj) - float(rd.obj)) <= 1e-5 * max(
        1.0, abs(float(rd.obj)))


def test_hs071_banded():
    rb = solve(hs071(), print_level=0, tol=1e-8, linear_solver="banded-bcr")
    assert int(rb.status) == 0
    assert abs(float(rb.obj) - HS071_F_STAR) < 1e-6


def test_declared_pattern_scales_without_dense_probe():
    """A declared pattern must bypass dense auto-detection: n*m far above the
    probe gate still canonicalizes + solves (LuksanVlcek5 inequality variant
    exercises s-rows at scale)."""
    n = 4096
    nlp = luksan_vlcek5(n, equality=False)
    assert nlp.jac_g_sparsity is not None
    rb = solve(nlp, print_level=0, tol=1e-7, linear_solver="banded-bcr",
               max_iter=120)
    assert int(rb.status) in (0, 5), int(rb.status)
    # optimum of the inequality variant is ~0 objective
    assert float(rb.obj) < 1e-3


def test_band_sparsity_helper():
    r, c = band_sparsity(3, 5, 0, 2)
    got = set(zip(r.tolist(), c.tolist()))
    want = {(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (1, 3),
            (2, 2), (2, 3), (2, 4)}
    assert got == want


def test_rcm_bandwidth_reduction():
    """A 2-D grid problem (Mittelmann-like sparsity) must get a block size
    far below the problem dimension after RCM."""
    from ipopt_tpu.sparse import canonicalize_sparse
    N = 12  # (N, N) grid, 5-point stencil equality rows
    n = N * N

    def g(x):
        Y = x.reshape(N, N)
        r = (4.0 * Y[1:-1, 1:-1] - Y[:-2, 1:-1] - Y[2:, 1:-1]
             - Y[1:-1, :-2] - Y[1:-1, 2:]) - (Y[1:-1, 1:-1] ** 3
                                              - Y[1:-1, 1:-1]) * (1.0 / N) ** 2
        return r.reshape(-1)

    m = (N - 2) ** 2
    nlp = NLP(f=lambda x: 0.5 * jnp.sum((x - 0.5) ** 2), g=g,
              g_L=np.full(m, 0.1), g_U=np.full(m, 0.1),
              x0=np.full(n, 0.4), x_L=-2.0, x_U=2.0)
    opts = Options(print_level=0, linear_solver="banded-bcr")
    cb = canonicalize_sparse(nlp, opts)
    info = cb.chain
    # KKT dim = n + m; a 2-D grid RCM bandwidth is O(N), not O(N^2)
    assert info.b <= 8 * N, (info.b, info.N)
    rb = solve(cb, print_level=0, tol=1e-7, linear_solver="banded-bcr")
    rd = solve(nlp, print_level=0, tol=1e-7)
    assert int(rb.status) == 0
    assert abs(float(rb.obj) - float(rd.obj)) < 1e-6 * max(
        1.0, abs(float(rd.obj)))


def test_banded_restoration_detects_infeasibility():
    """The banded backend's restoration phase (banded_resto.py: the resto NLP
    keeps the sparse structure) must detect inconsistent constraints, like
    the dense path does (IpRestoMinC_1Nrm solver-agnosticism)."""
    from ipopt_tpu.types import SolverReturn
    n = 12

    def g(x):
        chain = x[:-2] + x[1:-1] - 2.0 * x[2:]
        return jnp.concatenate([chain, jnp.array([x[0] - 1.0, x[0] + 1.0])])

    m = n
    nlp = NLP(f=lambda x: jnp.sum((x - 0.5) ** 2), g=g,
              g_L=np.zeros(m), g_U=np.zeros(m), x0=np.full(n, 0.5),
              x_L=-3.0, x_U=3.0)
    rb = solve(nlp, print_level=0, tol=1e-8, linear_solver="banded-bcr")
    assert int(rb.status) == int(SolverReturn.LOCAL_INFEASIBILITY), \
        SolverReturn(int(rb.status))


def test_mittelmann_distributed_control():
    """MittelmannDistCntrlNeumA1 (the reference's general-grid-sparsity
    distributed-control case, MittelmannDistCntrlNeumA.hpp:413): banded
    backend matches the dense path at small N."""
    from ipopt_tpu.modellib import mittelmann_dist_control
    nlp = mittelmann_dist_control(6)
    rd = solve(nlp, print_level=0, tol=1e-8)
    rb = solve(nlp, print_level=0, tol=1e-8, linear_solver="banded-bcr")
    assert int(rb.status) == 0
    assert abs(float(rb.obj) - float(rd.obj)) < 1e-6
