"""Nested-dissection multifrontal backend (linear_solver="multifrontal").

The MA27/MA57 general fill-in capability
(IpMa27TSolverInterface.hpp:276-297) for patterns whose RCM bandwidth is
too wide for banded BCR — 3-D grids in particular
(examples/ScalableProblems/MittelmannDistCntrl3D*)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu.options import Options
from ipopt_tpu.problem import NLP
from ipopt_tpu.sparse import canonicalize_sparse
from ipopt_tpu.algorithm.solver import solve


def _opts(**kw):
    return Options(linear_solver="multifrontal", print_level=0, **kw)


def test_nd_matches_banded_lv1():
    from ipopt_tpu.modellib import luksan_vlcek1_flat
    nlp = luksan_vlcek1_flat(64)
    r = solve(canonicalize_sparse(nlp, _opts(resto_phase=False)),
              _opts(resto_phase=False))
    ob = Options(linear_solver="banded-bcr", print_level=0,
                 resto_phase=False)
    rb = solve(canonicalize_sparse(nlp, ob), ob)
    assert int(r.status) == 0 and int(rb.status) == 0
    assert np.allclose(np.asarray(r.x), np.asarray(rb.x), atol=1e-6)


def test_nd_factorize_solve_exact():
    """The multifrontal solve must agree with a dense solve of the same
    assembled KKT matrix (machine precision, f64)."""
    import jax
    from ipopt_tpu.linalg.nested_dissection import (
        nd_assemble, nd_factorize, nd_solve, nd_matvec, nd_add_diag_deltas)
    from ipopt_tpu.sparse import jacobian_values, sparse_hessian_values
    from ipopt_tpu.algorithm.init import default_initialize
    from ipopt_tpu.modellib import mittelmann_dist_control

    opts = _opts(resto_phase=False)
    cn = canonicalize_sparse(mittelmann_dist_control(8), opts)
    info = cn.chain
    it = default_initialize(cn, opts)
    jv = jacobian_values(cn, it.x)
    hv = sparse_hessian_values(cn, it)
    # strongly quasi-definite regularization: the unpivoted elimination is
    # stable and the inertia is exactly (n+mi, me+mi) — the solver's retry
    # loop is what handles weaker deltas
    dx = jnp.asarray(1.0, jnp.float64)
    dc = jnp.asarray(1e-2, jnp.float64)
    zero = jnp.zeros(())
    fronts = nd_assemble(cn, cn.aux_arrays, info, it, jv, hv, zero, zero)
    fronts = nd_add_diag_deltas(info, cn.aux_arrays, fronts, dx, dc)

    # exact matvec against a random vector == dense assembled K @ v
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.standard_normal(info.N))
    Kv = nd_matvec(info, cn.aux_arrays, fronts, v)
    fac = nd_factorize(info, cn.aux_arrays, fronts)
    assert not bool(fac.singular)
    sol = nd_solve(info, cn.aux_arrays, fac, Kv)
    assert np.allclose(np.asarray(sol), np.asarray(v), atol=1e-8)

    # inertia of the regularized KKT: n + mi positive, me + mi negative
    assert int(fac.num_pos) == info.n + info.mi
    assert int(fac.num_neg) == info.me + info.mi


def test_nd_mittelmann_2d_matches_banded():
    from ipopt_tpu.modellib import mittelmann_dist_control
    nlp = mittelmann_dist_control(12)
    o = _opts(resto_phase=False)
    r = solve(canonicalize_sparse(nlp, o), o)
    ob = Options(linear_solver="banded-bcr", print_level=0,
                 resto_phase=False)
    rb = solve(canonicalize_sparse(nlp, ob), ob)
    assert int(r.status) == 0
    assert abs(float(r.obj) - float(rb.obj)) < 1e-7


def test_nd_mittelmann_3d():
    """3-D PDE distributed control: RCM bandwidth is O(N^2) — the pattern
    class the banded backend cannot store; ND solves it to optimality."""
    from ipopt_tpu.modellib import mittelmann_dist_control_3d
    nlp = mittelmann_dist_control_3d(6)
    o = _opts(resto_phase=False)
    r = solve(canonicalize_sparse(nlp, o), o)
    assert int(r.status) == 0
    assert int(r.iter_count) < 40


def test_nd_inequalities_hs071():
    nlp = NLP(
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([x[0] * x[1] * x[2] * x[3],
                               x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0]), g_U=jnp.array([2e19, 40.0]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))
    r = solve(canonicalize_sparse(nlp, _opts()), _opts())
    assert int(r.status) == 0
    assert abs(float(r.obj) - 17.0140172) < 1e-5


def test_nd_restoration_path():
    """resto_phase=True builds the resto symbolic analysis via nd_analyze
    and the nested resto IPM runs on the multifrontal backend."""
    nlp = NLP(
        f=lambda x: jnp.sum((x - 2.0) ** 2),
        g=lambda x: jnp.array([x[0] ** 2 + x[1] ** 2]),
        x_L=-5.0, x_U=5.0,
        g_L=jnp.array([1.0]), g_U=jnp.array([1.0]),
        x0=jnp.array([3.0, 0.1, 0.0]))
    o = _opts()
    cn = canonicalize_sparse(nlp, o)
    assert cn.chain._resto_info is not None
    r = solve(cn, o)
    assert int(r.status) == 0
