"""Mixed-precision paths: the TPU route to reference double-build
tolerances (tol 1e-8/1e-7, IpIpoptData.cpp:27-38) without paying f64 for
the FLOP-heavy factorization.

Two modes:
- dtype=float64 + factorization_dtype=float32: f64 iterate/evaluations/
  residuals, f32 KKT factorization + f64 iterative refinement against the
  f64-assembled K.  Reaches tol 1e-7 with full convergence (status 0).
- dtype=float32 + refinement_precision='double': f64 residual/RHS critical
  path over an f32 iterate; bounded by f32 iterate representability
  (~1e-6 relative), terminates at the acceptable level near the optimum.
"""
import numpy as np
import jax.numpy as jnp

from ipopt_tpu.options import Options
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.modellib import hs071, luksan_vlcek1, luksan_vlcek1_flat
from ipopt_tpu.chained import canonicalize_chained
from ipopt_tpu.sparse import canonicalize_sparse


def test_f32_factorization_dense_tol_1e7():
    o = Options(dtype="float64", factorization_dtype="float32", tol=1e-7,
                print_level=0)
    r = solve(hs071(), o)
    assert int(r.status) == 0
    assert abs(float(r.obj) - 17.0140171451792) < 1e-6


def test_f32_factorization_chained_tol_1e7():
    o = Options(dtype="float64", factorization_dtype="float32", tol=1e-7,
                print_level=0, resto_phase=False)
    cn = canonicalize_chained(luksan_vlcek1(4 * 32, 4), o)
    r = solve(cn, o)
    assert int(r.status) == 0
    assert abs(float(r.obj) - 6.23245863) < 1e-6


def test_f32_factorization_banded_near_tol():
    o = Options(dtype="float64", factorization_dtype="float32", tol=1e-7,
                print_level=0, resto_phase=False,
                linear_solver="banded-bcr", linear_system_scaling="mc19")
    cb = canonicalize_sparse(luksan_vlcek1_flat(256), o)
    r = solve(cb, o)
    # full 1e-7 or the acceptable level — either way the objective is at
    # the optimum to f64 accuracy (refinement against the f64 K)
    assert int(r.status) in (0, 5)
    assert abs(float(r.obj) - 6.23245863244) < 1e-8


def test_f32_iterate_double_residual_path():
    """refinement_precision='double' on a pure-f32 iterate: converges to
    the f32 representability floor near the optimum."""
    o = Options(dtype="float32", tol=1e-7, print_level=0,
                refinement_precision="double", resto_phase=False)
    cn = canonicalize_chained(luksan_vlcek1(4 * 32, 4), o)
    r = solve(cn, o)
    assert int(r.status) in (0, 4, 5)
    assert abs(float(r.obj) - 6.23245863) < 5e-6
