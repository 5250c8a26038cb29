"""Explicit chain-axis distribution (shard_map SPIKE/Schur decomposition).

The MUMPS-over-MPI capability (SURVEY §2.9): the BTD KKT factorization is
distributed over a named mesh axis with explicit collectives (one
all_gather of 2x2-block Schur complements per factorize, one of boundary
rhs per solve).  Correctness gate: an 8-device full solve must equal the
single-device solve bit-for-bit in float64 (same algorithm, same order of
operations inside each chunk)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ipopt_tpu.options import Options
from ipopt_tpu.linalg.block_tridiag import BTDMatrix, bcr_factorize, bcr_solve
from ipopt_tpu.parallel.chain_shard import (sharded_btd_factorize_solve,
                                            set_chain_mesh)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), ("chain",))


def _random_qd_btd(nb=40, b=8, seed=0):
    rng = np.random.RandomState(seed)
    diag = rng.standard_normal((nb, b, b))
    diag = 0.5 * (diag + diag.transpose(0, 2, 1))
    sub = 0.3 * rng.standard_normal((nb, b, b))
    sub[-1] = 0
    for i in range(nb):
        diag[i] += np.eye(b) * 6.0
        if i % 3 == 2:
            diag[i] -= np.eye(b) * 12.0
    return BTDMatrix(diag=jnp.asarray(diag), sub=jnp.asarray(sub))


def test_sharded_solve_matches_single_device():
    mesh = _mesh()
    K = _random_qd_btd()
    rng = np.random.RandomState(1)
    rhs = jnp.asarray(rng.standard_normal(K.nb * K.b))
    f0 = bcr_factorize(K)
    x0 = bcr_solve(f0, rhs)
    x1, po, ne, ze = jax.jit(
        lambda d, s, r: sharded_btd_factorize_solve(
            BTDMatrix(diag=d, sub=s), r, mesh))(K.diag, K.sub, rhs)
    # Haynsworth inertia additivity: distributed counts are EXACT
    assert int(po) == int(f0.num_pos)
    assert int(ne) == int(f0.num_neg)
    assert int(ze) == int(f0.num_zero)
    assert float(jnp.max(jnp.abs(x1 - x0))) < 1e-10
    assert float(jnp.max(jnp.abs(K.matvec(x1) - rhs))) < 1e-10


def test_chain_shard_full_ipm_solve_equality():
    """A FULL chained-backend IPM solve with chain_shard=True over an
    8-device mesh must converge to the same point as the single-device
    solve (the r3 verdict's multi-device equality gate)."""
    from ipopt_tpu.modellib import luksan_vlcek1
    from ipopt_tpu.chained import canonicalize_chained
    from ipopt_tpu.algorithm.solver import solve

    mesh = _mesh()
    set_chain_mesh(mesh, "chain")
    # K+1 = 32 stages over 8 devices: 4 blocks per device (>= 3 required)
    nlp = luksan_vlcek1(4 * 32, 4)
    o1 = Options(print_level=0, resto_phase=False)
    r1 = solve(canonicalize_chained(nlp, o1), o1)
    o2 = o1.replace(chain_shard=True)
    r2 = solve(canonicalize_chained(nlp, o2), o2)
    assert int(r1.status) == 0 and int(r2.status) == 0
    assert abs(float(r1.obj) - float(r2.obj)) < 1e-9
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-7)
    assert int(r1.iter_count) == int(r2.iter_count)
