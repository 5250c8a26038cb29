import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu.linalg.block_tridiag import BTDMatrix, bcr_factorize, bcr_solve
from ipopt_tpu.linalg.ldlt import ldlt


def make_btd(nb, b, seed=0, spd=True, neg_tail=0):
    """Random block-tridiagonal; SPD by diagonal dominance, optionally with
    a trailing negative-definite part inside each block (quasi-definite)."""
    rng = np.random.default_rng(seed)
    diag = rng.standard_normal((nb, b, b))
    diag = (diag + np.transpose(diag, (0, 2, 1))) / 2
    sub = rng.standard_normal((nb, b, b)) * 0.3
    sub[-1] = 0
    for i in range(nb):
        diag[i] += (b + 2) * np.eye(b)
        if neg_tail:
            # flip sign of the last neg_tail diagonal entries' dominance
            for k in range(b - neg_tail, b):
                diag[i][k, k] = -(b + 2) - diag[i][k, k] + diag[i][k, k] * 0
    return BTDMatrix(diag=jnp.asarray(diag), sub=jnp.asarray(sub))


@pytest.mark.parametrize("nb,b", [(1, 4), (2, 4), (3, 4), (4, 8), (7, 8), (8, 4), (13, 8)])
def test_bcr_solve_matches_dense(nb, b):
    K = make_btd(nb, b, seed=nb * 10 + b)
    rhs = jnp.asarray(np.random.default_rng(1).standard_normal(nb * b))
    fac = bcr_factorize(K)
    x = bcr_solve(fac, rhs)
    Kd = np.asarray(K.to_dense())
    x_ref = np.linalg.solve(Kd, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)
    # residual check through matvec as well
    np.testing.assert_allclose(np.asarray(K.matvec(x)), np.asarray(rhs),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("nb,b,neg", [(4, 8, 3), (7, 8, 2), (13, 8, 4)])
def test_bcr_inertia_quasidefinite(nb, b, neg):
    K = make_btd(nb, b, seed=nb + b + neg, neg_tail=neg)
    fac = bcr_factorize(K)
    Kd = np.asarray(K.to_dense())
    evals = np.linalg.eigvalsh(Kd)
    np_pos = int(np.sum(evals > 0))
    np_neg = int(np.sum(evals < 0))
    assert int(fac.num_pos) == np_pos, (int(fac.num_pos), np_pos)
    assert int(fac.num_neg) == np_neg, (int(fac.num_neg), np_neg)
    assert not bool(fac.singular)
    # and the solve still works on the indefinite system
    rhs = jnp.asarray(np.random.default_rng(2).standard_normal(nb * b))
    x = bcr_solve(fac, rhs)
    np.testing.assert_allclose(np.asarray(K.matvec(x)), np.asarray(rhs),
                               rtol=1e-6, atol=1e-6)


def test_bcr_vmap():
    B = 4
    Ks = [make_btd(8, 4, seed=s) for s in range(B)]
    diag = jnp.stack([K.diag for K in Ks])
    sub = jnp.stack([K.sub for K in Ks])
    rhs = jnp.asarray(np.random.default_rng(3).standard_normal((B, 32)))

    def solve_one(d, s, r):
        fac = bcr_factorize(BTDMatrix(diag=d, sub=s))
        return bcr_solve(fac, r)

    xs = jax.vmap(solve_one)(diag, sub, rhs)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(Ks[i].matvec(xs[i])), np.asarray(rhs[i]),
            rtol=1e-8, atol=1e-8)


def test_bcr_sharded_over_mesh():
    """The BTD chain shards over a device mesh: block-parallel BCR levels run
    distributed (GSPMD inserts the inter-shard communication).  Correctness
    check vs the replicated result; turning the strided gathers into
    collective-permutes (instead of all-gathers) is a tracked optimization."""
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

    devs = jax.devices()
    assert len(devs) >= 8
    rng = np.random.default_rng(0)
    nb, b = 32, 8
    K = make_btd(nb, b, seed=5)
    rhs = jnp.asarray(rng.standard_normal(nb * b))

    mesh = Mesh(np.array(devs[:8]), ("blk",))
    shard = NamedSharding(mesh, P("blk", None, None))
    diag_s = jax.device_put(K.diag, shard)
    sub_s = jax.device_put(K.sub, shard)

    @jax.jit
    def run(d, s, r):
        fac = bcr_factorize(BTDMatrix(d, s))
        return bcr_solve(fac, r)

    x = run(diag_s, sub_s, rhs)
    np.testing.assert_allclose(np.asarray(K.matvec(x)), np.asarray(rhs),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("nb,b,neg", [(5, 8, 2), (13, 8, 4)])
def test_bcr_equilibrated_solve_and_inertia(nb, b, neg):
    """mc19-analog Ruiz equilibration: same solution and inertia as the
    unscaled factorization, on a badly row-scaled quasi-definite matrix."""
    K = make_btd(nb, b, seed=3 * nb + b, neg_tail=neg)
    # wreck the scaling: rows/cols spanning 1e-4 .. 1e4
    rng = np.random.default_rng(9)
    s = jnp.asarray(10.0 ** rng.uniform(-4, 4, (nb, b)))
    diag = K.diag * s[:, :, None] * s[:, None, :]
    sn = jnp.concatenate([s[1:], jnp.ones((1, b))], axis=0)
    sub = K.sub * sn[:, :, None] * s[:, None, :]
    Ks = BTDMatrix(diag=diag, sub=sub)

    fac = bcr_factorize(Ks, equilibrate=True)
    Kd = np.asarray(Ks.to_dense())
    evals = np.linalg.eigvalsh(Kd)
    assert int(fac.num_pos) == int(np.sum(evals > 0))
    assert int(fac.num_neg) == int(np.sum(evals < 0))
    assert not bool(fac.singular)

    rhs = jnp.asarray(np.random.default_rng(4).standard_normal(nb * b))
    x = bcr_solve(fac, rhs)
    x_ref = np.linalg.solve(Kd, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-7, atol=1e-7)
