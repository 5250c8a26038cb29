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


def test_blocked_gj_matches_scalar():
    """The panelized MXU Gauss-Jordan (used for b > 32) must match the
    scalar sweep to machine precision — inverse AND pivot sequence (the
    pivots feed the inertia counts), including on indefinite blocks."""
    import numpy as np
    import jax.numpy as jnp
    from ipopt_tpu.linalg.block_tridiag import (_gj_inv_lanes,
                                                _gj_inv_lanes_blocked)
    rng = np.random.default_rng(0)
    for b, n in [(48, 5), (33, 2), (64, 3)]:
        A = rng.standard_normal((b, b, n))
        A = A + A.transpose(1, 0, 2) + np.eye(b)[:, :, None] * (2 * b)
        X1, p1 = _gj_inv_lanes(jnp.asarray(A))
        X2, p2 = _gj_inv_lanes_blocked(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X1),
                                   atol=1e-12, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-9)
        for k in range(n):
            np.testing.assert_allclose(
                np.asarray(X2)[:, :, k] @ A[:, :, k], np.eye(b), atol=1e-8)
    # indefinite pivot signs (inertia information)
    A = rng.standard_normal((40, 40, 2))
    A = A + A.transpose(1, 0, 2)
    A[:20, :20, :] += np.eye(20)[:, :, None] * 120
    A[20:, 20:, :] -= np.eye(20)[:, :, None] * 120
    _, p1 = _gj_inv_lanes(jnp.asarray(A))
    _, p2 = _gj_inv_lanes_blocked(jnp.asarray(A))
    assert (np.sign(np.asarray(p1)) == np.sign(np.asarray(p2))).all()


def test_dense_root_bcr_exactness():
    """The dense blocked-root BCR variant (off by default; _ROOT_DENSE_N)
    stays exact with correct inertia when enabled."""
    import numpy as np
    import jax.numpy as jnp
    from ipopt_tpu.linalg import block_tridiag as bt
    rng = np.random.default_rng(3)
    old = bt._ROOT_DENSE_N
    bt._ROOT_DENSE_N = 256
    try:
        nb, b = 40, 16
        D = rng.standard_normal((nb, b, b))
        D = D + D.transpose(0, 2, 1) + np.eye(b) * (3 * b)
        S = rng.standard_normal((nb, b, b))
        K = bt.BTDMatrix(jnp.asarray(D), jnp.asarray(S))
        fac = bt.bcr_factorize(K)
        x = rng.standard_normal(nb * b)
        r = np.asarray(K.matvec(jnp.asarray(x)))
        xs = np.asarray(bt.bcr_solve(fac, jnp.asarray(r)))
        np.testing.assert_allclose(xs, x, atol=1e-8)
        w = np.linalg.eigvalsh(np.asarray(K.to_dense()))
        assert int(fac.num_pos) == int((w > 0).sum())
        assert int(fac.num_neg) == int((w < 0).sum())
    finally:
        bt._ROOT_DENSE_N = old
