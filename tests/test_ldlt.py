import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu.linalg.ldlt import ldlt, ldlt_blocked, ldlt_solve


def random_sym(n, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    if spd:
        A = A @ A.T + n * np.eye(n)
    return jnp.asarray(A)


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64])
def test_ldlt_reconstructs_spd(n):
    A = random_sym(n, seed=n, spd=True)
    fac = ldlt(A)
    R = (fac.L * fac.d[None, :]) @ fac.L.T
    np.testing.assert_allclose(np.asarray(R), np.asarray(A), rtol=1e-10, atol=1e-8)
    assert int(fac.num_pos) == n and int(fac.num_neg) == 0
    assert not bool(fac.singular)


def test_ldlt_inertia_indefinite():
    # Quasi-definite saddle matrix [[H, J^T], [J, -delta I]]
    rng = np.random.default_rng(3)
    n, m = 8, 3
    H = rng.standard_normal((n, n))
    H = H @ H.T + np.eye(n)
    J = rng.standard_normal((m, n))
    K = np.block([[H, J.T], [J, -1e-8 * np.eye(m)]])
    fac = ldlt(jnp.asarray(K))
    assert int(fac.num_pos) == n
    assert int(fac.num_neg) == m


def test_ldlt_solve():
    n = 20
    A = random_sym(n, seed=7)
    A = A + 0.0  # indefinite but likely nonsingular
    # make quasi-definite to be safe for unpivoted factorization
    A = jnp.asarray(np.block([
        [np.asarray(A @ A.T + n * np.eye(n)), np.eye(n)[:5].T],
        [np.eye(n)[:5], -np.eye(5)]]))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n + 5))
    fac = ldlt(A)
    x = ldlt_solve(fac, b)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [64, 200, 300])
def test_ldlt_blocked_matches(n):
    A = random_sym(n, seed=n, spd=True)
    # add an indefinite tail block
    fac_ref = ldlt(A)
    fac_blk = ldlt_blocked(A, block=64)
    R = (fac_blk.L * fac_blk.d[None, :]) @ fac_blk.L.T
    np.testing.assert_allclose(np.asarray(R), np.asarray(A), rtol=1e-9, atol=1e-7)
    assert int(fac_blk.num_pos) == int(fac_ref.num_pos)
    assert int(fac_blk.num_neg) == int(fac_ref.num_neg)


def test_ldlt_blocked_quasidefinite():
    rng = np.random.default_rng(5)
    n, m = 150, 70
    H = rng.standard_normal((n, n))
    H = H @ H.T + np.eye(n)
    J = rng.standard_normal((m, n))
    K = np.block([[H, J.T], [J, -1e-6 * np.eye(m)]])
    fac = ldlt_blocked(jnp.asarray(K), block=64)
    assert int(fac.num_pos) == n
    assert int(fac.num_neg) == m
    b = jnp.asarray(rng.standard_normal(n + m))
    x = ldlt_solve(fac, b)
    np.testing.assert_allclose(np.asarray(jnp.asarray(K) @ x), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_ldlt_vmap():
    # Batched factorization of many small SPD systems (the batched-NLP path).
    rng = np.random.default_rng(11)
    B, n = 32, 12
    As = rng.standard_normal((B, n, n))
    As = As @ np.transpose(As, (0, 2, 1)) + n * np.eye(n)
    bs = rng.standard_normal((B, n))
    xs = jax.vmap(lambda A, b: ldlt_solve(ldlt(A), b))(jnp.asarray(As), jnp.asarray(bs))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", As, np.asarray(xs)), bs,
                               rtol=1e-8, atol=1e-8)
