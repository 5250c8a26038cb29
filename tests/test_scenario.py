"""Scenario-decomposed (block-arrow Schur) backend tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, NLP, Options, SolverReturn
from ipopt_tpu.parallel.scenario import ScenarioNLP, canonicalize_scenario


def stochastic_qp(S=4, ns=3, seed=0):
    """Two-stage stochastic QP:
        min 0.5||x0||^2 + sum_s 0.5||x_s - t_s||^2
        s.t. x0[0] + sum(x_s) = b_s           (one eq per scenario)
             x_s >= -5
    """
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((S, ns))
    b = rng.standard_normal((S, 1))
    theta = {"t": jnp.asarray(t), "b": jnp.asarray(b)}

    def f_scen(x0, xs, th):
        return 0.5 * jnp.sum((xs - th["t"]) ** 2)

    def g_scen(x0, xs, th):
        return jnp.array([x0[0] + jnp.sum(xs)]) - th["b"]

    def f0(x0):
        return 0.5 * jnp.sum(x0 ** 2)

    return ScenarioNLP(
        f_scen=f_scen, g_scen=g_scen, f0=f0,
        x0_init=np.zeros(2), xs_init=np.zeros((S, ns)),
        g_L=np.zeros((S, 1)), g_U=np.zeros((S, 1)),
        xs_L=-5.0, theta=theta, name="stoch_qp"), t, b


def flat_equivalent(t, b):
    S, ns = t.shape
    n0 = 2

    def f(x):
        x0 = x[:n0]
        Xs = x[n0:].reshape(S, ns)
        return 0.5 * jnp.sum(x0 ** 2) + 0.5 * jnp.sum((Xs - t) ** 2)

    def g(x):
        x0 = x[:n0]
        Xs = x[n0:].reshape(S, ns)
        return x0[0] + jnp.sum(Xs, axis=1) - b[:, 0]

    x_L = np.concatenate([np.full(n0, -np.inf), np.full(S * ns, -5.0)])
    return NLP(f=f, g=g, x0=np.zeros(n0 + S * ns), x_L=x_L,
               g_L=np.zeros(S), g_U=np.zeros(S))


def test_scenario_matches_flat():
    sn, t, b = stochastic_qp()
    res = solve(sn, print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS), \
        SolverReturn(int(res.status))
    res_flat = solve(flat_equivalent(t, b), print_level=0)
    assert int(res_flat.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), float(res_flat.obj),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x[:2]),
                               np.asarray(res_flat.x[:2]), atol=1e-6)


def test_scenario_sharded_mesh():
    """The scenario axis shards over the device mesh; the Schur reduction
    becomes a psum over ICI (GSPMD)."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("scen",))
    sn, t, b = stochastic_qp(S=16, ns=4, seed=3)
    opts = Options(print_level=0)
    cnlp = canonicalize_scenario(sn, opts)

    # shard every scenario-axis leaf of params over the mesh
    def shard_scen(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 16:
            spec = jax.sharding.PartitionSpec(*(("scen",) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))
        return x

    cnlp = jax.tree.map(shard_scen, cnlp)
    res = solve(cnlp, opts)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    res_flat = solve(flat_equivalent(t, b), print_level=0)
    np.testing.assert_allclose(float(res.obj), float(res_flat.obj),
                               rtol=1e-8, atol=1e-10)
