import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, canonicalize, Options, SolverReturn
from ipopt_tpu.batch import solve_batched, stack_problems
from ipopt_tpu.problem import NLP

import problems


def hs071_shifted(delta):
    """HS071 family: perturb the equality rhs (sum of squares = 40 + delta)."""
    d = float(delta)
    return NLP(
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0 + d]), g_U=jnp.array([2e19, 40.0 + d]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))


def test_batched_matches_loop():
    deltas = [0.0, 0.5, -0.5, 1.0]
    batch = [hs071_shifted(d) for d in deltas]
    res_b = solve_batched(batch, tol=1e-8)
    for i, d in enumerate(deltas):
        res_1 = solve(hs071_shifted(d), print_level=0)
        assert int(res_b.status[i]) == int(SolverReturn.SUCCESS)
        np.testing.assert_allclose(float(res_b.obj[i]), float(res_1.obj),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(res_b.x[i]), np.asarray(res_1.x),
                                   rtol=1e-7, atol=1e-8)


def test_batched_lockstep_masking():
    # Lanes converging at different iteration counts must freeze correctly:
    # iter_count must differ and results stay independent.
    batch = [hs071_shifted(d) for d in [0.0, 3.0]]
    res = solve_batched(batch)
    assert int(res.status[0]) == int(SolverReturn.SUCCESS)
    assert int(res.status[1]) == int(SolverReturn.SUCCESS)


def test_batched_sharded_mesh():
    # 8 virtual CPU devices: shard the batch axis over the mesh.
    devs = jax.devices()
    assert len(devs) >= 8, devs
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("batch",))
    batch = [hs071_shifted(0.1 * i) for i in range(8)]
    res = solve_batched(batch, mesh=mesh)
    assert np.all(np.asarray(res.status) == int(SolverReturn.SUCCESS))
    # Objectives vary smoothly (decrease) with the growing sphere radius.
    objs = np.asarray(res.obj)
    assert np.all(np.diff(objs) < 0)
