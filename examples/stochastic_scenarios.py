"""Scenario-decomposed two-stage stochastic NLP with block-arrow Schur KKT.

Shards across all visible devices when more than one is present.
Run:  python examples/stochastic_scenarios.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from ipopt_tpu import ScenarioNLP, solve, SolverReturn


def main():
    S, ns = 32, 6
    rng = np.random.default_rng(0)
    theta = {"t": jnp.asarray(rng.standard_normal((S, ns))),
             "b": jnp.asarray(rng.standard_normal((S, 1)))}
    sn = ScenarioNLP(
        f_scen=lambda x0, xs, th: 0.5 * jnp.sum((xs - th["t"]) ** 2),
        g_scen=lambda x0, xs, th: jnp.array([x0[0] + jnp.sum(xs)]) - th["b"],
        f0=lambda x0: 0.5 * jnp.sum(x0 ** 2),
        x0_init=np.zeros(3), xs_init=np.zeros((S, ns)),
        g_L=np.zeros((S, 1)), g_U=np.zeros((S, 1)), xs_L=-5.0, theta=theta)
    res = solve(sn, print_level=0)
    print(f"{SolverReturn(int(res.status)).name} in {int(res.iter_count)} "
          f"iterations; first-stage x0 = {np.asarray(res.x[:3])}")


if __name__ == "__main__":
    main()
