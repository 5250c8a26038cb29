"""Batched parametric solves — the MPC/OPF pattern.

Thousands of structurally identical NLPs (here: HS071 with per-instance
constraint data) solved in lockstep on one chip.  Run:

    python examples/mpc_batch.py
"""
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from ipopt_tpu import NLP, solve_batched


def instance(delta):
    return NLP(
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0 + delta]),
        g_U=jnp.array([2e19, 40.0 + delta]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))


def main():
    B = 64
    batch = [instance(0.02 * i) for i in range(B)]
    t0 = time.perf_counter()
    res = solve_batched(batch, tol=1e-8)
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    ok = int(np.sum(np.asarray(res.status) == 0))
    print(f"{ok}/{B} converged in {dt:.2f}s "
          f"(median {int(np.median(np.asarray(res.iter_count)))} iterations)")
    print("objectives[:5] =", np.asarray(res.obj[:5]))


if __name__ == "__main__":
    main()
