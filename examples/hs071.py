"""HS071 — the canonical example (reference examples/hs071_cpp, hs071_c, ...).

Run:  python examples/hs071.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# On this machine the default platform is a tunneled TPU; examples run on CPU
# in double precision for exact parity with the reference's output.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from ipopt_tpu import NLP, solve, SolverReturn


def main():
    nlp = NLP(
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0]), g_U=jnp.array([2e19, 40.0]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))

    res = solve(nlp, print_level=5, timing_statistics=True)
    print()
    print(f"status  : {SolverReturn(int(res.status)).name}")
    print(f"f(x*)   : {float(res.obj):.13f}   (reference: 17.0140171451792)")
    print(f"x*      : {res.x}")
    print(f"lambda* : {res.y}")
    if int(res.status) in (0, 5):
        print("\nEXIT: Optimal Solution Found.")


if __name__ == "__main__":
    main()
