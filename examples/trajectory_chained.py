"""Chained (block-tridiagonal KKT) problems — ScalableProblems territory.

LuksanVlcek1 at configurable size with the BCR structured factorization.
Run:  python examples/trajectory_chained.py [n] [v]
"""
import sys
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ipopt_tpu import solve, SolverReturn
from ipopt_tpu.modellib import luksan_vlcek1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t0 = time.perf_counter()
    res = solve(luksan_vlcek1(n, v), print_level=0)
    dt = time.perf_counter() - t0
    print(f"LuksanVlcek1 n={n} (group width {v}): "
          f"{SolverReturn(int(res.status)).name} in {int(res.iter_count)} "
          f"iterations, f* = {float(res.obj):.8f}  [{dt:.1f}s incl. compile]")


if __name__ == "__main__":
    main()
