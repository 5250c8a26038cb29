"""General-sparsity backend demo: 2-D elliptic distributed control.

The problem (MittelmannDistCntrlNeumA1, examples/ScalableProblems in the
reference) has general grid sparsity — no chain or scenario structure — and
runs through the banded-BCR backend: declared TNLP-style COO patterns,
reverse Cuthill-McKee bandwidth reduction, coloring-compressed JVP/HVP
derivative values, block-tridiagonal BCR factorization with exact inertia.

Run:  python examples/sparse_grid_control.py [N]
"""
import sys
import time

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from ipopt_tpu.modellib import mittelmann_dist_control
from ipopt_tpu.algorithm.solver import solve
from ipopt_tpu.sparse import canonicalize_sparse
from ipopt_tpu.options import Options


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    on_tpu = jax.default_backend() != "cpu"
    opts = Options(dtype="float32" if on_tpu else "float64",
                   tol=1e-5 if on_tpu else 1e-8,
                   linear_solver="banded-bcr", print_level=5)

    t0 = time.perf_counter()
    cnlp = canonicalize_sparse(mittelmann_dist_control(N), opts)
    info = cnlp.chain
    print(f"N={N}: {info.n} variables, {info.me + info.mi} constraints, "
          f"KKT dim {info.N}, RCM bandwidth block {info.b}, {info.nb} blocks, "
          f"{info.n_colors_j}+{info.n_colors_h} derivative colors "
          f"(symbolic analysis {time.perf_counter() - t0:.2f}s)")

    t0 = time.perf_counter()
    res = solve(cnlp, opts)
    print(f"status={int(res.status)}  iters={int(res.iter_count)}  "
          f"obj={float(res.obj):.8f}  wall={time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
