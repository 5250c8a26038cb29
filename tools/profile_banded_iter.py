"""Decompose the banded-backend per-iteration time on LuksanVlcek1
(VERDICT r2 weak #3).  Strict order: build -> warm -> time -> transfer
(any device->host transfer poisons later dispatches, see BASELINE.md).

Times each piece at the initial iterate: jacobian_values,
sparse_hessian_values, assemble_banded (gather form), bcr_factorize
(with/without equilibration), banded_factorize_kkt (retry loop), bcr_solve.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

print = functools.partial(print, flush=True)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from ipopt_tpu.options import Options
    from ipopt_tpu.modellib import luksan_vlcek1_flat
    from ipopt_tpu.sparse import (canonicalize_sparse, banded_factorize_kkt,
                                  sparse_hessian_values, jacobian_values,
                                  assemble_banded)
    from ipopt_tpu.linalg.block_tridiag import bcr_factorize, bcr_solve
    from ipopt_tpu.algorithm.init import default_initialize

    opts = Options(dtype="float32", tol=1e-5, print_level=0,
                   linear_solver="banded-bcr", resto_phase=False)
    t0 = time.perf_counter()
    cnlp = canonicalize_sparse(luksan_vlcek1_flat(n), opts)
    print(f"symbolic_s={time.perf_counter() - t0:.2f} "
          f"nb={cnlp.chain.nb} b={cnlp.chain.b} "
          f"n_vals={cnlp.chain.n_vals} kdup={cnlp.chain.asm_src.shape[1]}")

    it = default_initialize(cnlp, opts)
    mu = jnp.asarray(0.1, jnp.float32)
    dwl = jnp.zeros((), jnp.float32)

    jv_j = jax.jit(lambda x: jacobian_values(cnlp, x))
    hv_j = jax.jit(lambda it: sparse_hessian_values(cnlp, it))
    j_vals = jv_j(it.x)
    h_vals = hv_j(it)
    dx0 = jnp.asarray(1e-2, jnp.float32)
    asm = jax.jit(lambda j, h: assemble_banded(cnlp, it, j, h, dx0, dx0))
    Kb = asm(j_vals, h_vals)
    fact_eq = jax.jit(lambda K: bcr_factorize(K,
                                              equilibrate=True))
    fact_ne = jax.jit(lambda K: bcr_factorize(K))
    full = jax.jit(lambda it, h, mu, dwl:
                   banded_factorize_kkt(cnlp, opts, it, h, mu, dwl))
    fac = fact_eq(Kb)
    rhs = jnp.asarray(np.random.RandomState(1)
                      .standard_normal(cnlp.chain.nb * cnlp.chain.b)
                      .astype(np.float32))
    slv = jax.jit(bcr_solve)
    # warm everything BEFORE timing (compiles), no transfers
    out_full = full(it, h_vals, mu, dwl)
    jax.block_until_ready(out_full.delta_x)
    _ = slv(fac, rhs)

    t_jv = timeit(jv_j, it.x)
    t_hv = timeit(hv_j, it)
    t_asm = timeit(asm, j_vals, h_vals)
    t_fe = timeit(fact_eq, Kb)
    t_fn = timeit(fact_ne, Kb)
    t_full = timeit(full, it, h_vals, mu, dwl, reps=3)
    t_slv = timeit(slv, fac, rhs)

    # transfers AFTER all timing
    print(f"jac_vals={t_jv:.2f}ms hess_vals={t_hv:.2f}ms "
          f"assemble={t_asm:.2f}ms fact_eq={t_fe:.2f}ms fact_noeq={t_fn:.2f}ms "
          f"solve={t_slv:.2f}ms")
    print(f"banded_factorize_kkt={t_full:.2f}ms "
          f"trials={int(out_full.num_trials)} "
          f"failed={bool(out_full.failed)} "
          f"delta_x={float(out_full.delta_x):.2e} "
          f"delta_c={float(out_full.delta_c):.2e}")
    f2 = fact_eq(Kb)
    print(f"inertia(dx=1e-2): pos={int(f2.num_pos)} neg={int(f2.num_neg)} "
          f"zero={int(f2.num_zero)} expected pos="
          f"{cnlp.chain.n + cnlp.chain.mi + cnlp.chain.n_pad} "
          f"neg={cnlp.chain.me + cnlp.chain.mi}")


if __name__ == "__main__":
    main()
