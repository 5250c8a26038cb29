"""Decompose the banded-backend per-iteration time on LuksanVlcek1 1e5
(VERDICT r2 weak #3: explain why fact_ms=760 when the raw BCR kernel is
roofline-fast).

Times each piece at the initial iterate:
  jacobian_values / sparse_hessian_values (compressed AD)
  assemble_banded (the scatter-add)
  bcr_factorize (one call)
  banded_factorize_kkt (with the inertia retry loop) + its num_trials
"""
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


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import functools
    global print
    print = functools.partial(print, flush=True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from ipopt_tpu.options import Options
    from ipopt_tpu.modellib import luksan_vlcek1_flat
    from ipopt_tpu.sparse import (canonicalize_sparse, banded_factorize_kkt,
                                  sparse_hessian_values, jacobian_values,
                                  assemble_banded)
    from ipopt_tpu.linalg.block_tridiag import bcr_factorize
    from ipopt_tpu.algorithm.init import default_initialize

    opts = Options(dtype="float32", tol=1e-5, print_level=0,
                   linear_solver="banded-bcr", resto_phase=False)
    t0 = time.perf_counter()
    cnlp = canonicalize_sparse(luksan_vlcek1_flat(n), opts)
    print(f"symbolic_s={time.perf_counter() - t0:.2f} "
          f"nb={cnlp.chain.nb} b={cnlp.chain.b}")

    it = default_initialize(cnlp, opts)
    mu = jnp.asarray(0.1, jnp.float32)
    dwl = jnp.zeros((), jnp.float32)

    print("[timing jac_vals]")
    t_jv = timeit(jax.jit(lambda x: jacobian_values(cnlp, x)), it.x)
    j_vals = jax.jit(lambda x: jacobian_values(cnlp, x))(it.x)
    print(f"  jac_vals={t_jv:.2f}ms")
    t_hv = timeit(jax.jit(lambda it: sparse_hessian_values(cnlp, it)), it)
    h_vals = jax.jit(lambda it: sparse_hessian_values(cnlp, it))(it)
    print(f"  hess_vals={t_hv:.2f}ms")

    zero = jnp.zeros((), jnp.float32)
    asm = jax.jit(lambda j, h: assemble_banded(cnlp, it, j, h, zero,
                                               jnp.asarray(1e-8, jnp.float32)))
    t_asm = timeit(asm, j_vals, h_vals)
    Kb = asm(j_vals, h_vals)
    print(f"  assemble={t_asm:.2f}ms")

    t_fact = timeit(jax.jit(lambda K: bcr_factorize(K, use_pallas=True)), Kb)
    fac = jax.jit(lambda K: bcr_factorize(K, use_pallas=True))(Kb)
    print(f"inertia at x0: pos={int(fac.num_pos)} neg={int(fac.num_neg)} "
          f"zero={int(fac.num_zero)} "
          f"(expected pos={cnlp.chain.n + cnlp.chain.mi + cnlp.chain.n_pad} "
          f"neg={cnlp.chain.me + cnlp.chain.mi})")

    full = jax.jit(lambda it, h, mu, dwl:
                   banded_factorize_kkt(cnlp, opts, it, h, mu, dwl))
    t_full = timeit(full, it, h_vals, mu, dwl, reps=3)
    out = full(it, h_vals, mu, dwl)
    print(f"jac_vals={t_jv:.2f}ms hess_vals={t_hv:.2f}ms "
          f"assemble={t_asm:.2f}ms bcr_fact={t_fact:.2f}ms")
    print(f"banded_factorize_kkt={t_full:.2f}ms trials={int(out.num_trials)} "
          f"failed={bool(out.failed)} delta_x={float(out.delta_x):.2e} "
          f"delta_c={float(out.delta_c):.2e}")


if __name__ == "__main__":
    main()
