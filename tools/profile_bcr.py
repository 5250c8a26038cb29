"""Per-component device-time profile of the BCR factorize hot path
(VERDICT r2 "What's weak" #3/#4: profile one real iteration before
optimizing anything else).

Times, on the attached TPU, for several (nb, b) shapes:
  - bcr_factorize (full, one call — NO retry loop)
  - the per-level pieces in isolation at level-0 size:
      * pallas factor (pallas_block_ldlt)
      * log-depth triangular inversion
      * single-sweep Gauss-Jordan inverse (pallas_block_ldlt_inv)
      * the 4 level einsums
  - bcr_solve for one rhs

Run: python tools/profile_bcr.py [--shapes small]
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def synth_btd(nb, b, seed=0):
    """Well-conditioned quasi-definite block-tridiagonal test matrix."""
    rng = np.random.RandomState(seed)
    diag = rng.standard_normal((nb, b, b)).astype(np.float32) * 0.1
    diag = diag + np.swapaxes(diag, 1, 2)
    eye = np.eye(b, dtype=np.float32)
    diag = diag + 4.0 * eye[None]
    sub = rng.standard_normal((nb, b, b)).astype(np.float32) * 0.1
    return jnp.asarray(diag), jnp.asarray(sub)


def main():
    from ipopt_tpu.linalg.block_tridiag import (
        BTDMatrix, bcr_factorize, bcr_solve, batched_block_ldlt,
        _tri_unit_inv_logdepth)
    from ipopt_tpu.linalg.pallas_ldlt import (pallas_block_ldlt,
                                              pallas_block_ldlt_inv)

    shapes = [(12500, 16), (6250, 32), (3125, 64), (1568, 128),
              (128, 156), (128, 160)]
    print(f"backend={jax.default_backend()} "
          f"dev={jax.devices()[0].device_kind}")

    for nb, b in shapes:
        diag, sub = synth_btd(nb, b)
        K = BTDMatrix(diag=diag, sub=sub)

        fact = jax.jit(lambda K: bcr_factorize(K))
        t_fact = timeit(fact, K)

        # per-component at level-0 size (ne = nb // 2)
        ne = nb // 2
        A = diag[:ne]
        t_pfac = timeit(jax.jit(pallas_block_ldlt), A)
        L, d = pallas_block_ldlt(A)
        t_inv_log = timeit(jax.jit(_tri_unit_inv_logdepth), L)
        t_gj = timeit(jax.jit(lambda A: pallas_block_ldlt_inv(A)[1:]), A)
        Ainv = jnp.linalg.inv(A + 5.0 * jnp.eye(b)[None])
        Ca = sub[:ne]
        ein = jax.jit(lambda Ainv, Ca: jnp.einsum("nij,njk->nik", Ainv, Ca))
        t_ein = timeit(ein, Ainv, Ca)

        rhs = jnp.asarray(np.random.RandomState(1)
                          .standard_normal(nb * b).astype(np.float32))
        f = fact(K)
        t_solve = timeit(jax.jit(bcr_solve), f, rhs)

        traffic = 9.0 * 2.0 * nb * b * b * 4
        roof_ms = traffic / 820e9 * 1e3
        print(f"nb={nb:6d} b={b:4d}: fact={t_fact:8.2f}ms "
              f"(roofline {roof_ms:6.2f}ms, {roof_ms / t_fact * 100:5.1f}%) "
              f"solve={t_solve:7.2f}ms | lvl0: pallas_fac={t_pfac:6.2f} "
              f"inv_log={t_inv_log:6.2f} gj_inv={t_gj:6.2f} "
              f"einsum={t_ein:6.2f}")


if __name__ == "__main__":
    main()
