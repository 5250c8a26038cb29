"""Benchmark: batched HS071-family NLP throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: NLPs solved per second for a batch of HS071-family instances (vmapped
lockstep IPM, float32 + tol 1e-6 on TPU).  vs_baseline is the speedup against
solving instances one-at-a-time on the same device (the "many sequential Ipopt
processes" pattern the batch mode replaces; reference CPU Ipopt+MA57 numbers
land in a later round once the reference is built locally).
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU compiles go through a remote tunnel here
# and dominate wall time; cache them across bench runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    global T_START
    T_START = time.perf_counter()
    from ipopt_tpu.options import Options
    from ipopt_tpu.batch import stack_problems, _solve_batched_jit
    from ipopt_tpu.problem import NLP

    on_tpu = jax.default_backend() != "cpu"
    dtype_str = "float32" if on_tpu else "float64"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    # Single-precision tolerances mirror the reference's IPOPT_SINGLE build
    # defaults (tol 1e-5, IpIpoptData.cpp:27-38).
    tol = 1e-5 if dtype_str == "float32" else 1e-8

    def family(delta):
        return NLP(
            f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
            g=lambda x: jnp.array([
                x[0] * x[1] * x[2] * x[3],
                x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
            x_L=1.0, x_U=5.0,
            g_L=jnp.array([25.0, 40.0 + delta]),
            g_U=jnp.array([2e19, 40.0 + delta]),
            x0=jnp.array([1.0, 5.0, 5.0, 1.0]))

    opts = Options(dtype=dtype_str, tol=tol, print_level=0,
                   acceptable_tol=1e-4 if dtype_str == "float32" else 1e-6,
                   acceptable_iter=10)
    B = 512
    nlp_b = stack_problems([family(0.005 * i) for i in range(B)], opts)

    # --- batched throughput ---
    res = _solve_batched_jit(nlp_b, opts)  # compile + run
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = _solve_batched_jit(nlp_b, opts)
    jax.block_until_ready(res.x)
    dt_batched = time.perf_counter() - t0
    n_ok = int(np.sum(np.asarray(res.status) == 0))
    nlps_per_sec = B / dt_batched

    # --- sequential baseline (same device, one at a time) ---
    nlp_1 = jax.tree.map(lambda x: x[:1], nlp_b)
    r1 = _solve_batched_jit(nlp_1, opts)
    jax.block_until_ready(r1.x)
    reps = 8
    t0 = time.perf_counter()
    for i in range(reps):
        r1 = _solve_batched_jit(nlp_1, opts)
        jax.block_until_ready(r1.x)
    dt_seq = (time.perf_counter() - t0) / reps
    seq_per_sec = 1.0 / dt_seq

    # --- external CPU baseline: scipy SLSQP on the same family ------------
    # (reference Ipopt+MA57 cannot be built here: no sparse-solver libraries
    # in the image; SLSQP is the stand-in established CPU solver)
    slsqp_per_sec = None
    try:
        from scipy.optimize import minimize, NonlinearConstraint

        def scipy_one(d):
            fo = lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]
            c1 = NonlinearConstraint(
                lambda x: x[0] * x[1] * x[2] * x[3], 25.0, np.inf)
            c2 = NonlinearConstraint(
                lambda x: np.sum(x ** 2), 40.0 + d, 40.0 + d)
            return minimize(fo, np.array([1.0, 5, 5, 1]), method="SLSQP",
                            bounds=[(1, 5)] * 4, constraints=[c1, c2],
                            options={"ftol": 1e-9, "maxiter": 100})

        nrep = 40
        t0 = time.perf_counter()
        for i in range(nrep):
            scipy_one(0.005 * (i % 50))
        slsqp_per_sec = nrep / (time.perf_counter() - t0)
    except Exception:
        pass

    # --- structured (block-tridiagonal) KKT: LuksanVlcek1 -----------------
    # The remote TPU compile of the chained solver is expensive and is NOT
    # captured by the persistent cache; keep the size moderate and make the
    # phase skippable so the headline metric always lands.
    lv = {}
    t_budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    if os.environ.get("BENCH_SKIP_LV1") or time.perf_counter() - T_START > t_budget:
        lv = {"lv1_skipped": True}
        print(json.dumps(_result(nlps_per_sec, seq_per_sec, slsqp_per_sec,
                                 B, n_ok, dtype_str, dt_batched, res, lv)))
        return
    try:
        from ipopt_tpu.modellib import luksan_vlcek1
        from ipopt_tpu.chained import canonicalize_chained
        from ipopt_tpu.algorithm.solver import solve as _solve
        n_lv, v_lv = 4096, 32
        lv_nlp = canonicalize_chained(luksan_vlcek1(n_lv, v_lv), opts)
        r = _solve(lv_nlp, opts)
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = _solve(lv_nlp, opts)
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        iters = max(int(r.iter_count), 1)
        lv = {"lv1_n": n_lv, "lv1_status": int(r.status),
              "lv1_iters": iters,
              "lv1_ms_per_iter": round(dt / iters * 1e3, 2),
              "lv1_wall_s": round(dt, 3)}
    except Exception as e:  # keep the headline metric alive regardless
        lv = {"lv1_error": repr(e)[:200]}

    print(json.dumps(_result(nlps_per_sec, seq_per_sec, slsqp_per_sec, B,
                             n_ok, dtype_str, dt_batched, res, lv)))


def _result(nlps_per_sec, seq_per_sec, slsqp_per_sec, B, n_ok, dtype_str,
            dt_batched, res, lv):
    baseline = slsqp_per_sec if slsqp_per_sec else seq_per_sec
    return {
        "metric": "batched_hs071_nlps_per_sec",
        "value": round(nlps_per_sec, 2),
        "unit": "NLPs/s",
        # speedup vs an established sequential CPU solver (scipy SLSQP; the
        # reference Ipopt cannot be built in this image - no sparse solvers)
        "vs_baseline": round(nlps_per_sec / baseline, 2),
        "detail": {
            "batch": B, "converged": n_ok, "dtype": dtype_str,
            "backend": jax.default_backend(),
            "batched_wall_s": round(dt_batched, 4),
            "sequential_nlps_per_sec": round(seq_per_sec, 2),
            "scipy_slsqp_nlps_per_sec":
                round(slsqp_per_sec, 2) if slsqp_per_sec else None,
            "iters_med": int(np.median(np.asarray(res.iter_count))),
            **lv,
        },
    }


if __name__ == "__main__":
    main()
