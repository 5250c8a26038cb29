"""Benchmark suite (BASELINE.md protocol, run on the attached device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Headline metric: batched HS071-family NLPs/second (vmapped lockstep IPM)
vs scipy SLSQP on CPU (reference Ipopt+MA57 cannot be built in this image —
no HSL/MUMPS, no egress).

Architecture (round 3): every phase runs in a FRESH SUBPROCESS because any
device->host transfer permanently degrades all later dispatches on the
tunneled TPU to ~100 ms each (see BASELINE.md "dispatch poison").  Within a
phase the order is strictly build -> compile/warm -> time -> transfer.
Each phase has a hard subprocess timeout and the parent always emits the
final JSON line, whatever the children do.

Scale metrics (BASELINE.md items 3-4, VERDICT r2 next-round item 1):
- lv1_banded_1e5 / 1e6: LuksanVlcek1 as a flat NLP through the
  general-sparsity banded-BCR backend (declared pattern -> RCM -> BCR).
- mittelmann_N100: 2-D PDE distributed control (MittelmannDistCntrlNeumA1)
  at N=100 via the banded backend.
- lv1_chained_4096: LuksanVlcek1 via the chained BTD/BCR backend.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
T_START = time.perf_counter()
# The driver kills the whole bench at ~1200 s (observed r3); keep the total
# and the per-phase timeouts strictly inside that so every phase gets a turn.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1100"))
# A warm-cache phase needs seconds, not minutes; 180 s x 5 phases = 900 s.
# For a local cache-WARMING run (cold remote-tunnel compiles), override both:
#   BENCH_BUDGET_S=7200 BENCH_PHASE_TIMEOUT_S=3600 python bench.py
PHASE_TIMEOUT_S = float(os.environ.get("BENCH_PHASE_TIMEOUT_S", "180"))


def _left():
    return BUDGET_S - (time.perf_counter() - T_START)


# ---------------------------------------------------------------------------
# Phase bodies (run inside the child process)
# ---------------------------------------------------------------------------

def _child_setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    from ipopt_tpu.options import Options
    dtype_str = "float32" if on_tpu else "float64"
    # Single-precision tolerances mirror the reference's IPOPT_SINGLE build
    # defaults (tol 1e-5, IpIpoptData.cpp:27-38).
    tol = 1e-5 if dtype_str == "float32" else 1e-8
    opts = Options(dtype=dtype_str, tol=tol, print_level=0,
                   acceptable_tol=1e-4 if dtype_str == "float32" else 1e-6,
                   acceptable_iter=10)
    return jax, opts, dtype_str


def _hbm_bw_bytes_per_s(jax):
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    if "v5 lite" in kind or "v5e" in kind:
        return 820e9
    if "v6" in kind:
        return 1640e9
    if "v4" in kind:
        return 1230e9
    return 820e9


def _bcr_traffic_bytes(nb, b, dtype_bytes=4):
    """Estimated HBM traffic of one BCR factorization (~9 passes over the
    2x(nb, b, b) arrays across the geometric levels)."""
    return 9.0 * 2.0 * nb * b * b * dtype_bytes


def phase_hs071(B=512):
    import numpy as np
    jax, opts, dtype_str = _child_setup()
    import jax.numpy as jnp
    from ipopt_tpu.batch import stack_problems, _solve_batched_jit
    from ipopt_tpu.problem import NLP

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

    nlp_b = stack_problems([family(0.005 * i) for i in range(B)], opts)
    nlp_1 = jax.tree.map(lambda x: x[:1], nlp_b)

    # ---- compile + warm (NO device->host transfers before timing) ----
    res = _solve_batched_jit(nlp_b, opts)
    jax.block_until_ready(res.x)
    r1 = _solve_batched_jit(nlp_1, opts)
    jax.block_until_ready(r1.x)

    # ---- time ----
    t0 = time.perf_counter()
    res = _solve_batched_jit(nlp_b, opts)
    jax.block_until_ready(res.x)
    dt_batched = time.perf_counter() - t0

    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        r1 = _solve_batched_jit(nlp_1, opts)
        jax.block_until_ready(r1.x)
    dt_seq = (time.perf_counter() - t0) / reps

    # ---- transfers allowed from here on ----
    n_ok = int(np.sum(np.asarray(res.status) == 0))
    iters_med = int(np.median(np.asarray(res.iter_count)))

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

    return {
        "nlps_per_sec": round(B / dt_batched, 2),
        "batch": B, "converged": n_ok,
        "batched_wall_s": round(dt_batched, 4),
        "sequential_nlps_per_sec": round(1.0 / dt_seq, 2),
        "scipy_slsqp_nlps_per_sec":
            round(slsqp_per_sec, 2) if slsqp_per_sec else None,
        "iters_med": iters_med,
        "dtype": dtype_str,
    }


def _scale_phase(make_cnlp):
    """Common body for the banded/chained scale phases: canonicalize, warm,
    time the steady re-solve and the isolated factorize kernel, then (only
    then) transfer statuses."""
    import numpy as np
    jax, opts, dtype_str = _child_setup()
    import jax.numpy as jnp
    from ipopt_tpu.algorithm.solver import solve

    t0 = time.perf_counter()
    cnlp, bopts, fact_builder, shape_info = make_cnlp(opts)
    t_sym = time.perf_counter() - t0

    # ---- compile + warm ----
    r = solve(cnlp, bopts)
    jax.block_until_ready(r.x)
    t_warm = time.perf_counter() - t0 - t_sym

    # ---- time the steady re-solve ----
    t0 = time.perf_counter()
    r = solve(cnlp, bopts)
    jax.block_until_ready(r.x)
    dt = time.perf_counter() - t0

    # ---- time the isolated factorize kernel at the solution iterate ----
    fact_j = jax.jit(fact_builder(cnlp, bopts))
    out = fact_j(r.iterate, r.mu)
    jax.block_until_ready(out.delta_x)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fact_j(r.iterate, r.mu)
    jax.block_until_ready(out.delta_x)
    dt_fact = (time.perf_counter() - t0) / reps

    # ---- transfers allowed from here on ----
    iters = max(int(r.iter_count), 1)
    nb, b = shape_info
    frac = _bcr_traffic_bytes(nb, b) / (dt_fact * _hbm_bw_bytes_per_s(jax))
    return {
        "status": int(r.status), "iters": iters,
        "ms_per_iter": round(dt / iters * 1e3, 3),
        "wall_s": round(dt, 3),
        "warm_s": round(t_warm, 1),
        "fact_ms": round(dt_fact * 1e3, 3),
        "fact_trials": int(out.num_trials),
        "roofline_frac": round(frac, 3),
        "obj": float(r.obj),
        "nb": nb, "block": b, "symbolic_s": round(t_sym, 2),
        "dtype": dtype_str,
    }


def phase_lv1_banded(n):
    """LuksanVlcek1 flat through the general-sparsity banded backend.

    resto_phase=False keeps the nested restoration out of the program at
    this scale (LV1's path never triggers it; tracing it would double the
    remote-compile size) — the measured hot path is unchanged."""
    from ipopt_tpu.modellib import luksan_vlcek1_flat
    from ipopt_tpu.sparse import (canonicalize_sparse, banded_factorize_kkt,
                                  sparse_hessian_values)
    import jax.numpy as jnp

    def make(opts):
        bopts = opts.replace(linear_solver="banded-bcr", resto_phase=False)
        cnlp = canonicalize_sparse(luksan_vlcek1_flat(n), bopts)

        def fact_builder(cnlp, bopts):
            def _fact(it, mu):
                hv = sparse_hessian_values(cnlp, it)
                dwl = jnp.zeros((), it.x.dtype)
                return banded_factorize_kkt(cnlp, bopts, it, hv, mu, dwl)
            return _fact

        return cnlp, bopts, fact_builder, (cnlp.chain.nb, cnlp.chain.b)

    out = _scale_phase(make)
    out["n"] = n
    return out


def phase_mittelmann(N=100):
    """2-D elliptic distributed control at N=100 through the general-
    sparsity backend (MittelmannDistCntrlNeumA1 — the reference registry's
    general-grid-sparsity case)."""
    from ipopt_tpu.modellib import mittelmann_dist_control
    from ipopt_tpu.sparse import (canonicalize_sparse, banded_factorize_kkt,
                                  sparse_hessian_values)
    import jax.numpy as jnp

    def make(opts):
        # mc19/Ruiz equilibration: the N=100 grid packs O(1/mu) Sigmas and
        # O(1) PDE rows into 408-wide blocks; unequilibrated f32 elimination
        # loses the small pivots (r4: status 10 line-search failure at iter 5)
        bopts = opts.replace(linear_solver="banded-bcr", resto_phase=False,
                             linear_system_scaling="mc19")
        cnlp = canonicalize_sparse(mittelmann_dist_control(N), bopts)

        def fact_builder(cnlp, bopts):
            def _fact(it, mu):
                hv = sparse_hessian_values(cnlp, it)
                dwl = jnp.zeros((), it.x.dtype)
                return banded_factorize_kkt(cnlp, bopts, it, hv, mu, dwl)
            return _fact

        return cnlp, bopts, fact_builder, (cnlp.chain.nb, cnlp.chain.b)

    out = _scale_phase(make)
    out["N"] = N
    return out


def phase_lv1_chained(n=4096, v=32):
    from ipopt_tpu.modellib import luksan_vlcek1
    from ipopt_tpu.chained import canonicalize_chained, stage_jacobians
    from ipopt_tpu.algorithm.chained_kkt import chained_factorize_kkt
    from ipopt_tpu.algorithm.step import compute_hessian
    import jax.numpy as jnp

    def make(opts):
        cnlp = canonicalize_chained(luksan_vlcek1(n, v), opts)

        def fact_builder(cnlp, opts):
            def _fact(it, mu):
                AB = stage_jacobians(cnlp, it.x)
                W = compute_hessian(cnlp, it)
                dwl = jnp.zeros((), it.x.dtype)
                return chained_factorize_kkt(cnlp, opts, it, AB, W, mu, dwl)
            return _fact

        ch = cnlp.chain
        return cnlp, opts, fact_builder, (ch.K + 1, ch.bs)

    out = _scale_phase(make)
    out["n"] = n
    out["v"] = v
    return out


PHASES = {
    "hs071": phase_hs071,
    "lv1_banded_1e5": lambda: phase_lv1_banded(100_000),
    "lv1_banded_1e6": lambda: phase_lv1_banded(1_000_000),
    "mittelmann_N100": phase_mittelmann,
    "lv1_chained_4096": phase_lv1_chained,
}

# hs071 first (headline), quick phases next, the heaviest compile (1e6) LAST
# so a cold cache there can never starve the other phases (r3 verdict item 2)
PHASE_ORDER = ["hs071", "lv1_chained_4096", "lv1_banded_1e5",
               "mittelmann_N100", "lv1_banded_1e6"]


def _run_child(name):
    fn = PHASES[name]
    try:
        out = fn()
        print("@@RESULT@@" + json.dumps(out), flush=True)
    except Exception as e:
        print("@@RESULT@@" + json.dumps({"error": repr(e)[:300]}), flush=True)


def _cache_entries():
    try:
        return len(os.listdir(os.path.join(REPO, ".jax_cache")))
    except OSError:
        return 0


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        _run_child(sys.argv[2])
        return

    detail = {}
    for name in PHASE_ORDER:
        left = _left()
        if left < 30:
            detail[name] = {"skipped": f"budget ({int(left)}s left)"}
            print(f"[bench] {name}: skipped (budget)", file=sys.stderr,
                  flush=True)
            continue
        t0 = time.perf_counter()
        cache0 = _cache_entries()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", name],
                capture_output=True, text=True,
                timeout=min(PHASE_TIMEOUT_S, max(left, 30)), cwd=REPO)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("@@RESULT@@")]
            if line:
                detail[name] = json.loads(line[-1][len("@@RESULT@@"):])
            else:
                tail = (proc.stderr or "")[-400:]
                detail[name] = {"error": f"no result (rc={proc.returncode})",
                                "stderr_tail": tail}
        except subprocess.TimeoutExpired:
            detail[name] = {"error": f"phase timeout ({int(PHASE_TIMEOUT_S)}s)"}
        except Exception as e:
            detail[name] = {"error": repr(e)[:300]}
        # new persistent-cache entries => this phase COMPILED (cold cache);
        # a warm phase should show compile_cache_misses == 0
        detail[name]["compile_cache_misses"] = _cache_entries() - cache0
        print(f"[bench] {name}: {json.dumps(detail[name])} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr,
              flush=True)

    hs = detail.get("hs071", {})
    nlps_per_sec = hs.get("nlps_per_sec") or 0.0
    baseline = (hs.get("scipy_slsqp_nlps_per_sec")
                or hs.get("sequential_nlps_per_sec") or 1.0)
    print(json.dumps({
        "metric": "batched_hs071_nlps_per_sec",
        "value": round(nlps_per_sec, 2),
        "unit": "NLPs/s",
        # speedup vs an established sequential CPU solver (scipy SLSQP; the
        # reference Ipopt cannot be built in this image - no sparse solvers)
        "vs_baseline": round(nlps_per_sec / baseline, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
