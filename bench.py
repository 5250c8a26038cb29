"""Benchmark suite (BASELINE.md protocol, run on the attached device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Headline metric: batched HS071-family NLPs/second (vmapped lockstep IPM)
vs scipy SLSQP on CPU (reference Ipopt+MA57 cannot be built in this image —
no HSL/MUMPS, no egress).

Measurement protocol for the tunneled TPU (round 5; supersedes the r3
"dispatch poison" model — see BASELINE.md):
- ``jax.block_until_ready`` DOES NOT BLOCK on the axon tunnel: dispatch is
  lazy and execution is only forced by a device->host transfer.  Every
  timing therefore sandwiches the work between transfers ("forced" timing),
  and the measured per-roundtrip overhead (a trivial jitted op + transfer,
  ~30 ms) is subtracted.
- The first forced execution of a fresh executable pays a one-time
  program-load through the tunnel (minutes for a 74 MB executable); it is
  reported as ``load_s`` and excluded from the steady-state numbers.
- Setup work (canonicalize, problem stacking) runs on the host CPU backend
  (``jax_platforms="axon,cpu"``): on the tunnel every tiny eager op is a
  network round trip (512 canonicalizations: ~500 s tunneled, ~37 s host).
- Every phase runs in a fresh subprocess with a hard timeout; the parent
  always emits the final JSON line, whatever the children do.

Scale metrics (BASELINE.md items 3-4):
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
# strictly inside that so every phase gets a turn.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1100"))
# Per-phase cap.  A warm phase = deserialize (~20 s) + program upload/load
# (~1-4 min for the big scale programs) + a few forced solves.  Phases run
# fastest-first and each gets min(cap, 0.9 * time left).
PHASE_TIMEOUT_S = float(os.environ.get("BENCH_PHASE_TIMEOUT_S", "420"))


def _left():
    return BUDGET_S - (time.perf_counter() - T_START)


# ---------------------------------------------------------------------------
# Phase bodies (run inside the child process)
# ---------------------------------------------------------------------------

def _child_setup():
    # Expose the host CPU backend next to the tunneled TPU so that setup
    # work (canonicalize / stacking) never rides the tunnel.  The ambient
    # env pins JAX_PLATFORMS=axon; config must be updated before backend
    # initialization (a sitecustomize pre-imports jax but does not
    # initialize a backend).
    import jax
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "axon,cpu")
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


def _roundtrip_overhead_s(jax):
    """Median cost of (trivial jitted op + scalar transfer): the fixed
    per-forced-execution overhead to subtract from timed sections."""
    import jax.numpy as jnp
    one = jnp.ones(())
    f = jax.jit(lambda a: a * 1.0)
    float(f(one))  # compile + load
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(one))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _timed_forced(fn, force, reps=3, overhead=0.0):
    """min over reps of [dispatch fn() then force a scalar transfer]."""
    best = None
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        force(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return max(best - overhead, 0.0), out


def phase_hs071(B=512):
    import numpy as np
    jax, opts, dtype_str = _child_setup()
    import jax.numpy as jnp
    from ipopt_tpu.batch import (stack_problems, _solve_batched_jit,
                                 host_cpu_device, device_put_tree)
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

    t0 = time.perf_counter()
    nlp_b = stack_problems([family(0.005 * i) for i in range(B)], opts)
    t_build = time.perf_counter() - t0
    if host_cpu_device() is not None:
        nlp_b = device_put_tree(nlp_b)
    nlp_1 = jax.tree.map(lambda x: x[:1], nlp_b)

    # ---- warm + force (program deserialize + tunnel load + first exec) ----
    t0 = time.perf_counter()
    res = _solve_batched_jit(nlp_b, opts)
    float(jnp.sum(res.status))
    load_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    r1 = _solve_batched_jit(nlp_1, opts)
    float(jnp.sum(r1.status))
    load_1 = time.perf_counter() - t0
    ovh = _roundtrip_overhead_s(jax)

    # ---- timed (forced) ----
    dt_batched, res = _timed_forced(
        lambda: _solve_batched_jit(nlp_b, opts),
        lambda r: float(jnp.sum(r.status)), reps=3, overhead=ovh)
    # The single-instance metric is latency-bound: the dispatch+transfer
    # roundtrip IS part of a sequential solve's cost, so no subtraction.
    dt_seq, _ = _timed_forced(
        lambda: _solve_batched_jit(nlp_1, opts),
        lambda r: float(jnp.sum(r.status)), reps=4, overhead=0.0)

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

        nrep = 24
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
        "sequential_nlps_per_sec": round(1.0 / max(dt_seq, 1e-9), 2),
        "scipy_slsqp_nlps_per_sec":
            round(slsqp_per_sec, 2) if slsqp_per_sec else None,
        "iters_med": iters_med,
        "build_s": round(t_build, 1),
        "load_s": round(load_b + load_1, 1),
        "overhead_ms": round(ovh * 1e3, 1),
        "dtype": dtype_str,
    }


def _scale_phase(make_cnlp):
    """Common body for the scale phases: canonicalize on the host, one bulk
    transfer, warm+force (pays the one-time program load), then forced
    steady-state re-solve timing."""
    jax, opts, dtype_str = _child_setup()
    import jax.numpy as jnp
    from ipopt_tpu.algorithm.solver import solve
    from ipopt_tpu.batch import host_cpu_device, device_put_tree

    host = host_cpu_device()
    t0 = time.perf_counter()
    if host is not None:
        with jax.default_device(host):
            cnlp, bopts, shape_info = make_cnlp(opts)
    else:
        cnlp, bopts, shape_info = make_cnlp(opts)
    t_sym = time.perf_counter() - t0
    if host is not None:
        cnlp = device_put_tree(cnlp)

    # ---- warm + force: deserialize + tunnel program load + first exec ----
    t0 = time.perf_counter()
    r = solve(cnlp, bopts)
    float(r.status)
    t_load = time.perf_counter() - t0
    ovh = _roundtrip_overhead_s(jax)

    # ---- steady-state forced re-solve ----
    dt, r = _timed_forced(lambda: solve(cnlp, bopts),
                          lambda rr: float(rr.status), reps=3, overhead=ovh)

    iters = max(int(r.iter_count), 1)
    nb, b = shape_info
    return {
        "status": int(r.status), "iters": iters,
        "ms_per_iter": round(dt / iters * 1e3, 3),
        "wall_s": round(dt, 3),
        "load_s": round(t_load, 1),
        "overhead_ms": round(ovh * 1e3, 1),
        "fact_trials": int(r.counters.n_factorizations) // iters
        if hasattr(r.counters, "n_factorizations") else None,
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
    from ipopt_tpu.sparse import canonicalize_sparse

    def make(opts):
        bopts = opts.replace(linear_solver="banded-bcr", resto_phase=False)
        cnlp = canonicalize_sparse(luksan_vlcek1_flat(n), bopts)
        return cnlp, bopts, (cnlp.chain.nb, cnlp.chain.b)

    out = _scale_phase(make)
    out["n"] = n
    return out


def phase_mittelmann(N=100):
    """2-D elliptic distributed control at N=100 through the general-
    sparsity backend (MittelmannDistCntrlNeumA1 — the reference registry's
    general-grid-sparsity case)."""
    from ipopt_tpu.modellib import mittelmann_dist_control
    from ipopt_tpu.sparse import canonicalize_sparse

    def make(opts):
        # mc19/Ruiz equilibration: the N=100 grid packs O(1/mu) Sigmas and
        # O(1) PDE rows into 408-wide blocks; unequilibrated f32 elimination
        # loses the small pivots.  f32 accuracy floor (r5, measured on CPU
        # f32 too): the h^-2 ~ 1e4 PDE conditioning stalls the scaled NLP
        # error at ~2.5e-4 regardless of linear-solver precision (double
        # refinement and float64 factorization both leave the stall), so
        # the phase targets tol 1e-3 — the f32-reachable optimum; tol<=1e-5
        # on this problem needs dtype=float64.
        # The UNSCALED gates must also be f32-reachable: gradient scaling
        # divides the 1e4-magnitude PDE rows by ~1e2, so an f32 scaled
        # residual of ~1e-4 is an unscaled violation of ~1e-2 — the
        # defaults (constr_viol 1e-4, dual_inf 1) can never fire here.
        bopts = opts.replace(linear_solver="banded-bcr", resto_phase=False,
                             linear_system_scaling="mc19",
                             tol=max(opts.tol, 1e-3),
                             acceptable_tol=max(opts.acceptable_tol, 1e-2),
                             constr_viol_tol=1e-2, compl_inf_tol=1e-2,
                             dual_inf_tol=10.0,
                             acceptable_constr_viol_tol=1e-1,
                             acceptable_compl_inf_tol=1e-1)
        cnlp = canonicalize_sparse(mittelmann_dist_control(N), bopts)
        return cnlp, bopts, (cnlp.chain.nb, cnlp.chain.b)

    out = _scale_phase(make)
    out["N"] = N
    return out


def phase_lv1_chained(n=4096, v=32):
    from ipopt_tpu.modellib import luksan_vlcek1
    from ipopt_tpu.chained import canonicalize_chained

    def make(opts):
        cnlp = canonicalize_chained(luksan_vlcek1(n, v), opts)
        ch = cnlp.chain
        return cnlp, opts, (ch.K + 1, ch.bs)

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

# hs071 first (headline), then the scale phases by ascending program-load
# cost; mittelmann LAST — its b=408 program has the slowest tunnel load and
# must never starve the LuksanVlcek scale numbers (r5 full-run lesson).
PHASE_ORDER = ["hs071", "lv1_chained_4096", "lv1_banded_1e5",
               "lv1_banded_1e6", "mittelmann_N100"]


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
        if left < 60:
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
                timeout=min(PHASE_TIMEOUT_S, max(0.9 * left, 60)), cwd=REPO)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("@@RESULT@@")]
            if line:
                detail[name] = json.loads(line[-1][len("@@RESULT@@"):])
            else:
                tail = (proc.stderr or "")[-400:]
                detail[name] = {"error": f"no result (rc={proc.returncode})",
                                "stderr_tail": tail}
        except subprocess.TimeoutExpired:
            detail[name] = {"error": f"phase timeout "
                                     f"({int(time.perf_counter() - t0)}s)"}
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
