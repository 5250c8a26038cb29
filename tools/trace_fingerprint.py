"""Fingerprint the lowered HLO of every driver-bench program.

Usage:  python tools/trace_fingerprint.py [--save FILE] [--check FILE]

The bench compile cache is warmed hours before the driver runs; any commit
that changes a jitted program under DEFAULT bench options invalidates that
warming and the driver then hits multi-minute cold remote-tunnel compiles
(the r3/r4 failure mode).  This tool hashes the backend-independent
StableHLO of each bench-phase program (lowered on host CPU with the same
dtype/options the TPU child uses) so an edit's trace-neutrality can be
verified in seconds instead of discovered at bench time.
"""
import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # mirror the TPU child (f32)

import jax.numpy as jnp  # noqa: E402


def _opts():
    from ipopt_tpu.options import Options
    return Options(dtype="float32", tol=1e-5, print_level=0,
                   acceptable_tol=1e-4, acceptable_iter=10)


def _normalize(txt: str) -> str:
    # strip location metadata / module names that vary without semantic change
    txt = re.sub(r'loc\([^)]*\)', '', txt)
    txt = re.sub(r'#loc\d* = .*', '', txt)
    return txt


def fp_hs071():
    from ipopt_tpu.batch import stack_problems, _solve_batched_jit
    from ipopt_tpu.problem import NLP
    opts = _opts()

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

    # B=8 stands in for B=512: same program modulo the batch dimension
    nlp_b = stack_problems([family(0.005 * i) for i in range(8)], opts)
    return jax.jit(_solve_batched_jit, static_argnames=("opts",)).lower(
        nlp_b, opts).as_text()


def fp_banded():
    from ipopt_tpu.modellib import luksan_vlcek1_flat
    from ipopt_tpu.sparse import canonicalize_sparse
    from ipopt_tpu.algorithm.solver import _solve_canonical
    opts = _opts().replace(linear_solver="banded-bcr", resto_phase=False)
    cnlp = canonicalize_sparse(luksan_vlcek1_flat(4096), opts)
    return jax.jit(_solve_canonical, static_argnames=("opts",)).lower(
        cnlp, opts).as_text()


def fp_mittelmann():
    from ipopt_tpu.modellib import mittelmann_dist_control
    from ipopt_tpu.sparse import canonicalize_sparse
    from ipopt_tpu.algorithm.solver import _solve_canonical
    opts = _opts().replace(linear_solver="banded-bcr", resto_phase=False,
                           linear_system_scaling="mc19")
    cnlp = canonicalize_sparse(mittelmann_dist_control(20), opts)
    return jax.jit(_solve_canonical, static_argnames=("opts",)).lower(
        cnlp, opts).as_text()


def fp_chained():
    from ipopt_tpu.modellib import luksan_vlcek1
    from ipopt_tpu.chained import canonicalize_chained
    from ipopt_tpu.algorithm.solver import _solve_canonical
    opts = _opts()
    cnlp = canonicalize_chained(luksan_vlcek1(512, 16), opts)
    return jax.jit(_solve_canonical, static_argnames=("opts",)).lower(
        cnlp, opts).as_text()


PROGRAMS = {
    "hs071_batched": fp_hs071,
    "lv1_banded": fp_banded,
    "mittelmann": fp_mittelmann,
    "lv1_chained": fp_chained,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", default=None)
    ap.add_argument("--check", default=None)
    args = ap.parse_args()

    fps = {}
    for name, fn in PROGRAMS.items():
        txt = _normalize(fn())
        fps[name] = hashlib.sha256(txt.encode()).hexdigest()[:16]
        print(f"{name}: {fps[name]}")

    if args.save:
        with open(args.save, "w") as f:
            json.dump(fps, f, indent=1)
        print(f"saved -> {args.save}")
    if args.check:
        with open(args.check) as f:
            ref = json.load(f)
        bad = {k: (ref.get(k), v) for k, v in fps.items() if ref.get(k) != v}
        if bad:
            print("TRACE CHANGED:", bad)
            sys.exit(1)
        print("trace-neutral: all programs match", args.check)


if __name__ == "__main__":
    main()
