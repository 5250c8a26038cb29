"""Python side of the C API bridge (reference: StdInterfaceTNLP,
src/Interfaces/IpStdInterfaceTNLP.cpp).

``solve_from_c`` receives raw C callback pointers (as integers) from
native/ipopt_tpu_c.cpp, rebuilds them with ctypes, and wraps them into a
CanonicalNLP whose evaluations go through ``jax.pure_callback`` — the host
round-trips are the same contract as the reference's C-callback TNLP.
Derivatives: user-supplied dense grad/jacobian callbacks if given, else
finite differences (``jacobian_approximation`` semantics,
IpTNLPAdapter.hpp:258).  The Hessian is always approximated (L-BFGS), as with
Ipopt's ``hessian_approximation=limited-memory`` recommendation for the C API
without eval_h.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import os

import numpy as np
import jax

# The C API contract is double precision (ipnumber = double), matching the
# reference's Number=double default.
jax.config.update("jax_enable_x64", True)
# C callbacks require host-callback support, which remote-tunneled TPU
# platforms lack; run the callback-driven path on CPU unless overridden.
jax.config.update("jax_platforms",
                  os.environ.get("IPOPT_TPU_C_PLATFORM", "cpu"))

import jax.numpy as jnp

from ..problem import NLP
from ..options import Options
from ..types import SolverReturn, ApplicationReturnStatus, SOLVER_TO_APP_STATUS
from ..algorithm.solver import solve

_EVAL_F = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)
_EVAL_G = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                           ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)
_EVAL_GRAD_F = _EVAL_F.__class__  # same shape as _EVAL_F with grad out
_EVAL_GRAD_F = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.c_void_p)
_EVAL_JAC_G = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                               ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)


def _as_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_from_c(n, m, x0, x_L, x_U, g_L, g_U, f_ptr, g_ptr, grad_ptr,
                 jac_ptr, user_data, options_repr):
    f_cb = _EVAL_F(f_ptr)
    g_cb = _EVAL_G(g_ptr) if (g_ptr and m > 0) else None
    grad_cb = _EVAL_GRAD_F(grad_ptr) if grad_ptr else None
    jac_cb = _EVAL_JAC_G(jac_ptr) if (jac_ptr and m > 0) else None
    ud = ctypes.c_void_p(user_data)
    fd_h = 1e-7

    def f_host(x):
        xa = np.ascontiguousarray(np.asarray(x, np.float64))
        out = np.zeros(1)
        f_cb(n, _as_ptr(xa), _as_ptr(out), ud)
        return out[0]

    def g_host(x):
        xa = np.ascontiguousarray(np.asarray(x, np.float64))
        out = np.zeros(m)
        g_cb(n, _as_ptr(xa), m, _as_ptr(out), ud)
        return out

    def grad_host(x):
        xa = np.ascontiguousarray(np.asarray(x, np.float64))
        if grad_cb is not None:
            out = np.zeros(n)
            grad_cb(n, _as_ptr(xa), _as_ptr(out), ud)
            return out
        f0 = f_host(xa)
        out = np.zeros(n)
        for i in range(n):
            xp = xa.copy()
            xp[i] += fd_h
            out[i] = (f_host(xp) - f0) / fd_h
        return out

    def jac_host(x):
        xa = np.ascontiguousarray(np.asarray(x, np.float64))
        if jac_cb is not None:
            out = np.zeros(m * n)
            jac_cb(n, _as_ptr(xa), m, _as_ptr(out), ud)
            return out.reshape(m, n)
        g0 = g_host(xa)
        out = np.zeros((m, n))
        for i in range(n):
            xp = xa.copy()
            xp[i] += fd_h
            out[:, i] = (g_host(xp) - g0) / fd_h
        return out

    # JAX-traceable wrappers with custom JVPs driven by the host derivatives.
    @jax.custom_jvp
    def f_traced(x):
        return jax.pure_callback(
            lambda xx: np.float64(f_host(xx)),
            jax.ShapeDtypeStruct((), jnp.float64), x, vmap_method="sequential")

    @f_traced.defjvp
    def _f_jvp(primals, tangents):
        (x,), (dx,) = primals, tangents
        g = jax.pure_callback(
            lambda xx: np.asarray(grad_host(xx), np.float64),
            jax.ShapeDtypeStruct((n,), jnp.float64), x,
            vmap_method="sequential")
        return f_traced(x), jnp.dot(g, dx)

    if m > 0:
        @jax.custom_jvp
        def g_traced(x):
            return jax.pure_callback(
                lambda xx: np.asarray(g_host(xx), np.float64),
                jax.ShapeDtypeStruct((m,), jnp.float64), x,
                vmap_method="sequential")

        @g_traced.defjvp
        def _g_jvp(primals, tangents):
            (x,), (dx,) = primals, tangents
            J = jax.pure_callback(
                lambda xx: np.asarray(jac_host(xx), np.float64),
                jax.ShapeDtypeStruct((m, n), jnp.float64), x,
                vmap_method="sequential")
            return g_traced(x), J @ dx
    else:
        g_traced = None

    opts_dict = eval(options_repr, {"__builtins__": {}}, {})
    opts = Options().replace(
        hessian_approximation="limited-memory",  # no eval_h in the C API yet
        **opts_dict)

    nlp = NLP(f=f_traced, g=g_traced,
              x0=np.asarray(x0, np.float64),
              x_L=np.asarray(x_L, np.float64), x_U=np.asarray(x_U, np.float64),
              g_L=np.asarray(g_L, np.float64) if m else None,
              g_U=np.asarray(g_U, np.float64) if m else None,
              name="c_api")
    res = solve(nlp, opts)

    status = SOLVER_TO_APP_STATUS.get(
        SolverReturn(int(res.status)), ApplicationReturnStatus.INTERNAL_ERROR)
    zs = list(np.asarray(res.z_L, float)) + list(np.asarray(res.z_U, float))
    return (int(status), [float(v) for v in np.asarray(res.x)],
            float(res.obj), [float(v) for v in np.asarray(res.g)],
            [float(v) for v in np.asarray(res.y)], zs, int(res.iter_count))
