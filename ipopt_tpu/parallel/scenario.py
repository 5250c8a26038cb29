"""Scenario-decomposed (two-stage stochastic) NLPs with block-arrow KKT and
Schur-complement reduction over device meshes.

Capability parity: the reference's only distributed-solve capability is MPI
*inside* MUMPS/WSMP (SURVEY.md §2.9); true problem-level decomposition is the
TPU-native replacement demanded by BASELINE.json config 5 ("multi-host
scenario-decomposed stochastic NLP, block-arrow KKT, consensus coupling via
collectives").

Problem form (two-stage stochastic program):

    min  f0(x0) + sum_s f_s(x0, x_s, theta_s)
    s.t. gs_L <= g_s(x0, x_s, theta_s) <= gs_U        s = 1..S
         bounds on x0 and x_s

All scenario callables are one function vmapped over s; theta_s carries the
scenario data (realizations).  The augmented KKT is block-arrow:

    [ K_1          C_1 ]
    [      ...     ... ]
    [          K_S C_S ]
    [ C_1^T ... C_S^T  K_0 ]

with K_s the per-scenario augmented system over w_s = [x_s | s_s | y_s] and
K_0 the shared block over w_0 = [x0].  Factorization = vmapped dense LDL^T of
every K_s + Schur complement S = K_0 - sum_s C_s^T K_s^{-1} C_s; under
``shard_map`` over the scenario axis the sum is a ``psum`` riding ICI — the
communication volume per iteration is one (n0 x n0) matrix and two n0
vectors, independent of scenario count or size.

Inertia (Sylvester): sum of scenario-block inertias (psum'd) plus the Schur
block's — preserving the factorize -> inertia -> perturb contract.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..options import Options
from ..problem import NLP, CanonicalNLP, canonicalize
from ..types import Iterate
from ..linalg.ldlt import ldlt, ldlt_solve, LDLTResult


@dataclasses.dataclass
class ScenarioNLP:
    """User spec.  f_s(x0, xs, theta_s) -> scalar; g_s(x0, xs, theta_s) ->
    (ms,).  x0_init (n0,), xs_init (S, ns)."""

    f_scen: Callable
    g_scen: Callable
    x0_init: Any
    xs_init: Any
    g_L: Any = None          # (S, ms) or (ms,)
    g_U: Any = None
    x0_L: Any = None
    x0_U: Any = None
    xs_L: Any = None
    xs_U: Any = None
    theta: Any = None        # leading axis S
    f0: Optional[Callable] = None
    name: str = "scenario"


@dataclasses.dataclass(frozen=True, eq=False)
class ArrowInfo:
    """Static descriptor on CanonicalNLP.chain-style slot ``arrow``."""

    S: int
    n0: int
    ns: int
    ms: int
    f_scen: Callable
    g_scen: Callable
    f0: Optional[Callable]
    eq_mask: np.ndarray  # (S, ms)

    @property
    def bs(self):
        """Scenario block size [x_s | s_s | y_s]."""
        return self.ns + 2 * self.ms

    def _key(self):
        return (self.S, self.n0, self.ns, self.ms, id(self.f_scen),
                id(self.g_scen), id(self.f0), self.eq_mask.tobytes())

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, ArrowInfo) and self._key() == other._key()


def canonicalize_scenario(sn: ScenarioNLP,
                          options: Optional[Options] = None) -> CanonicalNLP:
    """Flat layout: x = [x0 (n0,) | X_s (S*ns,)]; g rows = (S*ms,)."""
    opts = options or Options()
    dtype = jnp.float64 if opts.dtype == "float64" else jnp.float32

    x0i = np.asarray(sn.x0_init, np.float64)
    xsi = np.asarray(sn.xs_init, np.float64)
    n0 = x0i.shape[0]
    S, ns = xsi.shape

    theta = sn.theta
    if theta is None:
        theta = jnp.zeros((S, 0), dtype)
    else:
        theta = jax.tree.map(lambda t: jnp.asarray(t, dtype), theta)
    th0 = jax.tree.map(lambda t: t[0], theta)
    ms = int(jax.eval_shape(sn.g_scen, jax.ShapeDtypeStruct((n0,), dtype),
                            jax.ShapeDtypeStruct((ns,), dtype), th0).shape[0])

    f_scen, g_scen, f0 = sn.f_scen, sn.g_scen, sn.f0

    def f_flat(xfull, params):
        x0 = xfull[:n0]
        Xs = xfull[n0:].reshape(S, ns)
        total = jnp.sum(jax.vmap(f_scen, in_axes=(None, 0, 0))(
            x0, Xs, params["theta"]))
        if f0 is not None:
            total = total + f0(x0)
        return total

    def g_flat(xfull, params):
        x0 = xfull[:n0]
        Xs = xfull[n0:].reshape(S, ns)
        return jax.vmap(g_scen, in_axes=(None, 0, 0))(
            x0, Xs, params["theta"]).reshape(-1)

    def bc(b, default, shape):
        if b is None:
            return np.full(shape, default)
        return np.broadcast_to(np.asarray(b, np.float64), shape)

    g_L = bc(sn.g_L, -np.inf, (S, ms)).reshape(-1)
    g_U = bc(sn.g_U, np.inf, (S, ms)).reshape(-1)
    x_L = np.concatenate([bc(sn.x0_L, -np.inf, (n0,)),
                          bc(sn.xs_L, -np.inf, (S, ns)).reshape(-1)])
    x_U = np.concatenate([bc(sn.x0_U, np.inf, (n0,)),
                          bc(sn.xs_U, np.inf, (S, ns)).reshape(-1)])

    flat = NLP(f=f_flat, g=g_flat,
               x0=np.concatenate([x0i, xsi.reshape(-1)]),
               x_L=x_L, x_U=x_U, g_L=g_L, g_U=g_U,
               params={"theta": theta}, name=sn.name)

    gl_eff = np.where(g_L <= opts.nlp_lower_bound_inf, -np.inf, g_L)
    gu_eff = np.where(g_U >= opts.nlp_upper_bound_inf, np.inf, g_U)
    eq_mask = (gl_eff == gu_eff).reshape(S, ms)
    info = ArrowInfo(S=S, n0=n0, ns=ns, ms=ms, f_scen=f_scen, g_scen=g_scen,
                     f0=f0, eq_mask=eq_mask)

    base = canonicalize(flat, opts.replace(nlp_scaling_method="none"))
    if base.struct.n != n0 + S * ns:
        raise ValueError("fixed variables not supported in scenario problems")
    base = base._replace(chain=info)
    # gradient scaling via scenario-row norms
    if opts.nlp_scaling_method == "gradient-based":
        base = _scenario_gradient_scaling(base, opts)
    return base


def _scenario_gradient_scaling(nlp: CanonicalNLP, opts: Options) -> CanonicalNLP:
    ar: ArrowInfo = nlp.chain
    s = nlp.struct
    max_grad = opts.nlp_scaling_max_gradient
    min_val = opts.nlp_scaling_min_value
    x0 = nlp.x0
    dtype = x0.dtype
    from ..scaling import grad_scale_factor
    gf = nlp.eval_grad_f(x0)
    gnorm = jnp.max(jnp.abs(gf), initial=0.0)
    df = grad_scale_factor(gnorm, opts, opts.nlp_scaling_obj_target_gradient)
    df = df * opts.obj_scaling_factor
    J0, Js = scenario_jacobians(nlp, x0)
    row_norm = jnp.maximum(jnp.max(jnp.abs(J0), axis=2, initial=0.0),
                           jnp.max(jnp.abs(Js), axis=2, initial=0.0)).reshape(-1)
    dg = grad_scale_factor(row_norm, opts, opts.nlp_scaling_constr_target_gradient)
    c_scale = dg[jnp.asarray(s.eq_idx)] if s.me else nlp.c_scale
    d_scale = dg[jnp.asarray(s.ineq_idx)] if s.mi else nlp.d_scale
    return nlp._replace(
        obj_scale=jnp.asarray(df, dtype),
        c_scale=c_scale.astype(dtype), d_scale=d_scale.astype(dtype),
        d_L=nlp.d_L * d_scale, d_U=nlp.d_U * d_scale)


# ---------------------------------------------------------------------------
# Structured evaluation
# ---------------------------------------------------------------------------

def _split_x(ar: ArrowInfo, x):
    return x[:ar.n0], x[ar.n0:].reshape(ar.S, ar.ns)


def _row_scale(nlp: CanonicalNLP):
    ar: ArrowInfo = nlp.chain
    s = nlp.struct
    flat = jnp.ones((ar.S * ar.ms,), nlp.x0.dtype)
    if s.me:
        flat = flat.at[jnp.asarray(s.eq_idx)].set(nlp.c_scale)
    if s.mi:
        flat = flat.at[jnp.asarray(s.ineq_idx)].set(nlp.d_scale)
    return flat.reshape(ar.S, ar.ms)


def scenario_jacobians(nlp: CanonicalNLP, x):
    """J0 (S, ms, n0) = dg_s/dx0,  Js (S, ms, ns) = dg_s/dx_s (scaled)."""
    ar: ArrowInfo = nlp.chain
    x0, Xs = _split_x(ar, x)
    theta = nlp.params["theta"]

    def jac_one(xs, th):
        JA = jax.jacfwd(lambda a: ar.g_scen(a, xs, th))(x0)
        JB = jax.jacfwd(lambda b: ar.g_scen(x0, b, th))(xs)
        return JA, JB

    J0, Js = jax.vmap(jac_one)(Xs, theta)
    rs = _row_scale(nlp)
    return J0 * rs[..., None], Js * rs[..., None]


def scenario_hessians(nlp: CanonicalNLP, x, y_c, y_d):
    """Lagrangian Hessian blocks: W00 (n0, n0), W0s (S, ns, n0) [rows x_s,
    cols x0], Wss (S, ns, ns)."""
    ar: ArrowInfo = nlp.chain
    s = nlp.struct
    x0, Xs = _split_x(ar, x)
    theta = nlp.params["theta"]
    dtype = x.dtype

    y_flat = jnp.zeros((ar.S * ar.ms,), dtype)
    if s.me:
        y_flat = y_flat.at[jnp.asarray(s.eq_idx)].set(y_c)
    if s.mi:
        y_flat = y_flat.at[jnp.asarray(s.ineq_idx)].set(y_d)
    Y = y_flat.reshape(ar.S, ar.ms) * _row_scale(nlp)
    obj_scale = nlp.obj_scale

    def hess_one(xs, th, yk):
        def lag(z):
            a, b = z[:ar.n0], z[ar.n0:]
            return (obj_scale * ar.f_scen(a, b, th)
                    + jnp.dot(yk, ar.g_scen(a, b, th)))
        return jax.hessian(lag)(jnp.concatenate([x0, xs]))

    H = jax.vmap(hess_one)(Xs, theta, Y)  # (S, n0+ns, n0+ns)
    n0 = ar.n0
    W00 = jnp.sum(H[:, :n0, :n0], axis=0)
    if ar.f0 is not None:
        W00 = W00 + obj_scale * jax.hessian(ar.f0)(x0)
    W0s = H[:, n0:, :n0]
    Wss = H[:, n0:, n0:]
    return W00, W0s, Wss
