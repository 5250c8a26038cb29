"""Stage-chained NLPs with natively block-tridiagonal KKT systems.

Capability parity target: the reference's ScalableProblems set
(``examples/ScalableProblems/`` — LuksanVlcek1-7 chained NLPs, 1-D slices of
the Mittelmann PDE-control problems) and more broadly every NLP whose sparsity
is a chain: trajectory optimization / MPC, discretized ODE control,
banded-coupled lattices.  The reference feeds such problems to a sparse
multifrontal solver through triplets; here the chain structure is declared up
front and everything stays in batched dense blocks:

    min   sum_k f_k(x_k, x_{k+1}, theta_k)  [+ f_last(x_K)]
    s.t.  g_L_k <= g_k(x_k, x_{k+1}, theta_k) <= g_U_k     k = 0..K-1
          x_L <= x <= x_U

with x partitioned into K+1 groups of ``v`` variables.  The stage callables
are each *one* function vmapped over k (theta carries per-stage data), so
function/gradient evaluation is O(K) batched work, constraint Jacobians are
(K, mk, v) batched stage blocks, and the augmented KKT assembles directly into
the ``BTDMatrix`` block-tridiagonal form consumed by the BCR factorization
(``ipopt_tpu/linalg/block_tridiag.py``) — no dense n x n object ever exists.

Any banded NLP fits by choosing the group width v at least the coupling
half-bandwidth; larger v trades a shorter elimination chain for bigger
(more MXU-friendly) dense blocks.

``canonicalize_chained`` produces a regular ``CanonicalNLP`` (flat closures +
a static ``ChainInfo`` descriptor), so the whole generic IPM — filter line
search, mu strategies, convergence, batching — runs unchanged; only
evaluation and the KKT factorization dispatch on ``nlp.chain``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Any

import numpy as np
import jax
import jax.numpy as jnp

from .options import Options
from .problem import NLP, CanonicalNLP, canonicalize


@dataclasses.dataclass
class ChainedNLP:
    """User spec for a chained problem.

    f_stage(xk, xk1, theta_k) -> scalar, summed over stages.
    g_stage(xk, xk1, theta_k) -> (mk,);  g_L/g_U broadcastable to (K, mk).
    x0: (K+1, v);  x_L/x_U broadcastable to (K+1, v).
    theta: per-stage parameter pytree with leading axis K (optional).
    f_last(xK) -> scalar: optional terminal objective term.
    """

    f_stage: Callable
    g_stage: Callable
    x0: Any
    g_L: Any = None
    g_U: Any = None
    x_L: Any = None
    x_U: Any = None
    theta: Any = None
    f_last: Optional[Callable] = None
    name: str = "chained"


@dataclasses.dataclass(frozen=True, eq=False)
class ChainInfo:
    """Static descriptor attached to CanonicalNLP.chain (hashable aux data)."""

    K: int
    v: int
    mk: int
    f_stage: Callable
    g_stage: Callable
    f_last: Optional[Callable]
    eq_mask: np.ndarray     # (K, mk) bool

    @property
    def bs(self):
        """Stage block size of the augmented KKT: [x | s | y]."""
        return self.v + 2 * self.mk

    def _key(self):
        return (self.K, self.v, self.mk, id(self.f_stage), id(self.g_stage),
                id(self.f_last), self.eq_mask.tobytes())

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, ChainInfo) and self._key() == other._key()


def canonicalize_chained(cnlp: ChainedNLP,
                         options: Optional[Options] = None) -> CanonicalNLP:
    opts = options or Options()
    dtype = jnp.float64 if opts.dtype == "float64" else jnp.float32

    x0 = np.asarray(cnlp.x0, np.float64)
    Kp1, v = x0.shape
    K = Kp1 - 1

    theta = cnlp.theta
    if theta is None:
        theta = jnp.zeros((K, 0), dtype)
    else:
        theta = jax.tree.map(lambda t: jnp.asarray(t, dtype), theta)

    th0 = jax.tree.map(lambda t: t[0], theta)
    gshape = jax.eval_shape(cnlp.g_stage, jax.ShapeDtypeStruct((v,), dtype),
                            jax.ShapeDtypeStruct((v,), dtype), th0)
    mk = int(gshape.shape[0])

    f_stage, g_stage, f_last = cnlp.f_stage, cnlp.g_stage, cnlp.f_last

    def f_flat(xfull, params):
        X = xfull.reshape(Kp1, v)
        vals = jax.vmap(f_stage)(X[:-1], X[1:], params["theta"])
        total = jnp.sum(vals)
        if f_last is not None:
            total = total + f_last(X[-1])
        return total

    def g_flat(xfull, params):
        X = xfull.reshape(Kp1, v)
        return jax.vmap(g_stage)(X[:-1], X[1:], params["theta"]).reshape(-1)

    g_L = np.broadcast_to(np.asarray(
        cnlp.g_L if cnlp.g_L is not None else -np.inf, np.float64),
        (K, mk)).reshape(-1)
    g_U = np.broadcast_to(np.asarray(
        cnlp.g_U if cnlp.g_U is not None else np.inf, np.float64),
        (K, mk)).reshape(-1)
    x_L = None if cnlp.x_L is None else np.broadcast_to(
        np.asarray(cnlp.x_L, np.float64), (Kp1, v)).reshape(-1)
    x_U = None if cnlp.x_U is None else np.broadcast_to(
        np.asarray(cnlp.x_U, np.float64), (Kp1, v)).reshape(-1)

    flat = NLP(f=f_flat, g=g_flat, x0=x0.reshape(-1), x_L=x_L, x_U=x_U,
               g_L=g_L, g_U=g_U, params={"theta": theta}, name=cnlp.name)

    gl_eff = np.where(g_L <= opts.nlp_lower_bound_inf, -np.inf, g_L)
    gu_eff = np.where(g_U >= opts.nlp_upper_bound_inf, np.inf, g_U)
    eq_mask = (gl_eff == gu_eff).reshape(K, mk)
    info = ChainInfo(K=K, v=v, mk=mk, f_stage=f_stage, g_stage=g_stage,
                     f_last=f_last, eq_mask=eq_mask)

    # Scaling is computed here from stage Jacobians (the generic
    # gradient-based scaling would materialize a dense Jacobian).
    base = canonicalize(flat, opts.replace(nlp_scaling_method="none"))
    if base.struct.n != Kp1 * v:
        raise ValueError("fixed-variable elimination is not supported for "
                         "chained problems; use fixed_variable_treatment="
                         "'relax_bounds'")
    base = base._replace(chain=info)
    if opts.nlp_scaling_method == "gradient-based":
        base = _chained_gradient_scaling(base, opts)
    return base


def _chained_gradient_scaling(nlp: CanonicalNLP, opts: Options) -> CanonicalNLP:
    """GradientScaling via stage Jacobians (no dense J)."""
    ch: ChainInfo = nlp.chain
    s = nlp.struct
    max_grad = opts.nlp_scaling_max_gradient
    min_val = opts.nlp_scaling_min_value
    x0 = nlp.x0
    dtype = x0.dtype

    gf = nlp.eval_grad_f(x0)
    gnorm = jnp.max(jnp.abs(gf), initial=0.0)
    from .scaling import grad_scale_factor
    df = grad_scale_factor(gnorm, opts, opts.nlp_scaling_obj_target_gradient)
    df = df * opts.obj_scaling_factor

    A, B = stage_jacobians(nlp, x0)  # row_scale is all-ones at this point
    row_norm = jnp.maximum(jnp.max(jnp.abs(A), axis=2, initial=0.0),
                           jnp.max(jnp.abs(B), axis=2, initial=0.0)).reshape(-1)
    dg = grad_scale_factor(row_norm, opts, opts.nlp_scaling_constr_target_gradient)
    c_scale = dg[jnp.asarray(s.eq_idx)] if s.me else nlp.c_scale
    d_scale = dg[jnp.asarray(s.ineq_idx)] if s.mi else nlp.d_scale
    return nlp._replace(
        obj_scale=jnp.asarray(df, dtype),
        c_scale=c_scale.astype(dtype), d_scale=d_scale.astype(dtype),
        d_L=nlp.d_L * d_scale, d_U=nlp.d_U * d_scale)


# ---------------------------------------------------------------------------
# Structured evaluation helpers (used by kkt.evaluate / scaling / step)
# ---------------------------------------------------------------------------

def stage_jacobians(nlp: CanonicalNLP, x):
    """Scaled stage Jacobians A (K, mk, v) = d g_k / d x_k and
    B (K, mk, v) = d g_k / d x_{k+1}, including constraint-row scaling."""
    ch: ChainInfo = nlp.chain
    X = x.reshape(ch.K + 1, ch.v)
    theta = nlp.params["theta"]

    def jac_one(xk, xk1, th):
        JA = jax.jacfwd(lambda a: ch.g_stage(a, xk1, th))(xk)
        JB = jax.jacfwd(lambda b: ch.g_stage(xk, b, th))(xk1)
        return JA, JB

    A, B = jax.vmap(jac_one)(X[:-1], X[1:], theta)
    rs = row_scale(nlp)
    return A * rs[..., None], B * rs[..., None]


def row_scale(nlp: CanonicalNLP):
    """(K, mk) per-row scaling factor (c_scale on eq rows, d_scale on ineq)."""
    ch: ChainInfo = nlp.chain
    s = nlp.struct
    flat = jnp.ones((ch.K * ch.mk,), nlp.x0.dtype)
    if s.me:
        flat = flat.at[jnp.asarray(s.eq_idx)].set(nlp.c_scale)
    if s.mi:
        flat = flat.at[jnp.asarray(s.ineq_idx)].set(nlp.d_scale)
    return flat.reshape(ch.K, ch.mk)


def stage_hessians(nlp: CanonicalNLP, x, y_c, y_d):
    """Scaled Lagrangian Hessian stage blocks.

    Returns (Wd (K+1, v, v), Wo (K, v, v)) with Wo[k] = W[x_{k+1}, x_k].
    """
    ch: ChainInfo = nlp.chain
    s = nlp.struct
    X = x.reshape(ch.K + 1, ch.v)
    theta = nlp.params["theta"]
    dtype = x.dtype

    # Effective multipliers in raw-g space: y_row * row_scale.
    y_flat = jnp.zeros((ch.K * ch.mk,), dtype)
    if s.me:
        y_flat = y_flat.at[jnp.asarray(s.eq_idx)].set(y_c)
    if s.mi:
        y_flat = y_flat.at[jnp.asarray(s.ineq_idx)].set(y_d)
    Y = (y_flat.reshape(ch.K, ch.mk) * row_scale(nlp))

    obj_scale = nlp.obj_scale

    def hess_one(xk, xk1, th, yk):
        def lag(z):
            a, b = z[:ch.v], z[ch.v:]
            val = obj_scale * ch.f_stage(a, b, th)
            val = val + jnp.dot(yk, ch.g_stage(a, b, th))
            return val
        return jax.hessian(lag)(jnp.concatenate([xk, xk1]))

    H = jax.vmap(hess_one)(X[:-1], X[1:], theta, Y)
    vv = ch.v
    Wd = jnp.zeros((ch.K + 1, vv, vv), dtype)
    Wd = Wd.at[:-1].add(H[:, :vv, :vv])
    Wd = Wd.at[1:].add(H[:, vv:, vv:])
    Wo = H[:, vv:, :vv]
    if ch.f_last is not None:
        Wd = Wd.at[-1].add(obj_scale * jax.hessian(ch.f_last)(X[-1]))
    return Wd, Wo
