"""Problem definition and canonicalization — the TNLP / TNLPAdapter equivalent.

Reference parity:
- ``TNLP`` (``src/Interfaces/IpTNLP.hpp:47``): the user provides n, m, bounds,
  starting point, and callbacks eval_f/grad_f/g/jac_g/h.  Here the user provides
  two **JAX functions** ``f(x)`` and ``g(x)`` plus bound arrays; gradients,
  Jacobians and the Lagrangian Hessian come from autodiff (jax.grad /
  jax.jacfwd / jax.hessian) instead of hand-coded triplets.
- ``TNLPAdapter`` (``src/Interfaces/IpTNLPAdapter.hpp``): converts the general
  form g_L <= g(x) <= g_U into the internal split form c(x)=0 /
  d_L <= d(x) <= d_U, handles fixed variables, and relaxes bounds by
  ``bound_relax_factor`` (``IpOrigIpoptNLP.cpp:54-357`` does the relaxation in
  the reference).  Here that conversion is a *static* (trace-time) analysis done
  once in numpy, producing index sets that become gather/scatter ops — the
  vectorized analogue of the reference's ExpansionMatrix machinery.

All runtime evaluation is pure and jit/vmap-compatible.  Infinite bounds are
handled densely with masks (slack = 1 and multiplier = 0 where a bound is
missing) rather than with compressed vectors, which keeps every shape static.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .options import Options


@dataclasses.dataclass
class NLP:
    """User problem spec:  min f(x)  s.t.  g_L <= g(x) <= g_U,  x_L <= x <= x_U.

    Equalities are expressed as g_L[i] == g_U[i], exactly as in TNLP
    (IpTNLP.hpp:99 get_nlp_info / get_bounds_info).
    """

    f: Callable[[Any], Any]
    x0: Any
    g: Optional[Callable[[Any], Any]] = None
    x_L: Optional[Any] = None
    x_U: Optional[Any] = None
    g_L: Optional[Any] = None
    g_U: Optional[Any] = None
    # Optional runtime parameter pytree: if set, f and g take (x, params) and
    # params may vary per batch instance without retracing (the MPC/OPF
    # pattern).  The reference has no equivalent — parameters must be baked
    # into TNLP callbacks; sIPOPT bolts them on afterwards.
    params: Optional[Any] = None
    # Optional warm-start data (TNLP::get_starting_point with init_z/init_lambda)
    y0: Optional[Any] = None        # constraint multipliers, shape (m,)
    z_L0: Optional[Any] = None
    z_U0: Optional[Any] = None
    # Optional declared sparsity for the banded-BCR backend (TNLP's
    # get_nlp_info/eval_jac_g structure equivalent, IpTNLP.hpp:99):
    # (rows, cols) COO arrays of dg/dx and of the Lagrangian Hessian
    # (either triangle or full; symmetrized internally).  When absent the
    # backend auto-detects the pattern for small problems.
    jac_g_sparsity: Optional[Any] = None
    lag_hess_sparsity: Optional[Any] = None
    name: str = "nlp"


@dataclasses.dataclass(frozen=True, eq=False)
class CanonicalStructure:
    """Static (python/numpy) structure computed once at setup.

    Used as jit-static aux data of the CanonicalNLP pytree, so it must be
    hashable: equality/hash go through the index arrays' bytes.
    """

    n_full: int          # user-visible number of variables
    n: int               # free variables after fixed-variable treatment
    m: int               # total constraints in user space
    me: int              # equality constraints
    mi: int              # inequality constraints
    eq_idx: np.ndarray   # indices into g of equalities, (me,)
    ineq_idx: np.ndarray  # indices into g of inequalities, (mi,)
    free_idx: np.ndarray  # indices into x_full of free variables, (n,)
    fixed_idx: np.ndarray  # indices into x_full of fixed variables
    fixed_treatment: str
    # gradient_approximation="finite-difference-values": forward-difference
    # objective gradient with this perturbation (0 = exact AD gradient;
    # TNLPAdapter GradientApproximation, IpTNLPAdapter.hpp:258-266)
    fd_grad_eps: float = 0.0
    # jacobian_approximation="finite-difference-values": forward-difference
    # constraint Jacobian with this perturbation (0 = exact AD;
    # TNLPAdapter JacobianApproxEnum, IpTNLPAdapter.cpp:256-257)
    fd_jac_eps: float = 0.0

    def _key(self):
        return (self.n_full, self.n, self.m, self.me, self.mi,
                self.eq_idx.tobytes(), self.ineq_idx.tobytes(),
                self.free_idx.tobytes(), self.fixed_idx.tobytes(),
                self.fixed_treatment, self.fd_grad_eps, self.fd_jac_eps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, CanonicalStructure)
                and self._key() == other._key())


class CanonicalNLP(NamedTuple):
    """The internal problem form (NLP layer, IpNLP.hpp:41):

        min f(x)   s.t.  c(x) = 0,   d_L <= d(x) <= d_U,   x_L <= x <= x_U

    with *relaxed* bounds already applied, masks for infinite bounds, and all
    evaluation closures capturing the user's f/g.  This is a pytree whose array
    leaves can be donated/sharded; the callables and structure ride along as
    static fields.
    """

    # static (f and g have the internal signature (x_full, params))
    struct: CanonicalStructure
    f: Callable
    g: Optional[Callable]
    # runtime parameter pytree (array leaves; batched under vmap)
    params: Any
    # arrays (free-variable space, relaxed bounds)
    x_L: Any
    x_U: Any
    d_L: Any
    d_U: Any
    has_xL: Any   # bool masks for finite bounds
    has_xU: Any
    has_dL: Any
    has_dU: Any
    c_rhs: Any    # g_U values on equality rows: c(x) = g_eq(x) - c_rhs
    x_fixed: Any  # values of fixed variables (full space)
    x0: Any
    # original (unrelaxed) bounds for honor_original_bounds / violations
    x_L_orig: Any
    x_U_orig: Any
    # scaling (df scalar, dx (n,), dc (me,), dd (mi,)); applied inside evals
    obj_scale: Any
    c_scale: Any
    d_scale: Any
    # static: chained-structure descriptor (ipopt_tpu.chained.ChainInfo) for
    # the block-tridiagonal KKT backend; None selects the dense backend
    chain: Any = None
    # backend auxiliary ARRAY data (pytree leaves — jit arguments, not
    # trace-time constants): the banded backend's scatter indices/colorings
    # live here so million-entry index arrays don't get baked into the HLO
    # (the remote-compile relay rejects oversized modules).
    aux_arrays: Any = ()

    # -- convenience -------------------------------------------------------
    @property
    def n(self):
        return self.struct.n

    @property
    def me(self):
        return self.struct.me

    @property
    def mi(self):
        return self.struct.mi

    # -- full-space reconstruction ----------------------------------------
    def x_full(self, x):
        """Scatter free variables back into user space (TNLPAdapter::ResortX,
        IpTNLPAdapter.cpp:2400)."""
        s = self.struct
        if s.n == s.n_full:
            return x
        out = self.x_fixed
        return out.at[jnp.asarray(s.free_idx)].set(x)

    # -- evaluation (all pure; scaled) ------------------------------------
    def eval_f(self, x):
        return self.obj_scale * self.f(self.x_full(x), self.params)

    def eval_grad_f(self, x):
        eps = getattr(self.struct, "fd_grad_eps", 0.0)
        if eps:
            # gradient_approximation="finite-difference-values": vmapped
            # forward differences with findiff_perturbation (the reference's
            # GradientApproximation path, IpTNLPAdapter.cpp:1355-1385)
            f0 = self.eval_f(x)
            seeds = jnp.eye(x.shape[0], dtype=x.dtype)
            return jax.vmap(
                lambda e: (self.eval_f(x + eps * e) - f0) / eps)(seeds)
        return jax.grad(self.eval_f)(x)

    def _g_split(self, xf):
        gv = self.g(xf, self.params)
        s = self.struct
        # all-equality (or all-inequality) with identity row order: skip the
        # gather — at n=1e6 the embedded (m,) index constant alone exceeds
        # the remote-compile relay's module size limit (HTTP 413)
        if s.mi == 0 and s.me == s.m:
            return self.c_scale * (gv - self.c_rhs), jnp.zeros((0,), xf.dtype)
        if s.me == 0 and s.mi == s.m:
            return jnp.zeros((0,), xf.dtype), self.d_scale * gv
        c = gv[jnp.asarray(s.eq_idx)] - self.c_rhs if s.me else jnp.zeros((0,), xf.dtype)
        d = gv[jnp.asarray(s.ineq_idx)] if s.mi else jnp.zeros((0,), xf.dtype)
        return self.c_scale * c, self.d_scale * d

    def eval_c(self, x):
        if self.g is None:
            return jnp.zeros((0,), x.dtype)
        return self._g_split(self.x_full(x))[0]

    def eval_d(self, x):
        if self.g is None:
            return jnp.zeros((0,), x.dtype)
        return self._g_split(self.x_full(x))[1]

    def _fd_jac(self, fn, x):
        """Forward-difference dense Jacobian (jacobian_approximation=
        "finite-difference-values", IpTNLPAdapter.cpp:1390-1470): vmapped
        columns (fn(x + eps e_j) - fn(x)) / eps."""
        eps = self.struct.fd_jac_eps
        f0 = fn(x)
        seeds = jnp.eye(x.shape[0], dtype=x.dtype)
        cols = jax.vmap(lambda e: (fn(x + eps * e) - f0) / eps)(seeds)
        return cols.T

    def eval_jac_c(self, x):
        if self.struct.me == 0:
            return jnp.zeros((0, self.n), x.dtype)
        if getattr(self.struct, "fd_jac_eps", 0.0):
            return self._fd_jac(self.eval_c, x)
        return jax.jacfwd(self.eval_c)(x)

    def eval_jac_d(self, x):
        if self.struct.mi == 0:
            return jnp.zeros((0, self.n), x.dtype)
        if getattr(self.struct, "fd_jac_eps", 0.0):
            return self._fd_jac(self.eval_d, x)
        return jax.jacfwd(self.eval_d)(x)

    def eval_lag_hess(self, x, y_c, y_d, obj_factor=1.0):
        """W = obj_factor * sigma_f ∇²f + Σ y_c_i ∇²c_i + Σ y_d_j ∇²d_j.

        Reference: TNLP::eval_h with obj_factor+lambda (IpTNLP.hpp:460); here a
        single jax.hessian of the Lagrangian scalar.
        """
        def lag(xx):
            val = obj_factor * self.eval_f(xx)
            if self.struct.me:
                val = val + jnp.dot(y_c, self.eval_c(xx))
            if self.struct.mi:
                val = val + jnp.dot(y_d, self.eval_d(xx))
            return val
        return jax.hessian(lag)(x)

    def eval_all(self, x):
        """One fused evaluation of f, grad_f, c, d, Jc, Jd (shares the g trace)."""
        return (self.eval_f(x), self.eval_grad_f(x), self.eval_c(x),
                self.eval_d(x), self.eval_jac_c(x), self.eval_jac_d(x))


# Register CanonicalNLP as a pytree where only the array fields are leaves.
_ARRAY_FIELDS = tuple(
    f for f in CanonicalNLP._fields
    if f not in ("struct", "f", "g", "chain"))


def _cnlp_flatten(p: CanonicalNLP):
    children = tuple(getattr(p, name) for name in _ARRAY_FIELDS)
    aux = (p.struct, p.f, p.g, p.chain)
    return children, aux


def _cnlp_unflatten(aux, children):
    struct, f, g, chain = aux
    kwargs = dict(zip(_ARRAY_FIELDS, children))
    return CanonicalNLP(struct=struct, f=f, g=g, chain=chain, **kwargs)


jax.tree_util.register_pytree_node(CanonicalNLP, _cnlp_flatten, _cnlp_unflatten)


def canonicalize(nlp: NLP, options: Optional[Options] = None,
                 dtype=None) -> CanonicalNLP:
    """Build the canonical internal form.  Static analysis in numpy (trace-free).

    Mirrors TNLPAdapter::GetSpaces (IpTNLPAdapter.cpp:313): split constraints
    into equalities/inequalities, apply the fixed-variable treatment, and relax
    bounds by ``bound_relax_factor * max(1, |bound|)`` (IpOrigIpoptNLP.cpp:54).
    """
    opts = options or Options()
    if dtype is None:
        dtype = jnp.float64 if opts.dtype == "float64" else jnp.float32

    x0 = np.asarray(nlp.x0, dtype=np.float64)
    n_full = x0.shape[0]

    def _fill(v, default, size):
        if v is None:
            return np.full((size,), default, dtype=np.float64)
        return np.broadcast_to(np.asarray(v, dtype=np.float64), (size,)).copy()

    def _apply_inf(lo, hi):
        # Bounds beyond nlp_lower/upper_bound_inf count as infinite
        # (TNLPAdapter behavior; hs071 uses 2e19 for "no upper bound").
        lo = np.where(lo <= opts.nlp_lower_bound_inf, -np.inf, lo)
        hi = np.where(hi >= opts.nlp_upper_bound_inf, np.inf, hi)
        return lo, hi

    x_L = _fill(nlp.x_L, -np.inf, n_full)
    x_U = _fill(nlp.x_U, np.inf, n_full)
    x_L, x_U = _apply_inf(x_L, x_U)

    # fixed_variable_treatment = "make_constraint"
    # (IpTNLPAdapter.cpp:463-631): keep x_i as a variable, drop its bounds,
    # and add the equality row x_i = val to g.
    fixed_mask_mc = (x_L == x_U)
    user_g = nlp.g
    user_g_L, user_g_U = nlp.g_L, nlp.g_U
    if (opts.fixed_variable_treatment == "make_constraint"
            and fixed_mask_mc.any()):
        mc_idx = np.nonzero(fixed_mask_mc)[0].astype(np.int32)
        mc_vals = x_L[mc_idx].copy()
        base_g = nlp.g

        if nlp.params is None:
            if base_g is None:
                user_g = lambda x: x[jnp.asarray(mc_idx)]
            else:
                user_g = lambda x: jnp.concatenate(
                    [base_g(x), x[jnp.asarray(mc_idx)]])
        else:
            if base_g is None:
                user_g = lambda x, p: x[jnp.asarray(mc_idx)]
            else:
                user_g = lambda x, p: jnp.concatenate(
                    [base_g(x, p), x[jnp.asarray(mc_idx)]])

        m_base = 0
        if base_g is not None:
            xs_probe = jax.ShapeDtypeStruct((n_full,), dtype)
            if nlp.params is None:
                m_base = int(jax.eval_shape(base_g, xs_probe).shape[0])
            else:
                m_base = int(jax.eval_shape(base_g, xs_probe,
                                            nlp.params).shape[0])
        user_g_L = np.concatenate([_fill(nlp.g_L, -np.inf, m_base), mc_vals])
        user_g_U = np.concatenate([_fill(nlp.g_U, np.inf, m_base), mc_vals])
        # free the variable bounds so the variable is no longer "fixed"
        x_L = np.where(fixed_mask_mc, -np.inf, x_L)
        x_U = np.where(fixed_mask_mc, np.inf, x_U)
        nlp = dataclasses.replace(nlp, g=user_g, g_L=user_g_L, g_U=user_g_U,
                                  x_L=x_L, x_U=x_U)

    if nlp.g is not None:
        xs = jax.ShapeDtypeStruct((n_full,), dtype)
        if nlp.params is None:
            m = int(jax.eval_shape(nlp.g, xs).shape[0])
        else:
            m = int(jax.eval_shape(nlp.g, xs, nlp.params).shape[0])
        g_L = _fill(nlp.g_L, -np.inf, m)
        g_U = _fill(nlp.g_U, np.inf, m)
        g_L, g_U = _apply_inf(g_L, g_U)
    else:
        m = 0
        g_L = np.zeros((0,))
        g_U = np.zeros((0,))

    eq_mask = (g_L == g_U)
    eq_idx = np.nonzero(eq_mask)[0].astype(np.int32)
    ineq_idx = np.nonzero(~eq_mask)[0].astype(np.int32)

    # --- constant-function shortcuts (grad_f_constant / jac_c_constant /
    #     jac_d_constant / hessian_constant, IpOrigIpoptNLP.cpp &
    #     IpTNLPAdapter registration): the user promises (partial)
    #     linearity, so the exact Taylor surrogate at x0 replaces the
    #     callable — AD of the surrogate is then trivially cheap and
    #     evaluated-once semantics hold by construction. -------------------
    if (opts.grad_f_constant or opts.hessian_constant
            or opts.jac_c_constant or opts.jac_d_constant):
        if nlp.params is not None:
            raise ValueError(
                "grad_f_constant / jac_*_constant / hessian_constant "
                "require a parameter-free NLP (the surrogate is built at "
                "x0 once)")
        x0j = jnp.asarray(x0, dtype)
        repl = {}
        if nlp.f is not None and (opts.grad_f_constant or opts.hessian_constant):
            _f = nlp.f
            f0 = jnp.asarray(_f(x0j), dtype)
            gf0 = jax.grad(_f)(x0j)
            if opts.hessian_constant:
                H0 = jax.hessian(_f)(x0j)
                repl["f"] = (lambda x, f0=f0, gf0=gf0, H0=H0:
                             f0 + gf0 @ (x - x0j)
                             + 0.5 * (x - x0j) @ (H0 @ (x - x0j)))
            else:
                repl["f"] = (lambda x, f0=f0, gf0=gf0:
                             f0 + gf0 @ (x - x0j))
        if nlp.g is not None and (opts.hessian_constant
                                  or opts.jac_c_constant
                                  or opts.jac_d_constant):
            if m * n_full > 100_000_000:
                raise ValueError(
                    "jac_*_constant / hessian_constant materialize the "
                    f"dense m x n Jacobian ({m} x {n_full}) — too large")
            _g = nlp.g
            g0 = jnp.asarray(_g(x0j), dtype)
            J0 = jax.jacfwd(_g)(x0j)
            if opts.hessian_constant or (opts.jac_c_constant
                                         and opts.jac_d_constant):
                repl["g"] = (lambda x, g0=g0, J0=J0:
                             g0 + J0 @ (x - x0j))
            else:
                cmask = jnp.asarray(eq_mask if opts.jac_c_constant
                                    else ~eq_mask)
                repl["g"] = (lambda x, g0=g0, J0=J0, cmask=cmask, _g=_g:
                             jnp.where(cmask, g0 + J0 @ (x - x0j), _g(x)))
        if repl:
            nlp = dataclasses.replace(nlp, **repl)
    me, mi = len(eq_idx), len(ineq_idx)

    # Fixed variable treatment (IpTNLPAdapter.cpp:463-631).
    fixed_mask = (x_L == x_U)
    treatment = opts.fixed_variable_treatment
    if treatment in ("make_parameter", "make_parameter_nodual") and fixed_mask.any():
        free_idx = np.nonzero(~fixed_mask)[0].astype(np.int32)
        fixed_idx = np.nonzero(fixed_mask)[0].astype(np.int32)
    else:
        # relax_bounds: handled below by the generic relaxation (which keeps
        # x_L==x_U variables with an epsilon interval); make_constraint is a
        # future extension (adds equality rows).
        free_idx = np.arange(n_full, dtype=np.int32)
        fixed_idx = np.zeros((0,), dtype=np.int32)
        if treatment == "relax_bounds" and fixed_mask.any():
            rf = max(opts.bound_relax_factor, 1e-10)
            adj = rf * np.maximum(1.0, np.abs(x_L))
            x_L = np.where(fixed_mask, x_L - adj, x_L)
            x_U = np.where(fixed_mask, x_U + adj, x_U)
    n = len(free_idx)

    struct = CanonicalStructure(
        n_full=n_full, n=n, m=m, me=me, mi=mi, eq_idx=eq_idx,
        ineq_idx=ineq_idx, free_idx=free_idx, fixed_idx=fixed_idx,
        fixed_treatment=treatment,
        fd_grad_eps=(opts.findiff_perturbation
                     if opts.gradient_approximation
                     == "finite-difference-values" else 0.0),
        fd_jac_eps=(opts.findiff_perturbation
                    if opts.jacobian_approximation
                    == "finite-difference-values" else 0.0))

    x_fixed = np.where(fixed_mask, x_L, 0.0) if len(fixed_idx) else np.zeros(n_full)

    # Reduce bound arrays to free space.
    x_L_f = x_L[free_idx]
    x_U_f = x_U[free_idx]
    d_L = g_L[ineq_idx] if mi else np.zeros((0,))
    d_U = g_U[ineq_idx] if mi else np.zeros((0,))
    c_rhs = g_U[eq_idx] if me else np.zeros((0,))

    # Bound relaxation (IpOrigIpoptNLP.cpp:54-357): move each finite bound out
    # by bound_relax_factor * max(1, |bound|).
    rf = opts.bound_relax_factor
    x_L_orig, x_U_orig = x_L_f.copy(), x_U_f.copy()
    if rf > 0:
        x_L_r = np.where(np.isfinite(x_L_f), x_L_f - rf * np.maximum(1, np.abs(x_L_f)), x_L_f)
        x_U_r = np.where(np.isfinite(x_U_f), x_U_f + rf * np.maximum(1, np.abs(x_U_f)), x_U_f)
        d_L_r = np.where(np.isfinite(d_L), d_L - rf * np.maximum(1, np.abs(d_L)), d_L)
        d_U_r = np.where(np.isfinite(d_U), d_U + rf * np.maximum(1, np.abs(d_U)), d_U)
    else:
        x_L_r, x_U_r, d_L_r, d_U_r = x_L_f, x_U_f, d_L, d_U

    has_xL = np.isfinite(x_L_r)
    has_xU = np.isfinite(x_U_r)
    has_dL = np.isfinite(d_L_r)
    has_dU = np.isfinite(d_U_r)

    def arr(v):
        return jnp.asarray(v, dtype)

    # Normalize callables to the internal (x_full, params) signature.
    if nlp.params is None:
        user_f, user_g = nlp.f, nlp.g
        f2 = lambda x, params: user_f(x)
        g2 = (lambda x, params: user_g(x)) if user_g is not None else None
        params = ()
    else:
        f2, g2 = nlp.f, nlp.g
        params = jax.tree.map(lambda v: jnp.asarray(v, dtype), nlp.params)

    cnlp = CanonicalNLP(
        struct=struct, f=f2, g=g2, params=params,
        x_L=arr(np.where(has_xL, x_L_r, 0.0)),
        x_U=arr(np.where(has_xU, x_U_r, 0.0)),
        d_L=arr(np.where(has_dL, d_L_r, 0.0)),
        d_U=arr(np.where(has_dU, d_U_r, 0.0)),
        has_xL=jnp.asarray(has_xL), has_xU=jnp.asarray(has_xU),
        has_dL=jnp.asarray(has_dL), has_dU=jnp.asarray(has_dU),
        c_rhs=arr(c_rhs), x_fixed=arr(x_fixed), x0=arr(x0[free_idx]),
        x_L_orig=arr(np.where(np.isfinite(x_L_orig), x_L_orig, 0.0)),
        x_U_orig=arr(np.where(np.isfinite(x_U_orig), x_U_orig, 0.0)),
        obj_scale=arr(1.0), c_scale=arr(np.ones(me)), d_scale=arr(np.ones(mi)),
    )
    from .scaling import compute_scaling
    return compute_scaling(cnlp, opts)
