"""Model library — the examples/ScalableProblems + hs071 equivalents.

Reference parity: ``examples/ScalableProblems/solve_problem.cpp:96-158``
registers LuksanVlcek1-7 and the Mittelmann PDE-control problems at arbitrary
size; ``examples/hs071_cpp`` is the canonical fixture.  These builders are the
TPU-native formulations used by tests and benchmarks.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .problem import NLP
from .chained import ChainedNLP

HS071_X_STAR = np.array([1.00000000, 4.74299963, 3.82114998, 1.37940829])
HS071_F_STAR = 17.0140171451792


def hs071(rhs_shift: float = 0.0) -> NLP:
    """Hock-Schittkowski 71 (examples/hs071_cpp/hs071_nlp.cpp)."""
    d = float(rhs_shift)
    return NLP(
        name="hs071",
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0 + d]), g_U=jnp.array([2e19, 40.0 + d]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]))


def luksan_vlcek1(n: int, v: int = 2) -> ChainedNLP:
    """LuksanVlcek1 (examples/ScalableProblems/LuksanVlcek1.cpp): chained
    Rosenbrock objective, trigonometric-exponential equality constraints
    (constraint j couples x_j, x_{j+1}, x_{j+2}).

    ``v`` is the variable-group width of the chained formulation: any v >= 2
    gives the same NLP; larger v yields bigger (more MXU-friendly) KKT blocks
    and a shorter elimination chain.  Requires n % v == 0.

    Stage k owns the objective terms with leading index in group k and the
    constraints with leading index in group k; both reach at most 2 variables
    into group k+1, so the chain structure holds for any v >= 2.
    """
    if n % v or n < 3 * v:
        raise ValueError(f"need n divisible by v and n >= 3v, got {n}, {v}")
    K = n // v - 1  # stages; groups 0..K

    def rosen(w):
        # sum of terms with leading index at w[0..len-2]
        return jnp.sum(100.0 * (w[:-1] ** 2 - w[1:]) ** 2 + (w[:-1] - 1.0) ** 2)

    def f_stage(xk, xk1, theta):
        w = jnp.concatenate([xk, xk1[:1]])
        return rosen(w)

    def f_last(xK):
        return rosen(xK)

    def g_stage(xk, xk1, theta):
        # rows with leading index j = k*v + i, i = 0..2v-3: uses the whole
        # 2v-wide window.  Stage k *owns* rows i < v; the last stage also owns
        # the tail rows up to leading index n-3 (the remaining window rows are
        # freed via +-inf bounds below).
        w = jnp.concatenate([xk, xk1])
        a = w[:-2]
        b = w[1:-1]
        c = w[2:]
        return (3.0 * b ** 3 + 2.0 * c - 5.0
                + jnp.sin(b - c) * jnp.sin(b + c)
                + 4.0 * b - a * jnp.exp(a - b) - 3.0)

    mk = 2 * v - 2
    g_L = np.zeros((K, mk))
    g_U = np.zeros((K, mk))
    for k in range(K):
        for i in range(mk):
            j = k * v + i
            owned = (i < v) or (k == K - 1 and j <= n - 3)
            if not owned or j > n - 3:
                g_L[k, i] = -np.inf
                g_U[k, i] = np.inf

    x0 = np.full((K + 1, v), -1.0)
    flat = x0.reshape(-1)
    flat[1::2] = 1.0

    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage, f_last=f_last,
        x0=flat.reshape(K + 1, v), g_L=g_L, g_U=g_U,
        name=f"luksan_vlcek1_n{n}_v{v}")


def luksan_vlcek1_flat(n: int) -> NLP:
    """LuksanVlcek1 as a flat NLP with *declared* sparsity for the banded-BCR
    backend (examples/ScalableProblems/LuksanVlcek1.cpp; same math as the
    chained builder above, expressed as one vector function).

    J row i covers x_i..x_{i+2} (m = n-2 equality rows); the Lagrangian
    Hessian has bandwidth 2.  At n = 1e5..1e6 this exercises the
    general-sparsity path end to end: declared pattern -> RCM -> banded BCR.
    """
    assert n >= 4
    m = n - 2

    def f(x):
        return jnp.sum(100.0 * (x[:-1] ** 2 - x[1:]) ** 2
                       + (x[:-1] - 1.0) ** 2)

    def g(x):
        a = x[0:m]
        b = x[1:m + 1]
        c = x[2:m + 2]
        return (3.0 * b ** 3 + 2.0 * c - 5.0
                + jnp.sin(b - c) * jnp.sin(b + c)
                + 4.0 * b - a * jnp.exp(a - b) - 3.0)

    x0 = np.full(n, -1.0)
    x0[1::2] = 1.0
    return NLP(name=f"luksan_vlcek1_flat{n}",
               f=f, g=g, g_L=np.zeros(m), g_U=np.zeros(m), x0=x0,
               jac_g_sparsity=band_sparsity(m, n, 0, 2),
               lag_hess_sparsity=band_sparsity(n, n, -2, 2))


def mittelmann_bndry_control_1d(N: int, v: int = 0) -> ChainedNLP:
    """A 1-D analogue of MittelmannBndryCntrlDiri (examples/ScalableProblems):
    discretized Poisson boundary control

        min  0.5 * sum_i (y_i - y_t)^2 * h  +  alpha/2 * (u_0^2 + u_1^2)
        s.t. (-y_{i-1} + 2 y_i - y_{i+1})/h^2 = d(y_i)      i = 1..N-2
             y_0 = u_0,  y_{N-1} = u_1,  lb <= u <= ub

    formulated as a chained problem over the grid: group = [y_i] (v grid
    points per group).  The controls are folded into the first/last grid
    values with bounds.  d(y) = y^3 - y (a mild nonlinearity).
    """
    if v == 0:
        v = max(2, min(32, N // 8))
    if N % v or N < 3 * v or v < 2:
        raise ValueError(f"need N divisible by v >= 2, got {N}, {v}")
    h = 1.0 / (N - 1)
    y_t = 0.5
    alpha = 0.01
    K = N // v - 1
    # Stage k's window [y_k group, y_{k+1} group] supports PDE rows centered
    # at k*v+1 .. k*v+2v-2.  Stage k normally owns centers k*v+1 .. k*v+v;
    # the last stage additionally owns the tail centers up to N-2.  Rows are
    # uniform (mk = 2v-2) with the unowned ones freed via +-inf bounds.
    mk = 2 * v - 2

    def f_stage(yk, yk1, theta):
        return 0.5 * h * jnp.sum((yk - y_t) ** 2) + 0.5 * theta[0] * yk[0] ** 2

    def f_last(yK):
        return (0.5 * h * jnp.sum((yK - y_t) ** 2)
                + 0.5 * alpha * yK[-1] ** 2)

    def g_stage(yk, yk1, theta):
        w = jnp.concatenate([yk, yk1])
        ym = w[:-2]
        yc = w[1:-1]
        yp = w[2:]
        return (-ym + 2.0 * yc - yp) / (h * h) - (yc ** 3 - yc)

    g_L = np.zeros((K, mk))
    g_U = np.zeros((K, mk))
    for k in range(K):
        for i in range(mk):
            center = k * v + 1 + i
            owned = (center <= k * v + v) or (k == K - 1 and center <= N - 2)
            if not owned or center >= N - 1:
                g_L[k, i] = -np.inf
                g_U[k, i] = np.inf

    theta = np.zeros((K, 1))
    theta[0, 0] = alpha  # control penalty on y_0 lives in stage 0

    y0 = np.full((K + 1, v), 0.3)
    x_L = np.full((K + 1, v), -np.inf)
    x_U = np.full((K + 1, v), np.inf)
    # boundary controls: first and last grid point bounded
    x_L[0, 0], x_U[0, 0] = -2.0, 2.0
    x_L[-1, -1], x_U[-1, -1] = -2.0, 2.0

    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage, f_last=f_last, theta=theta,
        x0=y0, g_L=g_L, g_U=g_U, x_L=x_L, x_U=x_U,
        name=f"mittelmann1d_N{N}_v{v}")


def luksan_vlcek2(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek2 (examples/ScalableProblems/LuksanVlcek2.cpp): chained
    Wood-like objective over variable pairs, 11-wide window constraints
    g_i = (2 + 5 x_{i+5}^2) x_{i+5} + 1 + sum_{k=max(0,i-5)}^{i+1} x_k(x_k+1),
    i = 0..m-1 with m = n - 9 (the reference uses n = N_ + 2 variables and
    m = N_ - 7 rows).  Equality variant (g = 0) or inequality (-1 <= g <= 0),
    matching the registry's LukVlE2 / LukVlI2 instances.  n % 2 == 0, n >= 12.
    """
    assert n % 2 == 0 and n >= 12

    def f(x):
        xe = x[0:n - 2:2]   # x[2i]
        xo = x[1:n - 1:2]   # x[2i+1]
        xe2 = x[2:n:2]      # x[2i+2]
        xo2 = x[3:n:2]      # x[2i+3]
        a1 = xe ** 2 - xo
        a2 = xe - 1.0
        a3 = xe2 ** 2 - xo2
        a4 = xe2 - 1.0
        a5 = xo + xo2 - 2.0
        a6 = xo - xo2
        return jnp.sum(100.0 * a1 ** 2 + a2 ** 2 + 90.0 * a3 ** 2 + a4 ** 2
                       + 10.0 * a5 ** 2 + 0.1 * a6 ** 2)

    m = n - 9

    def g(x):
        q = x * (x + 1.0)
        # windowed sum over k in [max(0, i-5), i+1]
        cq = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(q)])
        i = jnp.arange(m)
        lo = jnp.maximum(0, i - 5)
        hi = i + 1
        wsum = cq[hi + 1] - cq[lo]
        x5 = x[5:5 + m]
        return (2.0 + 5.0 * x5 ** 2) * x5 + 1.0 + wsum

    x0 = np.empty(n)
    x0[0::2] = -2.0
    x0[1::2] = 1.0
    if equality:
        g_L = np.zeros(m)
        g_U = np.zeros(m)
    else:
        g_L = np.full(m, -1.0)
        g_U = np.zeros(m)
    return NLP(name=f"luksan_vlcek2_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=x0)


def band_sparsity(m: int, n: int, lo_off: int, hi_off: int):
    """COO pattern of a banded (m, n) matrix: row i covers columns
    i+lo_off .. i+hi_off (clipped).  Used to *declare* Jacobian/Hessian
    structure for the banded-BCR backend at sizes where dense auto-detection
    is infeasible (TNLP's eval_jac_g structure equivalent)."""
    rows = []
    cols = []
    for off in range(lo_off, hi_off + 1):
        i = np.arange(max(0, -off), min(m, n - off), dtype=np.int32)
        rows.append(i)
        cols.append(i + np.int32(off))
    return np.concatenate(rows), np.concatenate(cols)


def luksan_vlcek4(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek4 (examples/ScalableProblems/LuksanVlcek4.cpp): chained
    exponential/tangent objective over 4-wide windows, 3-wide cubic
    constraints g_i = 8 x_{i+1}(x_{i+1}^2 - x_i) - 2(1 - x_{i+1})
    + 4(x_{i+1} - x_{i+2}^2), i = 0..m-1 with m = n - 4 (reference:
    n = N_+2, m = N_-2).  Registry instances LukVlE4 (g = 0) and
    LukVlI4 (-1 <= g <= 0).  Requires n % 4 == 0, n >= 8."""
    assert n % 4 == 0 and n >= 8

    def f(x):
        x0 = x[0:n - 2:2]   # x[2i]
        x1 = x[1:n - 1:2]   # x[2i+1]
        x2 = x[2:n:2]       # x[2i+2]
        x3 = x[3:n:2]       # x[2i+3]
        e0 = jnp.exp(x0)
        return jnp.sum((e0 - x1) ** 4 + 100.0 * (x1 - x2) ** 6
                       + jnp.tan(x2 - x3) ** 4 + x0 ** 8 + (x3 - 1.0) ** 2)

    m = n - 4

    def g(x):
        xi = x[0:m]
        xi1 = x[1:m + 1]
        xi2 = x[2:m + 2]
        return (8.0 * xi1 * (xi1 ** 2 - xi) - 2.0 * (1.0 - xi1)
                + 4.0 * (xi1 - xi2 ** 2))

    x0v = np.empty(n)
    x0v[0::4] = 1.0
    x0v[1::4] = 2.0
    x0v[2::4] = 2.0
    x0v[3::4] = 2.0
    g_L = np.zeros(m) if equality else np.full(m, -1.0)
    g_U = np.zeros(m)
    return NLP(name=f"luksan_vlcek4_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=x0v,
               # declared structure (banded-BCR backend): J row i covers
               # x_i..x_{i+2}; the Lagrangian Hessian is tridiagonal
               jac_g_sparsity=band_sparsity(m, n, 0, 2),
               lag_hess_sparsity=band_sparsity(n, n, -1, 1))


def luksan_vlcek5(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek5 (examples/ScalableProblems/LuksanVlcek5.cpp): chained
    |.|^{7/3} tridiagonal objective, 5-wide cubic constraints with
    m = n - 6 rows (reference: n = N_+2, m = N_-4).  x0 = -1."""
    assert n >= 8

    def f(x):
        xm, xc, xp = x[0:n - 2], x[1:n - 1], x[2:n]
        b = (3.0 - 2.0 * xc) * xc - xm - xp + 1.0
        return jnp.sum(jnp.abs(b) ** (7.0 / 3.0))

    m = n - 6

    def g(x):
        x1 = x[1:m + 1]
        x2 = x[2:m + 2]
        x3 = x[3:m + 3]
        x4 = x[4:m + 4]
        x5 = x[5:m + 5]
        return (8.0 * x3 * (x3 ** 2 - x2) - 2.0 * (1.0 - x3)
                + 4.0 * (x3 - x4 ** 2) + x2 ** 2 - x1 + x4 - x5 ** 2)

    g_L = np.zeros(m) if equality else np.full(m, -1.0)
    g_U = np.zeros(m)
    return NLP(name=f"luksan_vlcek5_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=np.full(n, -1.0),
               # J row i covers x_{i+1}..x_{i+5}; Hessian has bandwidth 2
               jac_g_sparsity=band_sparsity(m, n, 1, 5),
               lag_hess_sparsity=band_sparsity(n, n, -2, 2))


def luksan_vlcek6(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek6 (examples/ScalableProblems/LuksanVlcek6.cpp): chained
    |.|^{7/3} objective with a 7-wide window sum, exponential constraints
    over variable pairs; m = (n-1)/2 rows (reference: n = N_+1, m = N_/2).
    Requires odd n >= 3 (so N = n-1 is even).  x0 = 3."""
    assert n % 2 == 1 and n >= 3
    N = n - 1
    m = N // 2

    def f(x):
        q = x[:N] * (1.0 + x[:N])
        cq = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(q)])
        i = jnp.arange(N)
        lo = jnp.maximum(0, i - 5)
        hi = jnp.minimum(N - 1, i + 1)
        wsum = cq[hi + 1] - cq[lo]
        b = (2.0 + 5.0 * x[:N] ** 2) * x[:N] + 1.0 + wsum
        return jnp.sum(jnp.abs(b) ** (7.0 / 3.0))

    def g(x):
        xe = x[0:2 * m:2]        # x[2i]
        xo = x[1:2 * m + 1:2]    # x[2i+1]
        xe2 = x[2:2 * m + 2:2]   # x[2i+2]
        e = jnp.exp(xe - xo - xe2)
        return 4.0 * xo - (xe - xe2) * e - 3.0

    g_L = np.zeros(m) if equality else np.full(m, -1.0)
    g_U = np.zeros(m)
    return NLP(name=f"luksan_vlcek6_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=np.full(n, 3.0))


def luksan_vlcek7(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek7 (examples/ScalableProblems/LuksanVlcek7.cpp): chained
    trigonometric objective with linearly growing weights and exactly 4
    boundary constraints (reference: n = N_+2, m = 4).  x0 = 1."""
    assert n >= 5
    N = n - 2

    def f(x):
        i = jnp.arange(1, N + 1).astype(x.dtype)
        xc = x[1:N + 1]
        return jnp.sum(i * ((1.0 - jnp.cos(xc))
                            + jnp.sin(x[0:N]) - jnp.sin(x[2:N + 2])))

    def g(x):
        return jnp.array([
            4.0 * (x[1] - x[2] ** 2) + x[2] - x[3] ** 2,
            8.0 * x[2] * (x[2] ** 2 - x[1]) - 2.0 * (1.0 - x[2])
            + 4.0 * (x[2] - x[3] ** 2) + x[3] - x[4] ** 2,
            8.0 * x[N - 1] * (x[N - 1] ** 2 - x[N - 2])
            - 2.0 * (1.0 - x[N - 1]) + 4.0 * (x[N - 1] - x[N] ** 2)
            + x[N - 2] ** 2 - x[N - 3],
            8.0 * x[N] * (x[N] ** 2 - x[N - 1]) - 2.0 * (1.0 - x[N])
            + x[N - 1] ** 2 - x[N - 2]])

    g_L = np.zeros(4) if equality else np.full(4, -1.0)
    g_U = np.zeros(4)
    return NLP(name=f"luksan_vlcek7_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=np.full(n, 1.0))


_MITTELMANN_EXAMPLES = {
    # example id -> (alpha, ub_y, lb_u, ub_u); all share d_const = -20 and
    # y_d(x1,x2) = 3 + 5 x1(x1-1) x2(x2-1)
    # (MittelmannBndryCntrlDiri.hpp:281-298 ex1, :329-346 ex2, :380-397 ex3,
    #  :432-448 ex4)
    1: (0.01, 3.5, 0.0, 10.0),
    2: (0.0, 3.5, 0.0, 10.0),
    3: (0.01, 3.2, 1.6, 2.3),
    4: (0.0, 3.2, 1.6, 2.3),
}


def mittelmann_bndry_control(N: int, example: int = 1) -> ChainedNLP:
    """MittelmannBndryCntrlDiri 1-4 (examples/ScalableProblems/
    MittelmannBndryCntrlDiri.{hpp,cpp}): 2-D elliptic (Poisson) Dirichlet
    boundary control on the unit square,

        min  hh/2 sum_int (y_ij - y_d(ih,jh))^2 + alpha h/2 sum_bnd u^2
        s.t. 4 y_ij - y_{i-1,j} - y_{i+1,j} - y_{i,j-1} - y_{i,j+1}
                 = -hh * d_const            (interior i,j = 1..N)
             lb_y <= y_int <= ub_y,  lb_u <= y_bnd <= ub_u

    on an (N+2)x(N+2) grid with h = 1/(N+1).  The controls are the boundary
    values of y (no separate u variables), exactly as in the reference.

    TPU-native formulation: chained over *pairs of grid rows* — group k is
    grid rows (2k, 2k+1) flattened, so the 5-point stencil centered in rows
    2k+1 and 2k+2 touches exactly groups k and k+1 and the KKT is
    block-tridiagonal (BCR backend).  Requires even N >= 2.

    Deviation from the reference: the 4 corner values (which appear in no
    constraint) are treated as bounded controls contributing alpha h/2 u^2
    to the objective instead of being fixed to 0; with lb_u <= 0 the optimum
    is unchanged.  For examples 3/4 (lb_u = 1.6) the corners sit at their
    lower bound and add the constant 2 alpha h lb_u^2.
    """
    if N % 2 or N < 2:
        raise ValueError(f"need even N >= 2, got {N}")
    alpha, ub_y, lb_u, ub_u = _MITTELMANN_EXAMPLES[example]
    lb_y, d_const = -1e20, -20.0
    Ng = N + 2
    h = 1.0 / (N + 1)
    hh = h * h
    K = Ng // 2 - 1          # stages; K+1 groups of 2 grid rows
    v = 2 * Ng
    mk = 2 * N

    ij = np.arange(Ng) * h
    y_d = 3.0 + 5.0 * (ij[:, None] * (ij[:, None] - 1.0)
                       * ij[None, :] * (ij[None, :] - 1.0))
    interior = np.zeros((Ng, Ng), bool)
    interior[1:-1, 1:-1] = True
    w_int = np.where(interior, hh / 2.0, 0.0)
    w_ctl = np.where(~interior, alpha * h / 2.0, 0.0)

    def obj_rows(rows, yd, wi, wc):
        return (jnp.sum(wi * (rows - yd) ** 2) + jnp.sum(wc * rows ** 2))

    def f_stage(xk, xk1, theta):
        return obj_rows(xk.reshape(2, Ng), theta["yd"], theta["wi"],
                        theta["wc"])

    yd_last = jnp.asarray(y_d[-2:])
    wi_last = jnp.asarray(w_int[-2:])
    wc_last = jnp.asarray(w_ctl[-2:])

    def f_last(xK):
        return obj_rows(xK.reshape(2, Ng), yd_last, wi_last, wc_last)

    def g_stage(xk, xk1, theta):
        w = jnp.concatenate([xk.reshape(2, Ng), xk1.reshape(2, Ng)])

        def pde(up, c, dn):
            return 4.0 * c[1:-1] - up[1:-1] - dn[1:-1] - c[:-2] - c[2:]

        return jnp.concatenate([pde(w[0], w[1], w[2]),
                                pde(w[1], w[2], w[3])])

    rhs = -hh * d_const
    theta = {"yd": np.stack([y_d[2 * k:2 * k + 2] for k in range(K)]),
             "wi": np.stack([w_int[2 * k:2 * k + 2] for k in range(K)]),
             "wc": np.stack([w_ctl[2 * k:2 * k + 2] for k in range(K)])}

    x_L = np.where(interior, lb_y, lb_u)
    x_U = np.where(interior, ub_y, ub_u)
    x0 = np.where(interior, y_d, 0.5 * (lb_u + ub_u))

    return ChainedNLP(
        f_stage=f_stage, g_stage=g_stage, f_last=f_last, theta=theta,
        x0=x0.reshape(K + 1, v), g_L=np.full((K, mk), rhs),
        g_U=np.full((K, mk), rhs),
        x_L=x_L.reshape(K + 1, v), x_U=x_U.reshape(K + 1, v),
        name=f"mittelmann_bndry{example}_N{N}")


def mittelmann_dist_control(N: int) -> NLP:
    """MittelmannDistCntrlNeumA1 (examples/ScalableProblems/
    MittelmannDistCntrlNeumA.hpp:413-439, .cpp:213-331): 2-D elliptic
    *distributed* control with Neumann boundary conditions,

        min  hh * sum_int 0.5*((y_ij - yd)^2 + alpha u_ij^2)
        s.t. 4 y_ij - y_nbrs + hh*(-exp(y_ij) - u_ij) = 0   (interior PDE)
             (1 + h b) y_bnd - y_adj = 0                    (Neumann rows)
             y <= 0.371,  -8 <= u <= 9

    with yd = sin(2 pi x1) sin(2 pi x2), alpha = 0.001, b = 1.  This is the
    general-grid-sparsity case the banded-BCR backend exists for: the flat
    NLP carries its declared Jacobian/Hessian patterns (TNLP structure
    parity) and RCM recovers the O(N) bandwidth.

    Variables: x = [Y ((N+2)^2 grid) | U (N^2 interior controls)].
    """
    Ng = N + 2
    h = 1.0 / (N + 1)
    hh = h * h
    alpha = 0.001
    b = 1.0
    ny = Ng * Ng
    n = ny + N * N

    def yi(i, j):  # numpy index helpers (static)
        return i * Ng + j

    ii, jj = np.meshgrid(np.arange(1, N + 1), np.arange(1, N + 1),
                         indexing="ij")
    x1 = ii.astype(np.float64) * h
    x2 = jj.astype(np.float64) * h
    yd = np.sin(2.0 * np.pi * x1) * np.sin(2.0 * np.pi * x2)
    yd_j = jnp.asarray(yd.reshape(-1))

    def f(x):
        Y = x[:ny].reshape(Ng, Ng)
        u = x[ny:]
        y_int = Y[1:-1, 1:-1].reshape(-1)
        return hh * jnp.sum(0.5 * ((y_int - yd_j) ** 2 + alpha * u ** 2))

    def g(x):
        Y = x[:ny].reshape(Ng, Ng)
        u = x[ny:].reshape(N, N)
        yc = Y[1:-1, 1:-1]
        pde = (4.0 * yc - Y[:-2, 1:-1] - Y[2:, 1:-1]
               - Y[1:-1, :-2] - Y[1:-1, 2:]
               + hh * (-jnp.exp(yc) - u))
        nb = []
        nb.append((1.0 + h * b) * Y[1:-1, 0] - Y[1:-1, 1])      # j = 0 side
        nb.append((1.0 + h * b) * Y[1:-1, -1] - Y[1:-1, -2])    # j = N+1
        nb.append((1.0 + h * b) * Y[0, 1:-1] - Y[1, 1:-1])      # i = 0
        nb.append((1.0 + h * b) * Y[-1, 1:-1] - Y[-2, 1:-1])    # i = N+1
        return jnp.concatenate([pde.reshape(-1)] + nb)

    m = N * N + 4 * N

    # declared sparsity (TNLP get_nlp_info / eval_jac_g structure parity)
    jr, jc = [], []
    r = 0
    for i in range(1, N + 1):
        for j in range(1, N + 1):
            for (a, bb) in ((i, j), (i - 1, j), (i + 1, j), (i, j - 1),
                            (i, j + 1)):
                jr.append(r)
                jc.append(yi(a, bb))
            jr.append(r)
            jc.append(ny + (i - 1) * N + (j - 1))
            r += 1
    for i in range(1, N + 1):                    # j = 0 side
        jr += [r, r]
        jc += [yi(i, 0), yi(i, 1)]
        r += 1
    for i in range(1, N + 1):                    # j = N+1
        jr += [r, r]
        jc += [yi(i, Ng - 1), yi(i, Ng - 2)]
        r += 1
    for j in range(1, N + 1):                    # i = 0
        jr += [r, r]
        jc += [yi(0, j), yi(1, j)]
        r += 1
    for j in range(1, N + 1):                    # i = N+1
        jr += [r, r]
        jc += [yi(Ng - 1, j), yi(Ng - 2, j)]
        r += 1
    assert r == m
    diag = np.arange(n, dtype=np.int32)

    x_L = np.full(n, -1e20)
    x_U = np.full(n, np.inf)
    x_U[:ny] = 0.371
    x_L[ny:] = -8.0
    x_U[ny:] = 9.0
    x0 = np.zeros(n)
    x0[ny:] = 0.5 * (-8.0 + 9.0)

    return NLP(name=f"mittelmann_dist_control_N{N}",
               f=f, g=g, g_L=np.zeros(m), g_U=np.zeros(m),
               x_L=x_L, x_U=x_U, x0=x0,
               jac_g_sparsity=(np.asarray(jr, np.int32),
                               np.asarray(jc, np.int32)),
               lag_hess_sparsity=(diag, diag))


def mittelmann_dist_control_3d(N: int) -> NLP:
    """3-D elliptic distributed control (the MittelmannDistCntrl3D family,
    examples/ScalableProblems — same semilinear PDE-constrained form as the
    2-D case lifted to a 7-point stencil, Dirichlet boundary y = 0):

        min  hh * sum 0.5*((y_ijk - yd)^2 + alpha u_ijk^2)
        s.t. 6 y_ijk - y_nbrs + hh*(-exp(y_ijk) - u_ijk) = 0
             y <= 0.371,  -8 <= u <= 9

    with yd = sin(2 pi x1) sin(2 pi x2) sin(2 pi x3), alpha = 0.001.

    The aug-system RCM bandwidth of the 3-D stencil is O(N^2) — the case the
    nested-dissection multifrontal backend exists for (banded BCR storage
    would be O(N^3 * N^4)).  Variables: x = [Y (N^3 interior) | U (N^3)].
    """
    h = 1.0 / (N + 1)
    hh = h * h
    alpha = 0.001
    ny = N * N * N
    n = 2 * ny
    m = ny

    ii, jj, kk = np.meshgrid(np.arange(1, N + 1), np.arange(1, N + 1),
                             np.arange(1, N + 1), indexing="ij")
    yd = (np.sin(2 * np.pi * ii * h) * np.sin(2 * np.pi * jj * h)
          * np.sin(2 * np.pi * kk * h))
    yd_j = jnp.asarray(yd.reshape(-1))

    def f(x):
        y = x[:ny]
        u = x[ny:]
        return hh * jnp.sum(0.5 * ((y - yd_j) ** 2 + alpha * u ** 2))

    def g(x):
        Y = x[:ny].reshape(N, N, N)
        u = x[ny:].reshape(N, N, N)
        Yp = jnp.pad(Y, 1)                       # Dirichlet y = 0 boundary
        pde = (6.0 * Y
               - Yp[:-2, 1:-1, 1:-1] - Yp[2:, 1:-1, 1:-1]
               - Yp[1:-1, :-2, 1:-1] - Yp[1:-1, 2:, 1:-1]
               - Yp[1:-1, 1:-1, :-2] - Yp[1:-1, 1:-1, 2:]
               + hh * (-jnp.exp(Y) - u))
        return pde.reshape(-1)

    # declared 7-point-stencil Jacobian pattern (vectorized numpy)
    idx = np.arange(ny, dtype=np.int32).reshape(N, N, N)
    rows = [idx.reshape(-1)]                     # center y
    cols = [idx.reshape(-1)]
    for axis, off in ((0, -1), (0, 1), (1, -1), (1, 1), (2, -1), (2, 1)):
        sl_r = [slice(None)] * 3
        sl_c = [slice(None)] * 3
        sl_r[axis] = slice(1, None) if off == -1 else slice(None, -1)
        sl_c[axis] = slice(None, -1) if off == -1 else slice(1, None)
        rows.append(idx[tuple(sl_r)].reshape(-1))
        cols.append(idx[tuple(sl_c)].reshape(-1))
    rows.append(idx.reshape(-1))                 # u column
    cols.append(ny + idx.reshape(-1))
    jr = np.concatenate(rows)
    jc = np.concatenate(cols)
    diag = np.arange(n, dtype=np.int32)

    x_L = np.full(n, -1e20)
    x_U = np.full(n, np.inf)
    x_U[:ny] = 0.371
    x_L[ny:] = -8.0
    x_U[ny:] = 9.0
    x0 = np.zeros(n)
    x0[ny:] = 0.5

    return NLP(name=f"mittelmann_dist_control_3d_N{N}",
               f=f, g=g, g_L=np.zeros(m), g_U=np.zeros(m),
               x_L=x_L, x_U=x_U, x0=x0,
               jac_g_sparsity=(jr, jc),
               lag_hess_sparsity=(diag, diag))


def luksan_vlcek3(n: int, equality: bool = True) -> NLP:
    """LuksanVlcek3 (examples/ScalableProblems/LuksanVlcek3.cpp): chained
    Powell singular objective, two boundary constraints.  n % 4 == 0."""
    assert n % 4 == 0 and n >= 8

    def f(x):
        xe = x[0:n - 2:2]
        xo = x[1:n - 1:2]
        xe2 = x[2:n:2]
        xo2 = x[3:n:2]
        a1 = xe + 10.0 * xo
        a2 = xe2 - xo2
        a3 = xo - 2.0 * xe2
        a4 = xe - xo2
        return jnp.sum(a1 ** 2 + 5.0 * a2 ** 2 + a3 ** 4 + 10.0 * a4 ** 4)

    def g(x):
        return jnp.array([
            3.0 * x[0] ** 3 + 2.0 * x[1] - 5.0
            + jnp.sin(x[0] - x[1]) * jnp.sin(x[0] + x[1]),
            4.0 * x[n - 3] - x[n - 4] * jnp.exp(x[n - 4] - x[n - 3]) - 3.0])

    x0 = np.empty(n)
    x0[0::4] = 3.0
    x0[1::4] = -1.0
    x0[2::4] = 0.0
    x0[3::4] = 1.0
    if equality:
        g_L = np.zeros(2)
        g_U = np.zeros(2)
    else:
        g_L = np.full(2, -1.0)
        g_U = np.zeros(2)
    return NLP(name=f"luksan_vlcek3_{'E' if equality else 'I'}{n}",
               f=f, g=g, g_L=g_L, g_U=g_U, x0=x0)
