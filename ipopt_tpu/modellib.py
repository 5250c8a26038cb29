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
