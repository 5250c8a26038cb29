"""Analytic test problems with known optima.

The canonical fixture is Hock-Schittkowski #71 — the same problem the
reference uses in every language binding test (examples/hs071_cpp/
hs071_nlp.cpp), with its documented optimum f* = 17.0140171451792,
x* = (1.0, 4.74299963, 3.82114998, 1.37940829) (doc/interfaces.dox:32).

The other problems are standard Hock-Schittkowski instances (reimplemented
from their published analytic formulations) plus scalable LuksanVlcek-style
chained problems mirroring examples/ScalableProblems/.
"""
import jax.numpy as jnp
import numpy as np

from ipopt_tpu import NLP

HS071_X_STAR = np.array([1.00000000, 4.74299963, 3.82114998, 1.37940829])
HS071_F_STAR = 17.0140171451792


def hs071():
    return NLP(
        name="hs071",
        f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        g=lambda x: jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2]),
        x_L=1.0, x_U=5.0,
        g_L=jnp.array([25.0, 40.0]),
        g_U=jnp.array([2e19, 40.0]),
        x0=jnp.array([1.0, 5.0, 5.0, 1.0]),
    )


def hs001():
    """Rosenbrock with a bound: min 100(x2-x1^2)^2 + (1-x1)^2, x2 >= -1.5."""
    return NLP(
        name="hs001",
        f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        x_L=jnp.array([-jnp.inf, -1.5]),
        x0=jnp.array([-2.0, 1.0]),
    )  # f* = 0 at (1,1)


def hs006():
    """min (1-x1)^2 s.t. 10(x2-x1^2) = 0.  f* = 0 at (1,1)."""
    return NLP(
        name="hs006",
        f=lambda x: (1.0 - x[0]) ** 2,
        g=lambda x: jnp.array([10.0 * (x[1] - x[0] ** 2)]),
        g_L=jnp.array([0.0]), g_U=jnp.array([0.0]),
        x0=jnp.array([-1.2, 1.0]),
    )


def hs016():
    """f* = 0.25 at (0.5, 0.25)."""
    return NLP(
        name="hs016",
        f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        g=lambda x: jnp.array([x[0] + x[1] ** 2, x[0] ** 2 + x[1]]),
        g_L=jnp.array([0.0, 0.0]), g_U=jnp.array([jnp.inf, jnp.inf]),
        x_L=jnp.array([-0.5, -jnp.inf]), x_U=jnp.array([0.5, 1.0]),
        x0=jnp.array([-2.0, 1.0]),
    )


def hs035():
    """Convex QP: f* = 1/9 at (4/3, 7/9, 4/9)."""
    return NLP(
        name="hs035",
        f=lambda x: (9.0 - 8 * x[0] - 6 * x[1] - 4 * x[2]
                     + 2 * x[0] ** 2 + 2 * x[1] ** 2 + x[2] ** 2
                     + 2 * x[0] * x[1] + 2 * x[0] * x[2]),
        g=lambda x: jnp.array([3.0 - x[0] - x[1] - 2 * x[2]]),
        g_L=jnp.array([0.0]), g_U=jnp.array([jnp.inf]),
        x_L=0.0,
        x0=jnp.array([0.5, 0.5, 0.5]),
    )


def hs038():
    """Colville, bounds only.  f* = 0 at (1,1,1,1)."""
    return NLP(
        name="hs038",
        f=lambda x: (100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
                     + 90 * (x[3] - x[2] ** 2) ** 2 + (1 - x[2]) ** 2
                     + 10.1 * ((x[1] - 1) ** 2 + (x[3] - 1) ** 2)
                     + 19.8 * (x[1] - 1) * (x[3] - 1)),
        x_L=-10.0, x_U=10.0,
        x0=jnp.array([-3.0, -1.0, -3.0, -1.0]),
    )


def hs051():
    """Equality-constrained QP. f* = 0."""
    return NLP(
        name="hs051",
        f=lambda x: ((x[0] - x[1]) ** 2 + (x[1] + x[2] - 2) ** 2
                     + (x[3] - 1) ** 2 + (x[4] - 1) ** 2),
        g=lambda x: jnp.array([
            x[0] + 3 * x[1],
            x[2] + x[3] - 2 * x[4],
            x[1] - x[4]]),
        g_L=jnp.array([4.0, 0.0, 0.0]), g_U=jnp.array([4.0, 0.0, 0.0]),
        x0=jnp.array([2.5, 0.5, 2.0, -1.0, 0.5]),
    )


def hs076():
    """Convex QP with inequalities. f* = -4.681818181."""
    return NLP(
        name="hs076",
        f=lambda x: (x[0] ** 2 + 0.5 * x[1] ** 2 + x[2] ** 2
                     + 0.5 * x[3] ** 2 - x[0] * x[2] + x[2] * x[3]
                     - x[0] - 3 * x[1] + x[2] - x[3]),
        g=lambda x: jnp.array([
            x[0] + 2 * x[1] + x[2] + x[3],
            3 * x[0] + x[1] + 2 * x[2] - x[3],
            x[1] + 4 * x[2]]),
        g_L=jnp.array([-jnp.inf, -jnp.inf, 1.5]),
        g_U=jnp.array([5.0, 4.0, jnp.inf]),
        x_L=0.0,
        x0=jnp.array([0.5, 0.5, 0.5, 0.5]),
    )


def hs100():
    """Polynomial objective, 4 inequality constraints. f* = 680.6300573."""
    return NLP(
        name="hs100",
        f=lambda x: ((x[0] - 10) ** 2 + 5 * (x[1] - 12) ** 2 + x[2] ** 4
                     + 3 * (x[3] - 11) ** 2 + 10 * x[4] ** 6 + 7 * x[5] ** 2
                     + x[6] ** 4 - 4 * x[5] * x[6] - 10 * x[5] - 8 * x[6]),
        g=lambda x: jnp.array([
            127 - 2 * x[0] ** 2 - 3 * x[1] ** 4 - x[2] - 4 * x[3] ** 2 - 5 * x[4],
            282 - 7 * x[0] - 3 * x[1] - 10 * x[2] ** 2 - x[3] + x[4],
            196 - 23 * x[0] - x[1] ** 2 - 6 * x[5] ** 2 + 8 * x[6],
            -4 * x[0] ** 2 - x[1] ** 2 + 3 * x[0] * x[1] - 2 * x[2] ** 2
            - 5 * x[5] + 11 * x[6]]),
        g_L=jnp.zeros(4), g_U=jnp.full(4, jnp.inf),
        x0=jnp.array([1.0, 2.0, 0.0, 4.0, 0.0, 1.0, 1.0]),
    )


def luksan_vlcek1(n: int):
    """LuksanVlcek1 (examples/ScalableProblems/LuksanVlcek1.cpp behavioral
    parity): chained Rosenbrock objective with tridiagonal equality-like
    constraints relaxed to [0, inf) ranges in the reference runs; here we use
    the standard form with g in [0,0] (equalities)."""

    def f(x):
        return jnp.sum(100.0 * (x[:-1] ** 2 - x[1:]) ** 2 + (x[:-1] - 1.0) ** 2)

    def g(x):
        # 3x_{k+1}^3 + 2x_{k+2} - 5 + sin(x_{k+1}-x_{k+2})sin(x_{k+1}+x_{k+2})
        # + 4x_{k+1} - x_k e^{x_k-x_{k+1}} - 3,  k = 0..n-3
        xk = x[:-2]
        xk1 = x[1:-1]
        xk2 = x[2:]
        return (3.0 * xk1 ** 3 + 2.0 * xk2 - 5.0
                + jnp.sin(xk1 - xk2) * jnp.sin(xk1 + xk2)
                + 4.0 * xk1 - xk * jnp.exp(xk - xk1) - 3.0)

    m = n - 2
    x0 = np.full(n, -1.0)
    x0[1::2] = 1.0
    return NLP(name=f"luksan_vlcek1_{n}", f=f, g=g,
               g_L=jnp.zeros(m), g_U=jnp.zeros(m),
               x0=jnp.asarray(x0))


ALL_SMALL = [hs001, hs006, hs016, hs035, hs038, hs051, hs071, hs076, hs100]

KNOWN_OPTIMA = {
    "hs001": 0.0,
    "hs006": 0.0,
    # hs016: with default gradient-based scaling the solver reaches the
    # global optimum 0.25 at (0.5, 0.25); without scaling it lands in the
    # local corner minimum at x=(-0.5, sqrt(0.5)) instead.
    "hs016": 0.25,
    "hs035": 1.0 / 9.0,
    "hs038": 0.0,
    "hs051": 0.0,
    "hs071": HS071_F_STAR,
    "hs076": -4.681818181,
    "hs100": 680.6300573,
}


def hs002():
    """Rosenbrock with x2 >= 1.5 (local solution)."""
    return NLP(
        name="hs002",
        f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        x_L=jnp.array([-jnp.inf, 1.5]),
        x0=jnp.array([-2.0, 1.0]))


def hs003():
    return NLP(
        name="hs003",
        f=lambda x: x[1] + 1e-5 * (x[1] - x[0]) ** 2,
        x_L=jnp.array([-jnp.inf, 0.0]),
        x0=jnp.array([10.0, 1.0]))  # f* = 0


def hs004():
    return NLP(
        name="hs004",
        f=lambda x: (x[0] + 1.0) ** 3 / 3.0 + x[1],
        x_L=jnp.array([1.0, 0.0]),
        x0=jnp.array([1.125, 0.15]))  # f* = 8/3


def hs005():
    return NLP(
        name="hs005",
        f=lambda x: (jnp.sin(x[0] + x[1]) + (x[0] - x[1]) ** 2
                     - 1.5 * x[0] + 2.5 * x[1] + 1.0),
        x_L=jnp.array([-1.5, -3.0]), x_U=jnp.array([4.0, 3.0]),
        x0=jnp.array([0.0, 0.0]))  # f* = -(sqrt(3)/2 + pi/3)


def hs010():
    return NLP(
        name="hs010",
        f=lambda x: x[0] - x[1],
        g=lambda x: jnp.array([-3.0 * x[0] ** 2 + 2.0 * x[0] * x[1]
                               - x[1] ** 2 + 1.0]),
        g_L=jnp.array([0.0]), g_U=jnp.array([jnp.inf]),
        x0=jnp.array([-10.0, 10.0]))  # f* = -1


def hs011():
    return NLP(
        name="hs011",
        f=lambda x: (x[0] - 5.0) ** 2 + x[1] ** 2 - 25.0,
        g=lambda x: jnp.array([-x[0] ** 2 + x[1]]),
        g_L=jnp.array([0.0]), g_U=jnp.array([jnp.inf]),
        x0=jnp.array([4.9, 0.1]))  # f* = -8.498464223


def hs014():
    return NLP(
        name="hs014",
        f=lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
        g=lambda x: jnp.array([
            x[0] - 2.0 * x[1] + 1.0,
            -0.25 * x[0] ** 2 - x[1] ** 2 + 1.0]),
        g_L=jnp.array([0.0, 0.0]), g_U=jnp.array([0.0, jnp.inf]),
        x0=jnp.array([2.0, 2.0]))  # f* = 9/8*(sqrt(7)-1)^2... ~1.3934649


def hs033():
    return NLP(
        name="hs033",
        f=lambda x: (x[0] - 1.0) * (x[0] - 2.0) * (x[0] - 3.0) + x[2],
        g=lambda x: jnp.array([
            x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0]),
        g_L=jnp.array([0.0, 0.0]), g_U=jnp.array([jnp.inf, jnp.inf]),
        x_L=0.0, x_U=jnp.array([jnp.inf, jnp.inf, 5.0]),
        x0=jnp.array([0.0, 0.0, 3.0]))  # f* = sqrt(2) - 6


def hs048():
    return NLP(
        name="hs048",
        f=lambda x: ((x[0] - 1.0) ** 2 + (x[1] - x[2]) ** 2
                     + (x[3] - x[4]) ** 2),
        g=lambda x: jnp.array([
            x[0] + x[1] + x[2] + x[3] + x[4] - 5.0,
            x[2] - 2.0 * (x[3] + x[4]) + 3.0]),
        g_L=jnp.zeros(2), g_U=jnp.zeros(2),
        x0=jnp.array([3.0, 5.0, -3.0, 2.0, -2.0]))  # f* = 0


def hs110():
    """Bounds-only with logs; f* ~ -45.77846971."""
    return NLP(
        name="hs110",
        f=lambda x: (jnp.sum(jnp.log(x - 2.0) ** 2 + jnp.log(10.0 - x) ** 2)
                     - jnp.prod(x) ** 0.2),
        x_L=2.001, x_U=9.999,
        x0=jnp.full(10, 9.0))


ROBUSTNESS_SET = [hs002, hs003, hs004, hs005, hs010, hs011, hs014, hs033,
                  hs048, hs110]

KNOWN_OPTIMA.update({
    "hs002": 0.0504261879,
    "hs003": 0.0,
    "hs004": 8.0 / 3.0,
    "hs005": -(np.sqrt(3.0) / 2.0 + np.pi / 3.0),
    "hs010": -1.0,
    "hs011": -8.498464223,
    # x* = ((sqrt(7)-1)/2, (sqrt(7)+1)/4)
    "hs014": (np.sqrt(7.0) / 2.0 - 0.5 - 2.0) ** 2
             + (np.sqrt(7.0) / 4.0 + 0.25 - 1.0) ** 2,
    "hs033": np.sqrt(2.0) - 6.0,
    "hs048": 0.0,
    "hs110": -45.77846971,
})
