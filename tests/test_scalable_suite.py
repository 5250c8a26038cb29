"""ScalableProblems parity: LuksanVlcek4-7 and MittelmannBndryCntrlDiri 1-4.

Reference: examples/ScalableProblems/LuksanVlcek{4,5,6,7}.cpp and
MittelmannBndryCntrlDiri.{hpp,cpp}; registry instances LukVl{E,I}{4..7} and
MBndryCntrl1-4 (solve_problem.cpp:37-54).  The reference test gate is
"EXIT: Optimal Solution Found."; here each solve is additionally
KKT-certified with fresh autodiff (kkt_check.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ipopt_tpu import solve, Options
from ipopt_tpu.chained import canonicalize_chained
from ipopt_tpu.algorithm.solver import solve as solve_canonical
from ipopt_tpu.modellib import (luksan_vlcek4, luksan_vlcek5, luksan_vlcek6,
                                luksan_vlcek7, mittelmann_bndry_control)
from kkt_check import verify_kkt

OPTS = Options(print_level=0)

LV_CASES = [
    ("lv4E", lambda: luksan_vlcek4(16, True)),
    ("lv4I", lambda: luksan_vlcek4(16, False)),
    ("lv5E", lambda: luksan_vlcek5(16, True)),
    ("lv5I", lambda: luksan_vlcek5(16, False)),
    ("lv6E", lambda: luksan_vlcek6(17, True)),
    ("lv6I", lambda: luksan_vlcek6(17, False)),
    ("lv7E", lambda: luksan_vlcek7(16, True)),
    ("lv7I", lambda: luksan_vlcek7(16, False)),
]


@pytest.mark.parametrize("name,builder", LV_CASES, ids=[c[0] for c in LV_CASES])
def test_luksan_vlcek_4_to_7(name, builder):
    nlp = builder()
    res = solve(nlp, OPTS)
    assert int(res.status) == 0, f"{name}: status {int(res.status)}"
    verify_kkt(nlp, res, tol=1e-6)


@pytest.mark.parametrize("example", [1, 3])
def test_mittelmann_bndry_2d_chained(example):
    """2-D elliptic boundary control solves via the BCR chained backend and
    the objective matches the dense-backend solve of the same NLP."""
    N = 10
    ch = mittelmann_bndry_control(N, example=example)
    cn = canonicalize_chained(ch, OPTS)
    res = solve_canonical(cn, OPTS)
    assert int(res.status) == 0

    # dense cross-check: same flat functions through the generic dense path
    from ipopt_tpu.problem import NLP
    Ng = N + 2
    flat = NLP(
        f=cn.f, g=cn.g,
        x_L=np.asarray(ch.x_L, float).reshape(-1),
        x_U=np.asarray(ch.x_U, float).reshape(-1),
        g_L=np.asarray(ch.g_L, float).reshape(-1),
        g_U=np.asarray(ch.g_U, float).reshape(-1),
        x0=np.asarray(ch.x0, float).reshape(-1),
        params=cn.params)
    res_d = solve(flat, OPTS)
    assert int(res_d.status) == 0
    np.testing.assert_allclose(float(res.obj), float(res_d.obj),
                               rtol=1e-6, atol=1e-8)


def test_mittelmann_consistency_at_x0():
    """Chained objective/constraints equal a hand-built dense evaluation."""
    N, ex = 8, 1
    ch = mittelmann_bndry_control(N, example=ex)
    cn = canonicalize_chained(ch, OPTS)
    x0 = np.asarray(ch.x0, float).reshape(-1)
    fval = float(cn.eval_f(jnp.asarray(x0)) / cn.obj_scale)

    Ng = N + 2
    h = 1.0 / (N + 1)
    hh = h * h
    ij = np.arange(Ng) * h
    y_d = 3.0 + 5.0 * (ij[:, None] * (ij[:, None] - 1.0)
                       * ij[None, :] * (ij[None, :] - 1.0))
    Y = x0.reshape(Ng, Ng)
    f_manual = hh / 2 * np.sum((Y[1:-1, 1:-1] - y_d[1:-1, 1:-1]) ** 2)
    bnd = np.zeros((Ng, Ng), bool)
    bnd[0, :] = bnd[-1, :] = bnd[:, 0] = bnd[:, -1] = True
    f_manual += 0.01 * h / 2 * np.sum(Y[bnd] ** 2)
    np.testing.assert_allclose(fval, f_manual, rtol=1e-12)

    # PDE residual at an interior point, via the canonical g
    gval = np.asarray(cn.eval_c(jnp.asarray(x0)))  # scaled equality residual
    assert gval.shape[0] == ch.g_L.size
