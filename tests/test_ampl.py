"""AMPL .nl reader tests (AmplSolver capability parity).

The .nl fixture below is hand-written in AMPL's ASCII format (Gay, "Writing
.nl Files") encoding HS071 — exercising nonlinear expressions (o0/o2/o5/o54),
bounds, ranges, and the initial-guess segment.
"""
import os

import numpy as np
import pytest

from ipopt_tpu import SolverReturn
from ipopt_tpu.interfaces.ampl import read_nl, write_sol, main
from ipopt_tpu.algorithm.solver import solve

import problems

HS071_NL = """g3 0 1 0
4 2 1 0 1
2 1
0 0
4 4 4
0 0 0 1
0 0 0 0 0
8 3
0 0
0 0 0 0 0
C0
o2
o2
o2
v0
v1
v2
v3
C1
o54
4
o5
v0
n2
o5
v1
n2
o5
v2
n2
o5
v3
n2
O0 0
o0
o2
o2
v0
v3
o54
3
v0
v1
v2
v2
r
2 25
4 40
b
0 1 5
0 1 5
0 1 5
0 1 5
x4
0 1
1 5
2 5
3 1
"""


@pytest.fixture()
def nl_path(tmp_path):
    p = tmp_path / "hs071.nl"
    p.write_text(HS071_NL)
    return str(p)


def test_read_nl_evaluates(nl_path):
    import jax.numpy as jnp
    nlp = read_nl(nl_path)
    x = jnp.asarray(np.array([1.0, 5.0, 5.0, 1.0]))
    np.testing.assert_allclose(float(nlp.f(x)), 16.0)
    np.testing.assert_allclose(np.asarray(nlp.g(x)), [25.0, 52.0])
    np.testing.assert_allclose(np.asarray(nlp.x0), [1, 5, 5, 1])
    np.testing.assert_allclose(np.asarray(nlp.g_L), [25.0, 40.0])
    np.testing.assert_allclose(np.asarray(nlp.g_U), [np.inf, 40.0])


def test_solve_nl_matches_hs071(nl_path):
    nlp = read_nl(nl_path)
    res = solve(nlp, print_level=0)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    np.testing.assert_allclose(float(res.obj), problems.HS071_F_STAR, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), problems.HS071_X_STAR,
                               atol=1e-6)


def test_ampl_cli(nl_path, capsys):
    rc = main([nl_path, "-AMPL", "print_level=0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "EXIT: Optimal Solution Found." in out
    sol = nl_path[:-3] + ".sol"
    assert os.path.exists(sol)
    txt = open(sol).read()
    assert "objno 0 0" in txt
