"""alpha_for_y dual-step rules, constraint_violation_norm_type, magic_steps
(IpBacktrackingLineSearch.cpp:85-103,905-990,1003-1099;
IpIpoptCalculatedQuantities.cpp:164-175)."""
import jax.numpy as jnp
import pytest

import ipopt_tpu
from ipopt_tpu.modellib import hs071
from ipopt_tpu.options import Options
from tests.kkt_check import verify_kkt


RULES = ["primal", "bound-mult", "min", "max", "full", "min-dual-infeas",
         "safer-min-dual-infeas", "primal-and-full", "dual-and-full",
         "acceptor"]


@pytest.mark.parametrize("rule", RULES)
def test_alpha_for_y_rules_hs071(rule):
    res = ipopt_tpu.solve(hs071(), Options(print_level=0, alpha_for_y=rule))
    assert int(res.status) == 0, rule
    assert abs(float(res.obj) - 17.0140171451792) < 1e-6, rule
    verify_kkt(hs071(), res, tol=1e-6)


@pytest.mark.parametrize("norm", ["1-norm", "2-norm", "max-norm"])
def test_constraint_violation_norm_type(norm):
    res = ipopt_tpu.solve(hs071(), Options(
        print_level=0, constraint_violation_norm_type=norm))
    assert int(res.status) == 0, norm
    assert abs(float(res.obj) - 17.0140171451792) < 1e-6, norm


def test_magic_steps():
    res = ipopt_tpu.solve(hs071(), Options(print_level=0, magic_steps=True))
    assert int(res.status) == 0
    assert abs(float(res.obj) - 17.0140171451792) < 1e-6


def test_magic_step_direction():
    """The magic step moves s toward d within one-sided bounds and never
    away from the centered point on two-sided rows."""
    from ipopt_tpu.algorithm.linesearch import magic_step
    from ipopt_tpu.problem import canonicalize
    nlp = canonicalize(hs071(), Options())
    # HS071 rows: g1 >= 25 (lower only), g2 == 40 handled as equality; the
    # canonical d-rows carry has_dL/has_dU masks. Use synthetic s, d:
    s = jnp.where(nlp.has_dL, nlp.d_L + 0.5, 0.0)
    d = s + 1.0  # d > s: lower-bounded rows should move up to d
    s2 = magic_step(nlp, s, d)
    up = jnp.logical_and(nlp.has_dL, jnp.logical_not(nlp.has_dU))
    assert bool(jnp.all(jnp.where(up, s2 == d, True)))
