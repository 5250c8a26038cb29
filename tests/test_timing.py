"""TimingStatistics parity (reference IpTimingStatistics.hpp:37-160,
print_timing_statistics IpIpoptApplication.cpp:628-634)."""
import ipopt_tpu
from ipopt_tpu.modellib import hs071
from ipopt_tpu.options import Options
from ipopt_tpu.profiling import solve_timed


def test_solve_timed_hs071():
    res, rep = solve_timed(hs071(), Options(print_level=0),
                           print_report=False)
    assert int(res.status) == 0
    assert abs(float(res.obj) - 17.0140171451792) < 1e-6
    assert rep.iters == int(res.iter_count) > 0
    assert rep.overall > 0.0
    assert rep.lin_factorization > 0.0
    assert rep.lin_backsolve > 0.0
    assert rep.function_evals > 0.0
    # phases measured on the side never exceed... nothing strict to assert
    # beyond positivity; the report must print without error:
    lines = []
    rep.print(out=lines.append)
    text = "\n".join(lines)
    assert "OverallAlgorithm" in text
    assert "LinearSystemFactorization" in text


def test_print_timing_statistics_option(capsys):
    res = ipopt_tpu.solve(hs071(), Options(print_level=0,
                                           print_timing_statistics=True))
    assert int(res.status) == 0
    out = capsys.readouterr().out
    assert "OverallAlgorithm" in out
    assert "KKT factorizations" in out
