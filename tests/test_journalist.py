"""Journalist: per-category leveled logging with console + file sinks
(IpJournalist.hpp:31-68,303,416 parity)."""
import os

import numpy as np

from ipopt_tpu.journalist import (Journalist, Journal, EJournalLevel as L,
                                  EJournalCategory as C)

import problems


def test_levels_and_categories(capsys):
    import io
    buf = io.StringIO()
    j = Journalist()
    sink = Journal("test", L.J_SUMMARY, stream=buf)
    j.add_journal(sink)
    j.printf(L.J_SUMMARY, C.J_MAIN, "visible %d\n", 1)
    j.printf(L.J_DETAILED, C.J_MAIN, "hidden\n")
    # raise only the LINE_SEARCH category
    sink.set_print_level(C.J_LINE_SEARCH, L.J_DETAILED)
    j.printf(L.J_DETAILED, C.J_LINE_SEARCH, "ls-detail\n")
    j.printf(L.J_DETAILED, C.J_MAIN, "still hidden\n")
    j.printf(L.J_INSUPPRESSIBLE, C.J_MAIN, "always\n")
    out = buf.getvalue()
    assert "visible 1" in out and "ls-detail" in out and "always" in out
    assert "hidden" not in out
    assert j.produce_output(L.J_DETAILED, C.J_LINE_SEARCH)
    assert not j.produce_output(L.J_DETAILED, C.J_MAIN)


def test_output_file_journal(tmp_path):
    # The iteration log lands in output_file at file_print_level even with a
    # silent console (IpoptApplication output_file semantics).
    from ipopt_tpu import solve, SolverReturn
    path = str(tmp_path / "ipopt.out")
    res = solve(problems.hs071(), print_level=0, output_file=path,
                file_print_level=5)
    assert int(res.status) == int(SolverReturn.SUCCESS)
    text = open(path).read()
    assert "iter    objective" in text
    assert " 0 " in text.splitlines()[1] or len(text.splitlines()) > 3
