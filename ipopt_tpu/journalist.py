"""Journalist: multi-sink, per-category leveled logging.

Reference parity: ``Journalist`` (``src/Common/IpJournalist.hpp:31-46`` levels,
``:416`` FileJournal, ``:498`` StreamJournal): 13 print levels
J_INSUPPRESSIBLE..J_ALL, per-category levels (J_MAIN, J_LINE_SEARCH,
J_LINEAR_ALGEBRA, ...), and any number of journals (sinks) each with its own
per-category acceptance levels.

TPU-native role: the solver's *in-jit* output is the iteration line (emitted
through jax.debug.callback); everything Python-side — banner, derivative
checker, dependency detection, options documentation, final summary, timing —
routes through the module Journalist so users get Ipopt's familiar
level/category controls (``print_level``, ``output_file``,
``file_print_level``).
"""
from __future__ import annotations

import sys
from enum import IntEnum
from typing import Dict, List, Optional, TextIO


class EJournalLevel(IntEnum):
    """IpJournalist.hpp:31-46."""
    J_INSUPPRESSIBLE = -1
    J_NONE = 0
    J_ERROR = 1
    J_STRONGWARNING = 2
    J_SUMMARY = 3
    J_WARNING = 4
    J_ITERSUMMARY = 5
    J_DETAILED = 6
    J_MOREDETAILED = 7
    J_VECTOR = 8
    J_MOREVECTOR = 9
    J_MATRIX = 10
    J_MOREMATRIX = 11
    J_ALL = 12


class EJournalCategory(IntEnum):
    """IpJournalist.hpp:49-68."""
    J_DBG = 0
    J_STATISTICS = 1
    J_MAIN = 2
    J_INITIALIZATION = 3
    J_BARRIER_UPDATE = 4
    J_SOLVE_PD_SYSTEM = 5
    J_FRAC_TO_BOUND = 6
    J_LINEAR_ALGEBRA = 7
    J_LINE_SEARCH = 8
    J_HESSIAN_APPROXIMATION = 9
    J_SOLUTION = 10
    J_DOCUMENTATION = 11
    J_NLP = 12
    J_TIMING_STATISTICS = 13
    J_USER_APPLICATION = 14
    J_USER1 = 15


class Journal:
    """One output sink with per-category acceptance levels (Journal base,
    IpJournalist.hpp:303)."""

    def __init__(self, name: str, default_level: int,
                 stream: Optional[TextIO] = None,
                 filename: Optional[str] = None, append: bool = True):
        self.name = name
        self._levels: Dict[EJournalCategory, int] = {
            c: int(default_level) for c in EJournalCategory}
        self._stream = stream
        self._filename = filename
        self._append = append
        self._fh: Optional[TextIO] = None

    # SetPrintLevel / SetAllPrintLevels
    def set_print_level(self, category: EJournalCategory, level: int):
        self._levels[EJournalCategory(category)] = int(level)

    def set_all_print_levels(self, level: int):
        for c in EJournalCategory:
            self._levels[c] = int(level)

    def is_accepted(self, category: EJournalCategory, level: int) -> bool:
        return (level == EJournalLevel.J_INSUPPRESSIBLE
                or (level <= self._levels[EJournalCategory(category)]
                    and level > EJournalLevel.J_NONE))

    def _ensure(self) -> Optional[TextIO]:
        if self._stream is not None:
            return self._stream
        if self._filename and self._fh is None:
            # file_append (IpoptApplication: FileJournal open mode)
            self._fh = open(self._filename, "a" if self._append else "w")
        return self._fh

    def write(self, text: str):
        out = self._ensure()
        if out is not None:
            out.write(text)
            out.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class Journalist:
    """Printf-style fan-out to all accepting journals (IpJournalist.hpp:76)."""

    def __init__(self):
        self._journals: List[Journal] = []

    def add_journal(self, journal: Journal) -> Journal:
        self.delete_journal(journal.name)
        self._journals.append(journal)
        return journal

    def add_file_journal(self, name: str, filename: str,
                         default_level: int = EJournalLevel.J_ITERSUMMARY,
                         append: bool = True) -> Journal:
        return self.add_journal(Journal(name, default_level,
                                        filename=filename, append=append))

    def get_journal(self, name: str) -> Optional[Journal]:
        for j in self._journals:
            if j.name == name:
                return j
        return None

    def delete_journal(self, name: str):
        self._journals = [j for j in self._journals if j.name != name]

    def produce_output(self, level: int,
                       category: EJournalCategory = EJournalCategory.J_MAIN
                       ) -> bool:
        return any(j.is_accepted(category, level) for j in self._journals)

    def printf(self, level: int, category: EJournalCategory, fmt: str,
               *args):
        text = (fmt % args) if args else fmt
        for j in self._journals:
            if j.is_accepted(category, level):
                j.write(text)


# The default Journalist used by the solver's Python-side output.  A console
# journal at J_ITERSUMMARY mirrors IpoptApplication's default console journal
# (IpIpoptApplication.cpp:160-235); ``configure_from_options`` retunes it from
# print_level / output_file / file_print_level.
_default = Journalist()
_default.add_journal(Journal("console", EJournalLevel.J_ITERSUMMARY,
                             stream=sys.stdout))


def default_journalist() -> Journalist:
    return _default


def configure_from_options(opts) -> Journalist:
    """Apply print_level / output_file / file_print_level (the same trio
    IpoptApplication::Initialize reads, IpIpoptApplication.cpp:160-347)."""
    con = _default.get_journal("console")
    if con is not None:
        con.set_all_print_levels(opts.print_level)
        dbg = getattr(opts, "debug_print_level", 0)
        if dbg:
            # debug_print_level (IpDebug.cpp / IpIpoptApplication.cpp:168):
            # separate verbosity for the J_DBG debug category
            con.set_print_level(EJournalCategory.J_DBG, dbg)
    if getattr(opts, "output_file", ""):
        j = _default.add_file_journal(
            "output_file", opts.output_file,
            getattr(opts, "file_print_level", opts.print_level),
            append=getattr(opts, "file_append", True))
        j.set_all_print_levels(
            getattr(opts, "file_print_level", opts.print_level))
    return _default
