"""AMPL .nl reader + .sol writer — the AmplSolver executable capability
(reference ``src/Apps/AmplSolver/``: ASL-based ``AmplTNLP``, ``ampl_ipopt.cpp``).

The reference links AMPL's ASL library to evaluate .nl expression graphs; here
the .nl file (ASCII "g" format, Gay: "Writing .nl Files", also documented
inline in the reference's test/mytoy.nl) is parsed into an expression tree
that is *traced into jnp* once — autodiff then provides exact first and second
derivatives of the AMPL model with no ASL dependency.

Supported: continuous smooth models — C/O nonlinear expressions over the
common ASL opcode set, J/G linear parts, r/b bound sections, x initial guess.
Unsupported (rejected loudly): integer variables, complementarity, defined
variables (V segments), imported functions.

CLI (the `ipopt` executable equivalent):
    python -m ipopt_tpu.interfaces.ampl model.nl [-AMPL] [option=value...]
writes model.sol in AMPL's format.
"""
from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..problem import NLP
from ..options import Options

# ASL opcodes (asl/opcode.hd)
_BINOPS = {
    0: lambda a, b: a + b,
    1: lambda a, b: a - b,
    2: lambda a, b: a * b,
    3: lambda a, b: a / b,
    4: lambda a, b: a % b,
    5: lambda a, b: a ** b,
    48: lambda a, b: jnp.arctan2(a, b),
}
_UNOPS = {
    13: jnp.floor,
    14: jnp.ceil,
    15: jnp.abs,
    16: lambda a: -a,
    37: jnp.tanh,
    38: jnp.tan,
    39: jnp.sqrt,
    40: jnp.sinh,
    41: jnp.sin,
    42: lambda a: jnp.log10(a),
    43: jnp.log,
    44: jnp.exp,
    45: jnp.cosh,
    46: jnp.cos,
    47: jnp.arctanh,
    49: jnp.arctan,
    50: jnp.arcsinh,
    51: jnp.arcsin,
    52: jnp.arccosh,
    53: jnp.arccos,
}
_OP_SUMLIST = 54
_OP_MINLIST = 11
_OP_MAXLIST = 12


class _NLParser:
    def __init__(self, text: str):
        # strip comments; keep non-empty tokens line-oriented
        self.lines: List[str] = []
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if line:
                self.lines.append(line)
        self.pos = 0

    def peek(self) -> Optional[str]:
        return self.lines[self.pos] if self.pos < len(self.lines) else None

    def next(self) -> str:
        line = self.lines[self.pos]
        self.pos += 1
        return line

    # -- expression trees -------------------------------------------------
    def parse_expr(self):
        line = self.next()
        kind = line[0]
        rest = line[1:].strip()
        if kind == "n":
            return ("const", float(rest))
        if kind == "v":
            return ("var", int(rest))
        if kind == "o":
            op = int(rest)
            if op in _BINOPS:
                return ("bin", op, self.parse_expr(), self.parse_expr())
            if op in _UNOPS:
                return ("un", op, self.parse_expr())
            if op in (_OP_SUMLIST, _OP_MINLIST, _OP_MAXLIST):
                cnt = int(self.next())
                args = [self.parse_expr() for _ in range(cnt)]
                return ("nary", op, args)
            raise NotImplementedError(f".nl opcode o{op} not supported")
        raise ValueError(f"unexpected .nl expression line: {line!r}")


def _eval_expr(tree, x):
    kind = tree[0]
    if kind == "const":
        return tree[1]
    if kind == "var":
        return x[tree[1]]
    if kind == "bin":
        return _BINOPS[tree[1]](_eval_expr(tree[2], x), _eval_expr(tree[3], x))
    if kind == "un":
        return _UNOPS[tree[1]](_eval_expr(tree[2], x))
    if kind == "nary":
        vals = [_eval_expr(a, x) for a in tree[2]]
        if tree[1] == _OP_SUMLIST:
            out = vals[0]
            for v in vals[1:]:
                out = out + v
            return out
        red = jnp.minimum if tree[1] == _OP_MINLIST else jnp.maximum
        out = vals[0]
        for v in vals[1:]:
            out = red(out, v)
        return out
    raise AssertionError(tree)


def _read_bound_line(tokens):
    """Bound code lines in r/b sections: code [val [val]]."""
    code = int(tokens[0])
    if code == 0:
        return float(tokens[1]), float(tokens[2])
    if code == 1:
        return -np.inf, float(tokens[1])
    if code == 2:
        return float(tokens[1]), np.inf
    if code == 3:
        return -np.inf, np.inf
    if code == 4:
        v = float(tokens[1])
        return v, v
    raise NotImplementedError(f"bound code {code} (complementarity?) "
                              "not supported")


def read_nl(path: str) -> NLP:
    with open(path) as fh:
        text = fh.read()
    p = _NLParser(text)

    head = p.next()
    if not head.startswith("g"):
        raise NotImplementedError("only ASCII ('g') .nl files are supported")
    dims = p.next().split()
    n_var, n_con, n_obj = int(dims[0]), int(dims[1]), int(dims[2])
    # remaining header lines: consume until the first segment marker
    n_binary = n_integer = 0
    hdr = []
    while p.peek() is not None and not p.peek()[0] in "CObrkJGxSdVFL":
        hdr.append(p.next().split())
    if len(hdr) >= 5 and len(hdr[4]) >= 2:
        n_binary, n_integer = int(hdr[4][0]), int(hdr[4][1])
    if n_binary or n_integer:
        raise NotImplementedError(
            ".nl model has discrete variables; ipopt_tpu solves continuous "
            "NLPs (as does the reference ipopt executable)")
    if n_obj > 1:
        raise NotImplementedError("multiple objectives not supported")

    con_expr = [("const", 0.0)] * n_con
    obj_expr = ("const", 0.0)
    obj_sense = 0  # 0 = minimize
    J = [dict() for _ in range(n_con)]
    Gv = {}
    r_L = np.full(n_con, -np.inf)
    r_U = np.full(n_con, np.inf)
    x_L = np.full(n_var, -np.inf)
    x_U = np.full(n_var, np.inf)
    x0 = np.zeros(n_var)

    while p.peek() is not None:
        line = p.next()
        tag = line[0]
        if tag == "C":
            i = int(line[1:].split()[0])
            con_expr[i] = p.parse_expr()
        elif tag == "O":
            parts = line[1:].split()
            obj_sense = int(parts[1]) if len(parts) > 1 else 0
            obj_expr = p.parse_expr()
        elif tag == "r":
            for i in range(n_con):
                lo, hi = _read_bound_line(p.next().split())
                r_L[i], r_U[i] = lo, hi
        elif tag == "b":
            for i in range(n_var):
                lo, hi = _read_bound_line(p.next().split())
                x_L[i], x_U[i] = lo, hi
        elif tag == "k":
            cnt = int(line[1:])
            for _ in range(cnt):
                p.next()
        elif tag == "J":
            parts = line[1:].split()
            i, cnt = int(parts[0]), int(parts[1])
            for _ in range(cnt):
                t = p.next().split()
                J[i][int(t[0])] = float(t[1])
        elif tag == "G":
            parts = line[1:].split()
            cnt = int(parts[1])
            for _ in range(cnt):
                t = p.next().split()
                Gv[int(t[0])] = float(t[1])
        elif tag == "x":
            cnt = int(line[1:])
            for _ in range(cnt):
                t = p.next().split()
                x0[int(t[0])] = float(t[1])
        elif tag in ("S", "d"):
            parts = line[1:].split()
            cnt = int(parts[-1])
            for _ in range(cnt):
                p.next()
        elif tag in ("V", "F", "L"):
            raise NotImplementedError(
                f".nl segment '{tag}' (defined variables / imported "
                "functions / logical constraints) not supported")
        else:
            raise ValueError(f"unknown .nl segment: {line!r}")

    sign = -1.0 if obj_sense == 1 else 1.0  # 1 = maximize

    g_lin_idx = [np.array(sorted(J[i].keys()), np.int32) for i in range(n_con)]
    g_lin_coef = [np.array([J[i][k] for k in sorted(J[i])]) for i in range(n_con)]
    o_lin_idx = np.array(sorted(Gv.keys()), np.int32)
    o_lin_coef = np.array([Gv[k] for k in sorted(Gv)])

    def f(x):
        val = _eval_expr(obj_expr, x)
        if o_lin_idx.size:
            val = val + jnp.dot(jnp.asarray(o_lin_coef),
                                x[jnp.asarray(o_lin_idx)])
        return sign * val

    def g(x):
        rows = []
        for i in range(n_con):
            v = _eval_expr(con_expr[i], x)
            if g_lin_idx[i].size:
                v = v + jnp.dot(jnp.asarray(g_lin_coef[i]),
                                x[jnp.asarray(g_lin_idx[i])])
            rows.append(v)
        return jnp.stack(rows) if rows else jnp.zeros((0,), x.dtype)

    return NLP(f=f, g=g if n_con else None, x0=x0,
               x_L=x_L, x_U=x_U,
               g_L=r_L if n_con else None, g_U=r_U if n_con else None,
               name=path)


def write_sol(path: str, res, message: str = ""):
    """Write AMPL's .sol format (what the reference's ampl_ipopt.cpp emits
    through ASL's write_sol)."""
    y = np.asarray(res.g_duals if hasattr(res, "g_duals") else res.y, float)
    x = np.asarray(res.x, float)
    with open(path, "w") as fh:
        fh.write((message or "ipopt_tpu") + "\n\n")
        fh.write("Options\n3\n0\n1\n0\n")
        fh.write(f"{len(y)}\n{len(y)}\n{len(x)}\n{len(x)}\n")
        for v in y:
            fh.write(f"{v:.17g}\n")
        for v in x:
            fh.write(f"{v:.17g}\n")
        fh.write(f"objno 0 {0 if int(res.status) == 0 else 200}\n")


def main(argv=None):
    from ..algorithm.solver import solve
    from ..types import SolverReturn
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m ipopt_tpu.interfaces.ampl model.nl "
              "[-AMPL] [option=value ...]")
        return 2
    nl_path = argv[0]
    overrides = {}
    for a in argv[1:]:
        if a == "-AMPL":
            continue
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                overrides[k] = float(v) if "." in v or "e" in v else int(v)
            except ValueError:
                overrides[k] = v
    nlp = read_nl(nl_path)
    res = solve(nlp, print_level=overrides.pop("print_level", 5), **overrides)
    status = SolverReturn(int(res.status))
    msg = ("ipopt_tpu: Optimal Solution Found"
           if status in (SolverReturn.SUCCESS,
                         SolverReturn.STOP_AT_ACCEPTABLE_POINT)
           else f"ipopt_tpu: {status.name}")
    sol_path = nl_path[:-3] + ".sol" if nl_path.endswith(".nl") else nl_path + ".sol"
    write_sol(sol_path, res, msg)
    print(msg)
    if status in (SolverReturn.SUCCESS, SolverReturn.STOP_AT_ACCEPTABLE_POINT):
        print("EXIT: Optimal Solution Found.")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
