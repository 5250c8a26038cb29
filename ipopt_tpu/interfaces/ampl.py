"""AMPL .nl reader + .sol writer — the AmplSolver executable capability
(reference ``src/Apps/AmplSolver/``: ASL-based ``AmplTNLP``, ``AmplSuffixHandler``,
``ampl_ipopt.cpp``).

The reference links AMPL's ASL library to evaluate .nl expression graphs; here
the .nl file is parsed into an expression tree that is *traced into jnp* once —
autodiff then provides exact first and second derivatives of the AMPL model
with no ASL dependency.

Formats (D. Gay, "Writing .nl Files", and the grammar used by ASL's
fg_read.c):
- ASCII ('g' header): line-oriented tokens.
- binary ('b' header): the same grammar with the segment/expression tag
  letters as single bytes, 4-byte native ints and 8-byte IEEE doubles in
  place of the ASCII numbers (no newlines).

Supported: continuous smooth models — C/O nonlinear expressions over the
common ASL opcode set, J/G linear parts, r/b bound sections, x initial guess,
d dual initial guess, V defined-variable segments, S suffixes including the
reference's warm-start duals ``ipopt_zL_in``/``ipopt_zU_in``
(``ampl_ipopt.cpp:77-83``) and ``scaling_factor``.
Unsupported (rejected loudly): integer variables, complementarity, SOS
declarations (``sosno``/``ref`` suffixes), imported functions (F), logical
constraints (L).

CLI (the `ipopt` executable equivalent):
    python -m ipopt_tpu.interfaces.ampl model.nl [-AMPL] [option=value...]
writes model.sol in AMPL's format (with ipopt_zL_out/ipopt_zU_out suffixes,
like the reference's write_sol path).
"""
from __future__ import annotations

import struct
import sys
from typing import Any, Dict, List, Optional, Tuple

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


class _AsciiReader:
    """Token reader over the line-oriented ASCII format."""

    def __init__(self, data: bytes, pos: int):
        text = data[pos:].decode("ascii", errors="replace")
        self.lines: List[str] = []
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if line:
                self.lines.append(line)
        self.pos = 0

    def at_end(self) -> bool:
        return self.pos >= len(self.lines)

    def seg_header(self) -> Tuple[str, List[str]]:
        """Next segment: (tag char, remaining header tokens)."""
        line = self.lines[self.pos]
        self.pos += 1
        return line[0], line[1:].split()

    def expr_node(self):
        """('o', opcode) | ('n', value) | ('v', index)."""
        line = self.lines[self.pos]
        self.pos += 1
        kind = line[0]
        rest = line[1:].strip()
        if kind == "n":
            return "n", float(rest)
        if kind == "v":
            return "v", int(rest)
        if kind == "o":
            return "o", int(rest)
        raise ValueError(f"unexpected .nl expression line: {line!r}")

    def int_line(self) -> int:
        v = int(self.lines[self.pos].split()[0])
        self.pos += 1
        return v

    def int_pair(self) -> Tuple[int, float]:
        t = self.lines[self.pos].split()
        self.pos += 1
        return int(t[0]), float(t[1])

    def suf_entry(self, real: bool) -> Tuple[int, float]:
        return self.int_pair()

    def bound(self) -> Tuple[float, float]:
        return _decode_bound(self.lines[self.pos].split(), self)


class _BinaryReader:
    """Token reader over the binary format: tag letters as single bytes,
    native 4-byte ints and 8-byte doubles, no newlines."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos

    def at_end(self) -> bool:
        return self.pos >= len(self.data)

    def _int(self) -> int:
        v = struct.unpack_from("<i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def _dbl(self) -> float:
        v = struct.unpack_from("<d", self.data, self.pos)[0]
        self.pos += 8
        return v

    def _tag(self) -> str:
        c = chr(self.data[self.pos])
        self.pos += 1
        return c

    def seg_header(self) -> Tuple[str, List[str]]:
        tag = self._tag()
        # header field counts per segment tag (grammar of fg_read.c)
        counts = {"C": 1, "O": 2, "x": 1, "d": 1, "r": 0, "b": 0, "k": 1,
                  "J": 2, "G": 2, "V": 3, "S": 2, "F": 4, "L": 1}
        if tag not in counts:
            raise ValueError(f"unknown binary .nl segment {tag!r}")
        vals = [str(self._int()) for _ in range(counts[tag])]
        if tag == "S":
            # S kind n name: the name is a newline-terminated ASCII string
            end = self.data.index(b"\n", self.pos)
            vals.append(self.data[self.pos:end].decode("ascii").strip())
            self.pos = end + 1
        return tag, vals

    def expr_node(self):
        kind = self._tag()
        if kind == "n":
            return "n", self._dbl()
        if kind == "v":
            return "v", self._int()
        if kind == "o":
            return "o", self._int()
        raise ValueError(f"unexpected binary .nl expression tag {kind!r}")

    def int_line(self) -> int:
        return self._int()

    def int_pair(self) -> Tuple[int, float]:
        return self._int(), self._dbl()

    def suf_entry(self, real: bool) -> Tuple[int, float]:
        j = self._int()
        return j, (self._dbl() if real else float(self._int()))

    def bound(self) -> Tuple[float, float]:
        code = self._int()
        if code == 0:
            return self._dbl(), self._dbl()
        if code == 1:
            return -np.inf, self._dbl()
        if code == 2:
            return self._dbl(), np.inf
        if code == 3:
            return -np.inf, np.inf
        if code == 4:
            v = self._dbl()
            return v, v
        raise NotImplementedError(f"bound code {code} (complementarity?) "
                                  "not supported")


def _decode_bound(tokens, rdr) -> Tuple[float, float]:
    """Decode one r/b-section line; consumes the line from ``rdr``."""
    code = int(tokens[0])
    if code == 0:
        out = float(tokens[1]), float(tokens[2])
    elif code == 1:
        out = -np.inf, float(tokens[1])
    elif code == 2:
        out = float(tokens[1]), np.inf
    elif code == 3:
        out = -np.inf, np.inf
    elif code == 4:
        v = float(tokens[1])
        out = v, v
    else:
        raise NotImplementedError(f"bound code {code} (complementarity?) "
                                  "not supported")
    rdr.pos += 1
    return out


def _parse_expr(rdr):
    kind, val = rdr.expr_node()
    if kind == "n":
        return ("const", val)
    if kind == "v":
        return ("var", val)
    op = val
    if op in _BINOPS:
        return ("bin", op, _parse_expr(rdr), _parse_expr(rdr))
    if op in _UNOPS:
        return ("un", op, _parse_expr(rdr))
    if op in (_OP_SUMLIST, _OP_MINLIST, _OP_MAXLIST):
        cnt = rdr.int_line()
        args = [_parse_expr(rdr) for _ in range(cnt)]
        return ("nary", op, args)
    raise NotImplementedError(f".nl opcode o{op} not supported")


def _eval_expr(tree, x, defs, cache):
    kind = tree[0]
    if kind == "const":
        return tree[1]
    if kind == "var":
        i = tree[1]
        if i in defs:  # defined variable (V segment)
            if i not in cache:
                lin, expr = defs[i]
                v = _eval_expr(expr, x, defs, cache)
                for j, c in lin:
                    v = v + c * _eval_expr(("var", j), x, defs, cache)
                cache[i] = v
            return cache[i]
        return x[i]
    if kind == "bin":
        return _BINOPS[tree[1]](_eval_expr(tree[2], x, defs, cache),
                                _eval_expr(tree[3], x, defs, cache))
    if kind == "un":
        return _UNOPS[tree[1]](_eval_expr(tree[2], x, defs, cache))
    if kind == "nary":
        vals = [_eval_expr(a, x, defs, cache) for a in tree[2]]
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


class AmplModel:
    """Parsed .nl model: the NLP plus the AMPL side-channel data
    (suffixes, dual initial guess) — the AmplSuffixHandler equivalent."""

    def __init__(self, nlp: NLP, suffixes: Dict[Tuple[str, str], Dict[int, float]],
                 y0: Optional[np.ndarray]):
        self.nlp = nlp
        self.suffixes = suffixes
        self.y0 = y0


def read_nl_model(path: str) -> AmplModel:
    with open(path, "rb") as fh:
        data = fh.read()

    # The header is ASCII in both formats: 10 lines starting with 'g' or 'b'.
    nl_pos = 0
    header_lines = []
    for _ in range(10):
        end = data.index(b"\n", nl_pos)
        header_lines.append(data[nl_pos:end].decode("ascii"))
        nl_pos = end + 1
    fmt = header_lines[0][:1]
    if fmt not in ("g", "b"):
        raise NotImplementedError(f"unknown .nl format {fmt!r}")
    dims = header_lines[1].split()
    n_var, n_con, n_obj = int(dims[0]), int(dims[1]), int(dims[2])
    hdr = [l.split() for l in header_lines[2:]]
    n_binary = n_integer = 0
    # header line 7 (index 4 after dims): discrete variable counts
    if len(hdr) >= 5 and len(hdr[4]) >= 2:
        n_binary, n_integer = int(hdr[4][0]), int(hdr[4][1])
    if n_binary or n_integer:
        raise NotImplementedError(
            ".nl model has discrete variables; ipopt_tpu solves continuous "
            "NLPs (as does the reference ipopt executable)")
    if n_obj > 1:
        raise NotImplementedError("multiple objectives not supported")

    rdr = (_AsciiReader(data, nl_pos) if fmt == "g"
           else _BinaryReader(data, nl_pos))

    con_expr = [("const", 0.0)] * n_con
    obj_expr = ("const", 0.0)
    obj_sense = 0  # 0 = minimize
    J = [dict() for _ in range(n_con)]
    Gv: Dict[int, float] = {}
    r_L = np.full(n_con, -np.inf)
    r_U = np.full(n_con, np.inf)
    x_L = np.full(n_var, -np.inf)
    x_U = np.full(n_var, np.inf)
    x0 = np.zeros(n_var)
    y0 = None
    defs: Dict[int, tuple] = {}          # defined variables (V segments)
    suffixes: Dict[Tuple[str, str], Dict[int, float]] = {}
    _SUF_TARGETS = ("var", "con", "obj", "prob")

    while not rdr.at_end():
        tag, hv = rdr.seg_header()
        if tag == "C":
            con_expr[int(hv[0])] = _parse_expr(rdr)
        elif tag == "O":
            obj_sense = int(hv[1]) if len(hv) > 1 else 0
            obj_expr = _parse_expr(rdr)
        elif tag == "r":
            for i in range(n_con):
                r_L[i], r_U[i] = rdr.bound()
        elif tag == "b":
            for i in range(n_var):
                x_L[i], x_U[i] = rdr.bound()
        elif tag == "k":
            for _ in range(int(hv[0])):
                rdr.int_line()
        elif tag == "J":
            i, cnt = int(hv[0]), int(hv[1])
            for _ in range(cnt):
                j, c = rdr.int_pair()
                J[i][j] = c
        elif tag == "G":
            cnt = int(hv[1])
            for _ in range(cnt):
                j, c = rdr.int_pair()
                Gv[j] = c
        elif tag == "x":
            for _ in range(int(hv[0])):
                j, v = rdr.int_pair()
                x0[j] = v
        elif tag == "d":
            # dual initial guess (AMPL passes the previous solve's duals)
            y0 = np.zeros(n_con)
            for _ in range(int(hv[0])):
                j, v = rdr.int_pair()
                y0[j] = v
        elif tag == "V":
            # defined variable: V i nlin k, then nlin (idx coef) lines + expr
            i, nlin = int(hv[0]), int(hv[1])
            lin = [rdr.int_pair() for _ in range(nlin)]
            defs[i] = (lin, _parse_expr(rdr))
        elif tag == "S":
            kind = int(hv[0])
            cnt = int(hv[1])
            name = hv[2] if len(hv) > 2 else ""
            target = _SUF_TARGETS[kind & 3]
            vals = {}
            real = bool(kind & 4)
            for _ in range(cnt):
                j, v = rdr.suf_entry(real)
                vals[j] = v
            suffixes[(target, name)] = vals
        elif tag == "F":
            raise NotImplementedError(
                ".nl segment 'F' (imported functions) not supported")
        elif tag == "L":
            raise NotImplementedError(
                ".nl segment 'L' (logical constraints) not supported")
        else:
            raise ValueError(f"unknown .nl segment: {tag!r}")

    if ("var", "sosno") in suffixes or ("var", "ref") in suffixes:
        raise NotImplementedError(
            "SOS declarations (sosno/ref suffixes) are not supported — the "
            "reference ipopt executable relaxes or rejects them likewise")

    sign = -1.0 if obj_sense == 1 else 1.0  # 1 = maximize

    g_lin_idx = [np.array(sorted(J[i].keys()), np.int32) for i in range(n_con)]
    g_lin_coef = [np.array([J[i][k] for k in sorted(J[i])]) for i in range(n_con)]
    o_lin_idx = np.array(sorted(Gv.keys()), np.int32)
    o_lin_coef = np.array([Gv[k] for k in sorted(Gv)])

    def f(x):
        cache = {}
        val = _eval_expr(obj_expr, x, defs, cache)
        if o_lin_idx.size:
            val = val + jnp.dot(jnp.asarray(o_lin_coef),
                                x[jnp.asarray(o_lin_idx)])
        return sign * val

    def g(x):
        cache = {}
        rows = []
        for i in range(n_con):
            v = _eval_expr(con_expr[i], x, defs, cache)
            if g_lin_idx[i].size:
                v = v + jnp.dot(jnp.asarray(g_lin_coef[i]),
                                x[jnp.asarray(g_lin_idx[i])])
            rows.append(v)
        return jnp.stack(rows) if rows else jnp.zeros((0,), x.dtype)

    # warm-start duals from suffixes (ampl_ipopt.cpp:77-83)
    zl = suffixes.get(("var", "ipopt_zL_in"))
    zu = suffixes.get(("var", "ipopt_zU_in"))
    z_L0 = z_U0 = None
    if zl:
        z_L0 = np.zeros(n_var)
        for j, v in zl.items():
            z_L0[j] = v
    if zu:
        z_U0 = np.zeros(n_var)
        for j, v in zu.items():
            z_U0[j] = v

    nlp = NLP(f=f, g=g if n_con else None, x0=x0,
              x_L=x_L, x_U=x_U,
              g_L=r_L if n_con else None, g_U=r_U if n_con else None,
              y0=y0, z_L0=z_L0, z_U0=z_U0,
              name=path)
    return AmplModel(nlp, suffixes, y0)


def read_nl(path: str) -> NLP:
    """Back-compat single-value reader."""
    return read_nl_model(path).nlp


def ascii_nl_to_binary(src: str, dst: str):
    """Transcode an ASCII ('g') .nl file to the binary ('b') format —
    token-level re-encoding used to exercise/verify the binary reader."""
    with open(src, "rb") as fh:
        data = fh.read()
    nl_pos = 0
    header_lines = []
    for _ in range(10):
        end = data.index(b"\n", nl_pos)
        header_lines.append(data[nl_pos:end].decode("ascii"))
        nl_pos = end + 1
    assert header_lines[0].startswith("g"), "source must be ASCII format"
    dims = header_lines[1].split()
    n_var, n_con = int(dims[0]), int(dims[1])

    rdr = _AsciiReader(data, nl_pos)
    out = bytearray()
    out += ("b" + header_lines[0][1:] + "\n").encode()
    for l in header_lines[1:]:
        out += (l + "\n").encode()

    def put_i(v):
        out.extend(struct.pack("<i", int(v)))

    def put_d(v):
        out.extend(struct.pack("<d", float(v)))

    def put_expr():
        kind, val = rdr.expr_node()
        out.append(ord(kind))
        if kind == "n":
            put_d(val)
            return
        if kind == "v":
            put_i(val)
            return
        put_i(val)
        op = val
        if op in _BINOPS:
            put_expr()
            put_expr()
        elif op in _UNOPS:
            put_expr()
        elif op in (_OP_SUMLIST, _OP_MINLIST, _OP_MAXLIST):
            cnt = rdr.int_line()
            put_i(cnt)
            for _ in range(cnt):
                put_expr()
        else:
            raise NotImplementedError(f"opcode {op}")

    def put_bound():
        tokens = rdr.lines[rdr.pos].split()
        rdr.pos += 1
        code = int(tokens[0])
        put_i(code)
        for t in tokens[1:1 + (2 if code == 0 else (0 if code == 3 else 1))]:
            put_d(t)

    while not rdr.at_end():
        tag, hv = rdr.seg_header()
        out.append(ord(tag))
        if tag == "C":
            put_i(hv[0])
            put_expr()
        elif tag == "O":
            put_i(hv[0])
            put_i(hv[1] if len(hv) > 1 else 0)
            put_expr()
        elif tag == "r":
            for _ in range(n_con):
                put_bound()
        elif tag == "b":
            for _ in range(n_var):
                put_bound()
        elif tag == "k":
            cnt = int(hv[0])
            put_i(cnt)
            for _ in range(cnt):
                put_i(rdr.int_line())
        elif tag in ("J", "G"):
            put_i(hv[0])
            cnt = int(hv[1])
            put_i(cnt)
            for _ in range(cnt):
                j, c = rdr.int_pair()
                put_i(j)
                put_d(c)
        elif tag in ("x", "d"):
            cnt = int(hv[0])
            put_i(cnt)
            for _ in range(cnt):
                j, v = rdr.int_pair()
                put_i(j)
                put_d(v)
        elif tag == "V":
            put_i(hv[0])
            put_i(hv[1])
            put_i(hv[2])
            for _ in range(int(hv[1])):
                j, c = rdr.int_pair()
                put_i(j)
                put_d(c)
            put_expr()
        elif tag == "S":
            put_i(hv[0])
            put_i(hv[1])
            out += (hv[2] + "\n").encode()
            real = bool(int(hv[0]) & 4)
            for _ in range(int(hv[1])):
                j, v = rdr.int_pair()
                put_i(j)
                (put_d if real else put_i)(v)
        else:
            raise NotImplementedError(f"segment {tag}")
    with open(dst, "wb") as fh:
        fh.write(bytes(out))


def write_sol(path: str, res, message: str = "", n_var: Optional[int] = None,
              extra_var_suffixes: Optional[Dict[str, Any]] = None):
    """Write AMPL's .sol format (what the reference's ampl_ipopt.cpp emits
    through ASL's write_sol), including the ipopt_zL_out/ipopt_zU_out bound
    multiplier suffixes (AmplTNLP::finalize_solution).

    ``extra_var_suffixes``: additional real variable suffixes (name ->
    (n_var,) array) — the sIPOPT sens_sol_state_1* outputs."""
    y = np.asarray(res.g_duals if hasattr(res, "g_duals") else res.y, float)
    x = np.asarray(res.x, float)
    z_L = np.asarray(res.z_L, float) if hasattr(res, "z_L") else None
    z_U = np.asarray(res.z_U, float) if hasattr(res, "z_U") else None
    with open(path, "w") as fh:
        fh.write((message or "ipopt_tpu") + "\n\n")
        fh.write("Options\n3\n0\n1\n0\n")
        fh.write(f"{len(y)}\n{len(y)}\n{len(x)}\n{len(x)}\n")
        for v in y:
            fh.write(f"{v:.17g}\n")
        for v in x:
            fh.write(f"{v:.17g}\n")
        fh.write(f"objno 0 {0 if int(res.status) == 0 else 200}\n")
        # suffix sections: kind 4|0 = real var suffix
        sections = [("ipopt_zL_out", z_L), ("ipopt_zU_out", z_U)]
        for name, vals in (extra_var_suffixes or {}).items():
            sections.append((name, np.asarray(vals, float)))
        for name, z in sections:
            if z is None:
                continue
            nz = [(i, v) for i, v in enumerate(z) if v != 0.0]
            fh.write(f"suffix 4 {len(nz)} {len(name) + 1} 0 0\n{name}\n")
            for i, v in nz:
                fh.write(f"{i} {v:.17g}\n")


def read_sol(path: str):
    """Read a .sol file back (duals, primals, status, suffixes) — used by the
    warm-start round trip."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while lines[i].strip() != "Options":
        i += 1
    n_opts = int(lines[i + 1])
    i = i + 2 + n_opts
    n_y_max, n_y, n_x_max, n_x = (int(lines[i]), int(lines[i + 1]),
                                  int(lines[i + 2]), int(lines[i + 3]))
    i += 4
    y = np.array([float(lines[i + k]) for k in range(n_y)])
    i += n_y
    x = np.array([float(lines[i + k]) for k in range(n_x)])
    i += n_x
    status = None
    suffixes: Dict[str, Dict[int, float]] = {}
    while i < len(lines):
        l = lines[i].strip()
        if l.startswith("objno"):
            status = int(l.split()[2])
            i += 1
        elif l.startswith("suffix"):
            parts = l.split()
            cnt = int(parts[2])
            name = lines[i + 1].strip()
            vals = {}
            for k in range(cnt):
                t = lines[i + 2 + k].split()
                vals[int(t[0])] = float(t[1])
            suffixes[name] = vals
            i += 2 + cnt
        else:
            i += 1
    return x, y, status, suffixes


def run_sens_from_suffixes(model: "AmplModel", opts: Options, res):
    """The sIPOPT AMPL protocol (contrib/sIPOPT/src/SensAmplTNLP /
    SensBuilder.cpp:88-140; examples/parametric_ampl):

    - parameters are VARIABLES pinned by equality rows marked with the
      ``sens_init_constr`` constraint suffix;
    - the variable suffixes ``sens_state_1`` (perturbation index) and
      ``sens_state_value_1`` (new value) define the perturbation;
    - the estimated perturbed solution is returned as the
      ``sens_sol_state_1`` (+ ``_z_L``/``_z_U``) variable suffixes.

    Returns the extra-suffix dict for write_sol, or None if the required
    suffixes are absent."""
    from ..problem import canonicalize
    from ..sens import perturbed_solution_rhs
    init_marks = model.suffixes.get(("con", "sens_init_constr"))
    st1 = model.suffixes.get(("var", "sens_state_1"))
    sv1 = model.suffixes.get(("var", "sens_state_value_1"))
    if not (init_marks and st1 and sv1):
        return None
    nlp = model.nlp
    cnlp = canonicalize(nlp, opts)
    s = cnlp.struct
    eq_pos_of_row = {int(r): p for p, r in enumerate(np.asarray(s.eq_idx))}
    x_sol = jnp.asarray(np.asarray(res.x), cnlp.x0.dtype)

    new_crhs = np.asarray(cnlp.c_rhs, float).copy()
    for row, mark in init_marks.items():
        if not mark or int(row) not in eq_pos_of_row:
            continue
        pos = eq_pos_of_row[int(row)]
        # the pinned variable = the dominant entry of the row gradient
        grad_row = jax.grad(
            lambda xx, r=int(row): (nlp.g(xx, nlp.params)
                                    if nlp.params is not None
                                    else nlp.g(xx))[r])(x_sol)
        var = int(jnp.argmax(jnp.abs(grad_row)))
        if var in sv1:
            # row reads  coeff * x_var - rhs = 0; move rhs so that the
            # pinned variable lands on sens_state_value_1
            coeff = float(grad_row[var])
            old_rhs = float(new_crhs[pos])
            old_val = float(np.asarray(res.x)[var])
            new_crhs[pos] = old_rhs + coeff * (float(sv1[var]) - old_val)

    # the reference solves on the SAVED factorization of the last barrier
    # problem (mu = final mu) — mu=0 can leave free-variable diagonals
    # exactly singular for the unpivoted factorization
    it_pert = perturbed_solution_rhs(
        cnlp, opts, res.iterate, jnp.asarray(new_crhs, cnlp.c_rhs.dtype),
        mu=float(res.mu),
        n_steps=opts.n_sens_steps, boundcheck=opts.sens_boundcheck,
        bound_eps=opts.sens_bound_eps)
    x_pert = np.asarray(cnlp.x_full(it_pert.x), float)
    zl = np.zeros(s.n_full)
    zu = np.zeros(s.n_full)
    zl[np.asarray(s.free_idx)] = np.asarray(it_pert.z_L, float)
    zu[np.asarray(s.free_idx)] = np.asarray(it_pert.z_U, float)
    return {"sens_sol_state_1": x_pert,
            "sens_sol_state_1_z_L": zl,
            "sens_sol_state_1_z_U": zu}


def compute_red_hessian_from_suffixes(model: "AmplModel", opts: Options,
                                      res):
    """compute_red_hessian (SensApplication.cpp:73, SensBuilder.cpp:137):
    the reduced Hessian over the variables carrying the ``red_hessian``
    suffix, ordered by the suffix value."""
    marks = model.suffixes.get(("var", "red_hessian"))
    if not marks:
        return None
    from ..problem import canonicalize
    from ..sens import reduced_hessian
    cnlp = canonicalize(model.nlp, opts)
    order = sorted((int(v), int(i)) for i, v in marks.items() if v)
    idx = [i for _, i in order]
    return np.asarray(reduced_hessian(cnlp, opts, res.iterate,
                                      np.asarray(idx, np.int32),
                                      mu=float(res.mu)))


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
            fld = Options.__dataclass_fields__.get(k)
            if fld is not None and fld.type in ("bool", bool):
                # Ipopt CLI convention: yes/no (also accept 0/1/true/false)
                overrides[k] = v.strip().lower() in ("yes", "true", "1")
                continue
            try:
                overrides[k] = float(v) if "." in v or "e" in v else int(v)
            except ValueError:
                overrides[k] = v
    model = read_nl_model(nl_path)
    nlp = model.nlp
    # scaling_factor suffixes (AmplSuffixHandler): objective scaling via the
    # obj suffix; constraint/variable factors feed user scaling
    sf_obj = model.suffixes.get(("obj", "scaling_factor"))
    if sf_obj and 0 in sf_obj:
        overrides.setdefault("nlp_scaling_method", "user-scaling")
        overrides.setdefault("obj_scaling_factor", float(sf_obj[0]))
    it0 = None
    if nlp.y0 is not None or nlp.z_L0 is not None:
        overrides.setdefault("warm_start_init_point", True)
    res = solve(nlp, print_level=overrides.pop("print_level", 5), **overrides)
    status = SolverReturn(int(res.status))
    msg = ("ipopt_tpu: Optimal Solution Found"
           if status in (SolverReturn.SUCCESS,
                         SolverReturn.STOP_AT_ACCEPTABLE_POINT)
           else f"ipopt_tpu: {status.name}")
    sol_path = nl_path[:-3] + ".sol" if nl_path.endswith(".nl") else nl_path + ".sol"
    extra = None
    opts_used = Options().replace(
        **{k: v for k, v in overrides.items()
           if k in Options.__dataclass_fields__})
    if opts_used.run_sens and status in (
            SolverReturn.SUCCESS, SolverReturn.STOP_AT_ACCEPTABLE_POINT):
        extra = run_sens_from_suffixes(model, opts_used, res)
    if opts_used.compute_red_hessian:
        rh = compute_red_hessian_from_suffixes(model, opts_used, res)
        if rh is not None:
            print("Reduced Hessian (red_hessian suffix order):")
            for row in rh:
                print("  " + " ".join(f"{v: .9e}" for v in row))
    write_sol(sol_path, res, msg, extra_var_suffixes=extra)
    print(msg)
    if status in (SolverReturn.SUCCESS, SolverReturn.STOP_AT_ACCEPTABLE_POINT):
        print("EXIT: Optimal Solution Found.")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
