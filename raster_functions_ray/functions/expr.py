"""RasterCalculator expression evaluator (SURVEY.md §2.5).

Re-expresses the template-level ``RasterCalculatorFunction`` expression
language used by e.g. ``functions/TerrainRuggednessIndex-Riley-Colormap.rft.xml``
(``SquareRoot(Abs((Square(Focal_Max(DEM,3,3)) - Square(Focal_Min(DEM,3,3)))))``)
and ``functions/Annual Direct Incident Radiation.rft.xml``
(``1.582*Cos(lat_rads)*Cos(slo_rads)-...``) as a small recursive-descent
parser producing a compiled closure over named NumPy rasters.

Focal functions consume a pre-padded array (halo stage) and shrink it, so
mixing focal and pointwise terms inside one expression works on padded
inputs: pointwise terms are evaluated on the padded array and trimmed at the
end.  ``padding_required`` reports the halo the expression needs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from . import focal as fc

_TOKEN = re.compile(r"\s*(?:(\d+\.\d*|\.\d+|\d+)|([A-Za-z_][A-Za-z0-9_]*)|(\*\*|[+\-*/(),]))")

_FUNCS_1 = {
    "abs": np.abs, "cos": np.cos, "sin": np.sin, "tan": np.tan,
    "acos": np.arccos, "asin": np.arcsin, "atan": np.arctan,
    "square": lambda v: v * v, "squareroot": np.sqrt, "sqrt": np.sqrt,
    "exp": np.exp, "ln": np.log, "log10": np.log10, "int": np.trunc,
    "float": lambda v: np.asarray(v, dtype=np.float64),
}
# focal funcs: (array, rows, cols) — evaluated on the padded plane, output
# shrinks by size//2 per side
_FOCAL = {"focal_max": fc.focal_max, "focal_min": fc.focal_min,
          "focal_mean": lambda a, s: fc.rank_filter(a, s, "mean"),
          "focal_median": lambda a, s: fc.rank_filter(a, s, "median")}


@dataclass
class _Node:
    kind: str          # num | var | call | bin | neg
    value: object = None
    args: tuple = ()


class ExprError(ValueError):
    pass


def _tokenize(s: str):
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ExprError(f"bad token at {s[pos:pos+10]!r}")
        num, name, op = m.groups()
        if num:
            out.append(("num", float(num)))
        elif name:
            out.append(("name", name))
        else:
            out.append(("op", op))
        pos = m.end()
    out.append(("end", None))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op):
        t = self.next()
        if t != ("op", op):
            raise ExprError(f"expected {op!r}, got {t}")

    def parse(self) -> _Node:
        n = self.expr()
        if self.peek()[0] != "end":
            raise ExprError(f"trailing tokens: {self.peek()}")
        return n

    def expr(self) -> _Node:  # + -
        n = self.term()
        while self.peek() in (("op", "+"), ("op", "-")):
            op = self.next()[1]
            n = _Node("bin", op, (n, self.term()))
        return n

    def term(self) -> _Node:  # * /
        n = self.factor()
        while self.peek() in (("op", "*"), ("op", "/")):
            op = self.next()[1]
            n = _Node("bin", op, (n, self.factor()))
        return n

    def factor(self) -> _Node:  # unary sign (binds looser than **, like Python)
        if self.peek() == ("op", "-"):
            self.next()
            return _Node("neg", None, (self.factor(),))
        if self.peek() == ("op", "+"):
            self.next()
            return self.factor()
        return self.power(self.atom())

    def power(self, base: _Node) -> _Node:  # right-assoc: a ** -b ** c
        if self.peek() == ("op", "**"):
            self.next()
            return _Node("bin", "**", (base, self.factor()))
        return base

    def atom(self) -> _Node:
        kind, val = self.next()
        if kind == "num":
            return _Node("num", val)
        if kind == "name":
            if self.peek() == ("op", "("):
                self.next()
                args = [self.expr()]
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.expr())
                self.expect(")")
                return _Node("call", val.lower(), tuple(args))
            return _Node("var", val)
        if (kind, val) == ("op", "("):
            n = self.expr()
            self.expect(")")
            return n
        raise ExprError(f"unexpected {kind} {val}")


class Expression:
    """Compiled raster expression: ``Expression(src).evaluate({name: arr})``.

    Arrays must share one shape; if the expression uses focal functions the
    arrays must be padded by ``padding_required`` and the result is the
    trimmed core.
    """

    def __init__(self, source: str):
        self.source = source
        self.ast = _Parser(_tokenize(source)).parse()
        self.padding_required = self._padding(self.ast)
        self.variables = sorted(self._vars(self.ast))

    def _padding(self, n: _Node) -> int:
        if n.kind == "call" and n.value in _FOCAL:
            size = int(n.args[1].value) if len(n.args) > 1 else 3
            # paddings COMPOUND along nesting: Focal(Focal(A,3),3) consumes
            # 1px per level (max() here under-reported and silently shrank
            # the output below the core)
            return size // 2 + max((self._padding(a) for a in n.args), default=0)
        return max((self._padding(a) for a in n.args), default=0)

    def _vars(self, n: _Node) -> set[str]:
        if n.kind == "var":
            return {n.value}
        out: set[str] = set()
        for a in n.args:
            out |= self._vars(a)
        return out

    def evaluate(self, rasters: dict[str, np.ndarray]):
        pad = self.padding_required

        def ev(n: _Node):
            # returns (array_or_scalar, shrink) — shrink = halo already consumed
            if n.kind == "num":
                return n.value, 0
            if n.kind == "var":
                if n.value not in rasters:
                    raise ExprError(f"unknown raster {n.value!r}")
                return np.asarray(rasters[n.value], dtype=np.float64), 0
            if n.kind == "neg":
                v, s = ev(n.args[0])
                return -v, s
            if n.kind == "bin":
                a, sa = ev(n.args[0])
                b, sb = ev(n.args[1])
                s = max(sa, sb)
                a = _shrink(a, s - sa)
                b = _shrink(b, s - sb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    if n.value == "+":
                        return a + b, s
                    if n.value == "-":
                        return a - b, s
                    if n.value == "*":
                        return a * b, s
                    if n.value == "/":
                        return a / b, s
                    return a**b, s
            if n.kind == "call":
                if n.value in _FOCAL:
                    v, s = ev(n.args[0])
                    size = int(n.args[1].value) if len(n.args) > 1 else 3
                    return _FOCAL[n.value](v, size), s + size // 2
                if n.value in _FUNCS_1:
                    v, s = ev(n.args[0])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        return _FUNCS_1[n.value](v), s
                raise ExprError(f"unknown function {n.value!r}")
            raise ExprError(f"bad node {n.kind}")

        out, s = ev(self.ast)
        return _shrink(out, pad - s)


def _shrink(v, by: int):
    if by <= 0 or np.isscalar(v) or np.asarray(v).ndim == 0:
        return v
    return v[..., by:-by, by:-by]


def terrain_ruggedness_expression() -> Expression:
    """The TRI template expression (Riley) from
    functions/TerrainRuggednessIndex-Riley-Colormap.rft.xml."""
    return Expression("SquareRoot(Abs(Square(Focal_Max(DEM,3)) - Square(Focal_Min(DEM,3))))")


def vector_field(u: np.ndarray, v: np.ndarray):
    """VectorFieldFunction (functions/VF.rft.xml): u/v components →
    (magnitude, direction-degrees meteorological)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    mag = np.sqrt(u * u + v * v)
    direction = (np.degrees(np.arctan2(u, v)) + 360.0) % 360.0
    return mag, direction
