"""pg jsonpath filter expressions (``$.items[*] ? (@.price > 10)``) for the
SQL/JSON query functions.

The reference engine has no SQL/JSON support; this extends the pg 17
surface in :meth:`ExprCompiler._compile_sql_json`. Filters are parsed at
COMPILE time (they are literal jsonpath strings) into a Python closure
that builds a pure-JVM predicate over one variant element — evaluation
rides Spark's variant machinery (``try_variant_get``), so missing members
and failed casts become NULL and drop out of the filter exactly like pg's
lax-mode "unknown" semantics. No UDFs.

Supported filter grammar (pg lax mode subset)::

    pred     := or
    or       := and ('||' and)*
    and      := unary ('&&' unary)*
    unary    := '!' '(' pred ')' | '(' pred ')' | cmp
    cmp      := operand ('=='|'!='|'<>'|'<'|'<='|'>'|'>=') operand
              | path 'starts' 'with' string
              | path 'like_regex' string
              | 'exists' '(' path ')'
    operand  := path | literal
    path     := '@' ('.' ident | '[' int ']')*
    literal  := number | "string" | true | false | null

Both operands being paths raises (the comparison type would be unknown);
pg's datetime()/ternary ``is unknown`` etc. raise guided errors.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F


class JsonPathError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    \s*(
        "(?:[^"\\]|\\.)*"        # double-quoted string
      | -?\d+(?:\.\d+)?          # number
      | @ | \$
      | == | != | <> | <= | >= | < | > | =
      | && | \|\|
      | [().!\[\]]
      | [A-Za-z_][A-Za-z_0-9]*
    )""", re.VERBOSE)


def _tokenize(s: str) -> List[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise JsonPathError(
                f"cannot tokenize jsonpath filter at: {s[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


# an operand is either a variant path relative to @ or a Python literal
_Path = Tuple[str, str]      # ("path", "$.a.b")
_Lit = Tuple[str, object]    # ("lit", 2.5)

Pred = Callable[[Column], Column]


class _FilterParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise JsonPathError("unexpected end of jsonpath filter")
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.take()
        if got != t:
            raise JsonPathError(
                f"expected {t!r} in jsonpath filter, got {got!r}")

    # --------------------------------------------------------- grammar

    def parse(self) -> Pred:
        p = self.parse_or()
        if self.peek() is not None:
            raise JsonPathError(
                f"trailing tokens in jsonpath filter: {self.toks[self.i:]}")
        return p

    def parse_or(self) -> Pred:
        left = self.parse_and()
        while self.peek() == "||":
            self.take()
            right = self.parse_and()
            left = (lambda a, b: lambda e: a(e) | b(e))(left, right)
        return left

    def parse_and(self) -> Pred:
        left = self.parse_unary()
        while self.peek() == "&&":
            self.take()
            right = self.parse_unary()
            left = (lambda a, b: lambda e: a(e) & b(e))(left, right)
        return left

    def parse_unary(self) -> Pred:
        t = self.peek()
        if t == "!":
            self.take()
            self.expect("(")
            inner = self.parse_or()
            self.expect(")")
            return lambda e: ~inner(e)
        if t == "(":
            self.take()
            inner = self.parse_or()
            self.expect(")")
            return inner
        if t == "exists":
            self.take()
            self.expect("(")
            path = self.parse_path()
            self.expect(")")
            return lambda e: _vget(e, path, "variant").isNotNull()
        return self.parse_cmp()

    def parse_cmp(self) -> Pred:
        left = self.parse_operand()
        op = self.take()
        if op == "starts":
            self.expect("with")
            lit = self.take()
            if left[0] != "path" or not lit.startswith('"'):
                raise JsonPathError(
                    "starts with requires a path and a string literal")
            prefix = _unquote(lit)
            path = left[1]
            return lambda e: _vget(e, path, "string").startswith(prefix)
        if op == "like_regex":
            lit = self.take()
            if left[0] != "path" or not lit.startswith('"'):
                raise JsonPathError(
                    "like_regex requires a path and a string literal")
            pat = _unquote(lit)
            path = left[1]
            return lambda e: _vget(e, path, "string").rlike(pat)
        if op in ("==", "="):
            cmp = "=="
        elif op in ("!=", "<>", "<", "<=", ">", ">="):
            cmp = op
        else:
            raise JsonPathError(
                f"unsupported jsonpath filter operator {op!r}")
        right = self.parse_operand()
        return _build_cmp(left, cmp, right)

    def parse_operand(self):
        t = self.peek()
        if t == "@":
            return ("path", self.parse_path())
        if t is None:
            raise JsonPathError("unexpected end of jsonpath filter")
        self.take()
        if t.startswith('"'):
            return ("lit", _unquote(t))
        if t in ("true", "false"):
            return ("lit", t == "true")
        if t == "null":
            return ("lit", None)
        if re.fullmatch(r"-?\d+(?:\.\d+)?", t):
            return ("lit", float(t) if "." in t else int(t))
        raise JsonPathError(f"unsupported jsonpath filter operand {t!r}")

    def parse_path(self) -> str:
        self.expect("@")
        parts = ["$"]
        while True:
            t = self.peek()
            if t == ".":
                self.take()
                name = self.take()
                if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", name):
                    raise JsonPathError(
                        f"unsupported jsonpath member accessor {name!r}")
                parts.append("." + name)
            elif t == "[":
                self.take()
                idx = self.take()
                if not re.fullmatch(r"\d+", idx):
                    raise JsonPathError(
                        f"unsupported jsonpath subscript {idx!r}")
                self.expect("]")
                parts.append(f"[{idx}]")
            else:
                break
        return "".join(parts)


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}
                  .get(m.group(1), m.group(1)), body)


def _vget(e: Column, path: str, typ: str) -> Column:
    return F.try_variant_get(e, path, typ)


def _build_cmp(left, cmp: str, right) -> Pred:
    if left[0] == "lit" and right[0] == "lit":
        raise JsonPathError(
            "jsonpath filter comparison needs at least one @ path")
    if left[0] == "path" and right[0] == "path":
        raise JsonPathError(
            "jsonpath filter comparing two @ paths is not supported "
            "(the comparison type would be unknown)")
    # orient as path <cmp> literal
    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
    if left[0] == "lit":
        left, right = right, left
        if cmp in flip:
            cmp = flip[cmp]
    path, value = left[1], right[1]

    if value is None:
        # pg jsonpath: @ == null is true iff the member exists and is
        # JSON null (a missing member is "unknown" -> dropped)
        def pred_null(e: Column) -> Column:
            v = _vget(e, path, "variant")
            isnull = F.to_json(v) == "null"
            return isnull if cmp == "==" else \
                F.when(v.isNotNull(), ~isnull)
        if cmp not in ("==", "!="):
            raise JsonPathError("null only supports == / != in filters")
        return pred_null

    if isinstance(value, bool):
        typ = "boolean"
        lit = F.lit(value)
    elif isinstance(value, (int, float)):
        typ = "double"
        lit = F.lit(float(value))
    else:
        typ = "string"
        lit = F.lit(value)

    ops = {"==": lambda a, b: a == b, "!=": lambda a, b: a != b,
           "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
           ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}
    fn = ops[cmp]
    return lambda e: fn(_vget(e, path, typ), lit)


def parse_filter(text: str) -> Pred:
    """Parse one jsonpath filter predicate body (the text inside
    ``? (...)``) into a Column-predicate closure over a variant element."""
    return _FilterParser(text).parse()


def split_filter_path(path: str) -> Optional[Tuple[str, str, str]]:
    """Split a jsonpath with a trailing filter into (base, filter_body,
    suffix). Returns None when the path has no ``?`` filter. The filter
    must be parenthesized; the suffix may only be dotted member accessors
    (``$.a[*] ? (@.b > 2).c``)."""
    # find the ? outside double quotes
    in_q = False
    qpos = -1
    i = 0
    while i < len(path):
        ch = path[i]
        if in_q:
            if ch == "\\":
                i += 1
            elif ch == '"':
                in_q = False
        elif ch == '"':
            in_q = True
        elif ch == "?":
            qpos = i
            break
        i += 1
    if qpos < 0:
        return None
    base = path[:qpos].strip()
    rest = path[qpos + 1:].strip()
    if not rest.startswith("("):
        raise JsonPathError("jsonpath filter must be parenthesized: ? (...)")
    # matching close paren (respecting quotes)
    depth, in_q, j = 0, False, 0
    end = -1
    while j < len(rest):
        ch = rest[j]
        if in_q:
            if ch == "\\":
                j += 1
            elif ch == '"':
                in_q = False
        elif ch == '"':
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                end = j
                break
        j += 1
    if end < 0:
        raise JsonPathError("unbalanced parentheses in jsonpath filter")
    body = rest[1:end]
    suffix = rest[end + 1:].strip()
    if suffix and not re.fullmatch(r"(\.[A-Za-z_][A-Za-z_0-9]*)+", suffix):
        raise JsonPathError(
            f"unsupported jsonpath accessor after filter: {suffix!r} "
            "(only dotted member access is supported)")
    return base, body, suffix
