"""Tokenizer for the pg-flavored dialect.

Same token surface as the reference tokenizer (reference:
src/framequery/parser/_parser.py:149-207,578-592): `--` comments stripped,
keywords matched case-insensitively, identifier case preserved, single-quoted
strings with '' escapes, double-quoted identifiers, pyformat params.
Implemented as a single compiled regex scanner rather than combinators.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List


@dataclass(frozen=True)
class Token:
    kind: str  # 'name' | 'qname' | 'string' | 'number' | 'op' | 'param'
    value: str
    pos: int


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*.*?\*/)
  | (?P<param>%\(\w+\)s)
  | (?P<pgparam>\$\d+)
  | (?P<ustring>[uU]&'(?:[^'\\]|''|\\.)*')
  | (?P<uident>[uU]&"(?:[^"]|"")*")
  | (?P<estring>[eE]'(?:[^'\\]|''|\\.)*')
  | (?P<dollarstring>\$(?P<dtag>(?:[A-Za-z_][A-Za-z_0-9]*)?)\$.*?\$(?P=dtag)\$)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qname>"(?:[^"]|"")*")
  | (?P<number>0[xX][0-9A-Fa-f](?:_?[0-9A-Fa-f])*
              |0[bB][01](?:_?[01])*
              |0[oO][0-7](?:_?[0-7])*
              |(?:\d(?:_?\d)*\.(?:\d(?:_?\d)*)?|\.\d(?:_?\d)*|\d(?:_?\d)*)
               (?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z_0-9$]*)
  | (?P<op>\#>>|\#>|\#-|->>|-\|-|->|@@|@>|<->|<\#>|<=>|<@|&&|<>|!~~\*|!~~|!~\*|!~|!=|!>|!<|<<%|%>>|<%|%>|<=|>=|<<|>>|~~\*|~~|~\*|\^@|\|\|/|\|/|\|\||::|@\?|\?\||\?&|\?|[-+*/%^<>=~&|#(),.;:\[\]@])
    """,
    re.VERBOSE | re.DOTALL,
)

# operators where the tokenizer value is used verbatim by the parser
OPS = {
    "#>>", "#>", "#-", "->>", "-|-", "->", "@@", "@>", "<@", "&&", "<>",
    "?", "?|", "?&", "@?", "!~~*", "!~~", "!~*", "!~",
    "!=", "!>", "!<", "<<%", "%>>", "<%", "%>", "<->", "<#>", "<=>",
    "<=", ">=", "<<", ">>", "~~*", "~~", "~*", "||", "::", ":",
    "+", "-", "*", "/", "%", "^", "<", ">", "=", "~", "&", "|", "#",
    "(", ")", ",", ".", ";", "[", "]",
}


class TokenizeError(ValueError):
    pass


_E_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
              "\\": "\\", "'": "'", '"': '"'}

_E_ESCAPE_RE = re.compile(
    r"\\x[0-9A-Fa-f]{1,2}|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}"
    r"|\\[0-7]{1,3}|\\.|''")


def _unescape_e(body: str) -> str:
    """Decode the body of a pg E'...' string (backslash escapes + '')."""
    def sub(m: "re.Match[str]") -> str:
        s = m.group()
        if s == "''":
            return "'"
        c = s[1]
        if c in ("x",):
            return chr(int(s[2:], 16))
        if c in ("u", "U"):
            return chr(int(s[2:], 16))
        if c.isdigit():
            return chr(int(s[1:], 8))
        return _E_ESCAPES.get(c, c)
    return _E_ESCAPE_RE.sub(sub, body)


def _quote(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


_UESCAPE_RE = re.compile(r"\s*UESCAPE\s*'([^'])'", re.IGNORECASE)


def _swap_uescape(body: str, esc: str) -> str:
    """Rewrite a U&'...' body with a custom UESCAPE character to the
    default-backslash form the unistr() decoder understands: `esc esc`
    is a literal escape char, `esc` starts an escape, and any literal
    backslash must itself be escaped for the decoder."""
    out, i, n = [], 0, len(body)
    while i < n:
        ch = body[i]
        if ch == esc:
            if body[i + 1:i + 2] == esc:
                out.append(esc)
                i += 2
            else:
                out.append("\\")
                i += 1
        elif ch == "\\":
            out.append("\\\\")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _norm_number(text: str) -> str:
    """pg 16 literal forms -> canonical decimal text (underscores, 0x/0b/0o)."""
    text = text.replace("_", "")
    if len(text) > 1 and text[0] == "0" and text[1] in "xXbBoO":
        base = {"x": 16, "b": 2, "o": 8}[text[1].lower()]
        return str(int(text[2:], base))
    return text


def tokenize(sql: str) -> List[Token]:
    """Tokenize *sql*; raises TokenizeError on unrecognized input."""
    tokens: List[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise TokenizeError(
                f"cannot tokenize at offset {pos}: {sql[pos:pos + 20]!r}"
            )
        kind = m.lastgroup
        text = m.group()
        if kind == "estring":
            # E'...' -> equivalent plain string token
            kind, text = "string", _quote(_unescape_e(text[2:-1]))
        elif kind == "ustring":
            # U&'...' -> plain string via the unistr() decoder (\XXXX,
            # \+XXXXXX, \\, surrogate pairs). An optional trailing
            # UESCAPE 'x' clause swaps the escape character (r12):
            # consumed here because the escape char changes the STRING's
            # meaning, not the grammar around it. Deferred import: the
            # decoder lives with the unistr() compile path and
            # parser<->compiler import order must stay lazy here.
            from ..compiler.expressions import _decode_unistr

            body = text[3:-1].replace("''", "'")
            um = _UESCAPE_RE.match(sql, m.end())
            if um is not None:
                esc = um.group(1)
                if esc in "0123456789abcdefABCDEF+\"" or esc.isspace():
                    raise TokenizeError(
                        f"invalid Unicode escape character {esc!r} at "
                        f"offset {pos} (UESCAPE must not be a hex digit, "
                        "plus sign, quote, or whitespace)")
                if esc != "\\":
                    body = _swap_uescape(body, esc)
                m = um  # consume the clause: pos advances past it below
            try:
                decoded = _decode_unistr(body)
            except Exception as exc:
                raise TokenizeError(f"invalid U& string at offset {pos}: "
                                    f"{exc}")
            kind, text = "string", _quote(decoded)
        elif kind == "uident":
            # U&"..." unicode-escaped identifier (r12) — same decoder and
            # UESCAPE handling as U&'...', emitted as a quoted name
            from ..compiler.expressions import _decode_unistr

            body = text[3:-1].replace('""', '"')
            um = _UESCAPE_RE.match(sql, m.end())
            if um is not None:
                esc = um.group(1)
                if esc in "0123456789abcdefABCDEF+\"" or esc.isspace():
                    raise TokenizeError(
                        f"invalid Unicode escape character {esc!r} at "
                        f"offset {pos} (UESCAPE must not be a hex digit, "
                        "plus sign, quote, or whitespace)")
                if esc != "\\":
                    body = _swap_uescape(body, esc)
                m = um
            try:
                decoded = _decode_unistr(body)
            except Exception as exc:
                raise TokenizeError(
                    f"invalid U& identifier at offset {pos}: {exc}")
            kind, text = "qname", '"' + decoded.replace('"', '""') + '"'
        elif kind == "dollarstring":
            tag_len = text.index("$", 1) + 1
            kind, text = "string", _quote(text[tag_len:-tag_len])
        elif kind == "number":
            text = _norm_number(text)
        if kind not in ("ws", "comment"):
            tokens.append(Token(kind, text, pos))
        pos = m.end()
    return tokens


def unquote_string(tok: str) -> str:
    """'it''s' -> it's"""
    return tok[1:-1].replace("''", "'")


def unquote_name(tok: str) -> str:
    '''"a ""b""" -> a "b"'''
    return tok[1:-1].replace('""', '"')
