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
  | (?P<string>'(?:[^']|'')*')
  | (?P<qname>"(?:[^"]|"")*")
  | (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z_0-9$]*)
  | (?P<op>->>|->|@>|<@|&&|<>|!~~\*|!~~|!~\*|!~|!=|!>|!<|<=|>=|<<|>>|~~\*|~~|~\*|\|\||::|[-+*/%^<>=~&|#(),.;:\[\]])
    """,
    re.VERBOSE | re.DOTALL,
)

# operators where the tokenizer value is used verbatim by the parser
OPS = {
    "->>", "->", "@>", "<@", "&&", "<>", "!~~*", "!~~", "!~*", "!~",
    "!=", "!>", "!<",
    "<=", ">=", "<<", ">>", "~~*", "~~", "~*", "||", "::", ":",
    "+", "-", "*", "/", "%", "^", "<", ">", "=", "~", "&", "|", "#",
    "(", ")", ",", ".", ";", "[", "]",
}


class TokenizeError(ValueError):
    pass


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
