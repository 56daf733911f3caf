"""``%eval:fun(args)%`` inline template expressions (SURVEY.md T14).

The reference parses these with a Lark LALR grammar
(``pyrml/grammar.lark``, splice at ``pyrml_api.py:232-313``) and calls the
registered Python function per row. Here a hand-written recursive-descent
parser (lark isn't installed, and the grammar is tiny) compiles the call to
a Spark Column via the function registry — still no per-row Python unless
the function itself is a registered Python UDF.

Grammar (mirrors grammar.lark):
    expr   := NAME '(' args? ')'
    args   := arg (',' arg)*
    arg    := STRING | NUMBER | 'True' | 'False' | 'None' | '*' | expr

String args may contain ``{COL}`` placeholders (substituted per row,
non-IRI mode — Funz.eval at pyrml_api.py:119-130); ``*`` passes the whole
row as a struct of all source columns.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

EVAL_RE = re.compile(r"%eval:(.+?)%", re.S)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<name>[A-Za-z_]\w*)
      | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<number>-?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
      | (?P<star>\*)
      | (?P<punct>[(),])
    )""",
    re.VERBOSE,
)


class EvalParseError(ValueError):
    pass


class _Lexer:
    def __init__(self, text: str):
        self.tokens: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            if text[pos].isspace():
                pos += 1
                continue
            m = _TOKEN.match(text, pos)
            if not m:
                raise EvalParseError(f"bad %eval% expression at: {text[pos:]!r}")
            self.tokens.append((m.lastgroup, m.group(m.lastgroup)))
            pos = m.end()
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t


# AST: ("call", name, [args]) | ("str", s) | ("num", v) | ("const", v) | ("row",)

def parse_eval(text: str):
    lx = _Lexer(text)
    ast = _call(lx)
    if lx.peek()[0] != "eof":
        raise EvalParseError(f"trailing tokens in %eval%: {text!r}")
    return ast


def _call(lx: _Lexer):
    kind, name = lx.next()
    if kind != "name":
        raise EvalParseError(f"expected function name, got {name!r}")
    k, v = lx.next()
    if v != "(":
        raise EvalParseError(f"expected '(' after {name}")
    args = []
    if lx.peek()[1] != ")":
        while True:
            args.append(_arg(lx))
            k, v = lx.next()
            if v == ")":
                break
            if v != ",":
                raise EvalParseError(f"expected ',' or ')', got {v!r}")
    else:
        lx.next()
    return ("call", name, args)


def _arg(lx: _Lexer):
    kind, v = lx.peek()
    if kind == "name":
        if v in ("True", "False"):
            lx.next()
            return ("const", v == "True")
        if v == "None":
            lx.next()
            return ("const", None)
        return _call(lx)
    if kind == "string":
        lx.next()
        body = v[1:-1]
        body = re.sub(r"\\(['\"\\])", r"\1", body)
        return ("str", body)
    if kind == "number":
        lx.next()
        return ("num", float(v) if re.search(r"[.eE]", v) else int(v))
    if kind == "star":
        lx.next()
        return ("row",)
    raise EvalParseError(f"unexpected token {v!r} in %eval%")
