"""Minimal ES5 interpreter for the ``script`` processor.

Reference: ``libbeat/processors/script/javascript/javascript.go:195``
runs user JavaScript through the goja VM with the beat event bridged
in as ``beatevent_v0.go``'s Get/Put/Rename/Delete/Cancel/Tag/AppendTo
API; ``session.go:204`` (runProcessFunc) defines the exception
contract (tag ``tag_on_exception``, append ``error.message``, pass the
event through) and ``config.go`` the config surface (one of
``source``/``file``/``files``, ``params`` via ``register()``, a
compile-time ``test()`` hook).

This is an ORIGINAL tree-walking interpreter for the ES5 subset that
beats processor scripts use in practice (plus the handful of ES6
string/array methods that leak into real configs: ``startsWith``,
``includes``, ``find`` …). Design constraints, in order:

* **Deterministic.** ``Date``, ``Math.random`` and timers raise — a
  batch engine re-runs tasks, so nondeterminism would corrupt
  exactly-once outputs. Everything else is a pure function of the
  event.
* **Bounded.** Every AST-node evaluation ticks an op counter;
  exceeding ``max_ops`` raises the reference's literal
  ``"javascript processor execution timeout"`` (session.go:41 uses a
  wall-clock interrupt; per-event wall clocks are meaningless across
  executor speeds, so the budget is ops).
* **Loud.** Unsupported syntax fails at COMPILE time with
  ``JSSyntaxError`` — never a silent wrong answer at row time.

Scale shape: the compiled AST lives driver-side for validation only;
workers receive the SOURCE string and compile once per process
(``_session_cache``), then interpret per event inside an Arrow batch.
This is the sanctioned slow path — the reference documents the same
("this processor is experimental", per-event VM) — and exists so a
user's filebeat.yml script carries over verbatim.
"""

from __future__ import annotations

import json as _json
import math
import re as _re
import urllib.parse as _url
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple

__all__ = [
    "JSError", "JSSyntaxError", "JSThrow", "JSTimeout",
    "UNDEFINED", "Event", "Script", "compile_script",
]


class JSError(Exception):
    """Base for interpreter errors."""


class JSSyntaxError(JSError):
    """Unsupported or malformed source (compile time)."""


class JSTimeout(JSError):
    """Op budget exceeded (the reference's VM interrupt)."""


class JSThrow(JSError):
    """A JS-level ``throw`` (or runtime TypeError); carries the value."""

    def __init__(self, value: Any):
        self.value = value
        super().__init__(js_str(value))


class _Undefined:
    _inst: Optional["_Undefined"] = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


# =========================================================== tokenizer

_KEYWORDS = {
    "var", "let", "const", "function", "if", "else", "for", "while",
    "do", "return", "break", "continue", "new", "delete", "typeof",
    "instanceof", "in", "null", "true", "false", "undefined", "this",
    "throw", "try", "catch", "finally", "switch", "case", "default",
    "void",
}

# longest-first so '===' wins over '=='
_PUNCT = sorted([
    "{", "}", "(", ")", "[", "]", ";", ",", "?", ":", ".",
    "===", "!==", "==", "!=", "<=", ">=", "<", ">",
    "&&", "||", "!", "~",
    "++", "--", "+=", "-=", "*=", "/=", "%=",
    "<<=", ">>=", ">>>=", "&=", "|=", "^=",
    "<<", ">>>", ">>", "&", "|", "^",
    "+", "-", "*", "/", "%", "=",
], key=len, reverse=True)

_NUM_RE = _re.compile(
    r"0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
_IDENT_RE = _re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_WS_RE = _re.compile(r"(?:\s+|//[^\n]*|/\*.*?\*/)+", _re.S)

_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                "v": "\v", "0": "\0", "'": "'", '"': '"', "\\": "\\",
                "/": "/", "\n": ""}


def _scan_string(src: str, i: int) -> Tuple[str, int]:
    quote = src[i]
    i += 1
    out: List[str] = []
    while i < len(src):
        ch = src[i]
        if ch == quote:
            return "".join(out), i + 1
        if ch == "\\":
            i += 1
            if i >= len(src):
                break
            e = src[i]
            if e == "u":
                out.append(chr(int(src[i + 1:i + 5], 16)))
                i += 5
                continue
            if e == "x":
                out.append(chr(int(src[i + 1:i + 3], 16)))
                i += 3
                continue
            out.append(_STR_ESCAPES.get(e, e))
            i += 1
            continue
        if ch == "\n":
            raise JSSyntaxError(f"unterminated string at {i}")
        out.append(ch)
        i += 1
    raise JSSyntaxError("unterminated string")


def _scan_regex(src: str, i: int) -> Tuple[str, str, int]:
    # called with src[i] == '/'
    i += 1
    pat: List[str] = []
    in_class = False
    while i < len(src):
        ch = src[i]
        if ch == "\\":
            pat.append(src[i:i + 2])
            i += 2
            continue
        if ch == "[":
            in_class = True
        elif ch == "]":
            in_class = False
        elif ch == "/" and not in_class:
            i += 1
            m = _IDENT_RE.match(src, i)
            flags = m.group(0) if m else ""
            return "".join(pat), flags, i + len(flags)
        elif ch == "\n":
            break
        pat.append(ch)
        i += 1
    raise JSSyntaxError("unterminated regex literal")


def tokenize(src: str) -> List[Tuple[str, Any, int]]:
    toks: List[Tuple[str, Any, int]] = []
    i, n = 0, len(src)
    # a '/' is a regex when the previous token can't END an expression
    regex_ok = True
    while i < n:
        m = _WS_RE.match(src, i)
        if m:
            i = m.end()
            if i >= n:
                break
        ch = src[i]
        if ch in "'\"":
            s, i = _scan_string(src, i)
            toks.append(("str", s, i))
            regex_ok = False
            continue
        if ch == "/" and regex_ok:
            pat, flags, i = _scan_regex(src, i)
            toks.append(("regex", (pat, flags), i))
            regex_ok = False
            continue
        m = _NUM_RE.match(src, i)
        if m and (ch.isdigit() or (ch == "." and m.group(0) != ".")):
            text = m.group(0)
            if text.lower().startswith("0x"):
                val: Any = int(text, 16)
            elif "." in text or "e" in text or "E" in text:
                val = float(text)
            else:
                val = int(text)
            toks.append(("num", val, m.end()))
            i = m.end()
            regex_ok = False
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            name = m.group(0)
            kind = "keyword" if name in _KEYWORDS else "ident"
            toks.append((kind, name, m.end()))
            i = m.end()
            # `typeof /x/`, `return /x/`, `case /x/` … keep regex legal
            # after keywords that can't end an expression
            regex_ok = (kind == "keyword" and name not in
                        ("null", "true", "false", "undefined", "this"))
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p, i + len(p)))
                i += len(p)
                regex_ok = p not in (")", "]", "++", "--")
                break
        else:
            raise JSSyntaxError(f"unexpected character {ch!r} at {i}")
    toks.append(("eof", None, n))
    return toks


# ============================================================== parser
#
# AST nodes are plain tuples (picklable, cheap):
#   ('num', v) ('str', v) ('regex', pat, flags) ('ident', name)
#   ('null',) ('undef',) ('bool', v) ('this',)
#   ('array', [items]) ('object', [(key, val)])
#   ('func', name, [params], [body])
#   ('bin', op, l, r) ('logic', op, l, r) ('cond', c, t, f)
#   ('assign', op, target, value) ('unary', op, x)
#   ('update', op, target, prefix) ('member', obj, prop, computed)
#   ('call', callee, [args]) ('new', callee, [args]) ('seq', [exprs])
# statements:
#   ('var', [(name, init|None)]) ('expr', e) ('block', [s])
#   ('if', c, t, e|None) ('while', c, b) ('dowhile', b, c)
#   ('for', init|None, test|None, upd|None, body)
#   ('forin', name, obj, body) ('return', e|None) ('break',)
#   ('continue',) ('throw', e) ('funcdecl', func)
#   ('try', block, param|None, catch|None, finally|None)
#   ('switch', disc, [(test|None, [stmts])]) ('empty',)

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
               "<<=", ">>=", ">>>="}

_BIN_PREC = {
    "|": 3, "^": 4, "&": 5,
    "==": 6, "!=": 6, "===": 6, "!==": 6,
    "<": 7, ">": 7, "<=": 7, ">=": 7, "instanceof": 7, "in": 7,
    "<<": 8, ">>": 8, ">>>": 8,
    "+": 9, "-": 9, "*": 10, "/": 10, "%": 10,
}


class _Parser:
    def __init__(self, toks: List[Tuple[str, Any, int]]):
        self.toks = toks
        self.i = 0

    # ---- token helpers
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, val: Any = None) -> bool:
        t = self.peek()
        return t[0] == kind and (val is None or t[1] == val)

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: Any = None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise JSSyntaxError(
                f"expected {val or kind}, got {t[1]!r} at offset {t[2]}")
        return t

    def eat(self, kind: str, val: Any = None) -> bool:
        if self.at(kind, val):
            self.next()
            return True
        return False

    # ---- program
    def parse_program(self) -> List[tuple]:
        out = []
        while not self.at("eof"):
            out.append(self.statement())
        return out

    # ---- statements
    def statement(self) -> tuple:
        t = self.peek()
        if t[0] == "punct":
            if t[1] == "{":
                return self.block()
            if t[1] == ";":
                self.next()
                return ("empty",)
        if t[0] == "keyword":
            kw = t[1]
            if kw in ("var", "let", "const"):
                s = self.var_stmt()
                self.semicolon()
                return s
            if kw == "function":
                return ("funcdecl", self.function())
            if kw == "if":
                return self.if_stmt()
            if kw == "for":
                return self.for_stmt()
            if kw == "while":
                self.next()
                self.expect("punct", "(")
                c = self.expression()
                self.expect("punct", ")")
                return ("while", c, self.statement())
            if kw == "do":
                self.next()
                b = self.statement()
                self.expect("keyword", "while")
                self.expect("punct", "(")
                c = self.expression()
                self.expect("punct", ")")
                self.semicolon()
                return ("dowhile", b, c)
            if kw == "return":
                self.next()
                e = None
                if not (self.at("punct", ";") or self.at("punct", "}")
                        or self.at("eof")):
                    e = self.expression()
                self.semicolon()
                return ("return", e)
            if kw == "break":
                self.next()
                self.semicolon()
                return ("break",)
            if kw == "continue":
                self.next()
                self.semicolon()
                return ("continue",)
            if kw == "throw":
                self.next()
                e = self.expression()
                self.semicolon()
                return ("throw", e)
            if kw == "try":
                return self.try_stmt()
            if kw == "switch":
                return self.switch_stmt()
        e = self.expression()
        self.semicolon()
        return ("expr", e)

    def semicolon(self):
        # automatic semicolon insertion, the forgiving flavor: accept
        # and move on at `}` / eof; require `;` only between statements
        if self.eat("punct", ";"):
            return
        if self.at("punct", "}") or self.at("eof"):
            return
        # ASI across newlines: tokens carry offsets, not lines — accept
        # (real-world beats scripts rely on ASI constantly)
        return

    def block(self) -> tuple:
        self.expect("punct", "{")
        out = []
        while not self.at("punct", "}"):
            if self.at("eof"):
                raise JSSyntaxError("unterminated block")
            out.append(self.statement())
        self.next()
        return ("block", out)

    def var_stmt(self) -> tuple:
        self.next()  # var/let/const — all function-scoped here
        decls = []
        while True:
            name = self.expect("ident")[1]
            init = None
            if self.eat("punct", "="):
                init = self.assignment()
            decls.append((name, init))
            if not self.eat("punct", ","):
                break
        return ("var", decls)

    def function(self) -> tuple:
        self.expect("keyword", "function")
        name = self.next()[1] if self.at("ident") else None
        self.expect("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.expect("ident")[1])
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        body = self.block()[1]
        return ("func", name, params, body)

    def if_stmt(self) -> tuple:
        self.next()
        self.expect("punct", "(")
        c = self.expression()
        self.expect("punct", ")")
        t = self.statement()
        e = self.statement() if self.eat("keyword", "else") else None
        return ("if", c, t, e)

    def for_stmt(self) -> tuple:
        self.next()
        self.expect("punct", "(")
        init = None
        if not self.at("punct", ";"):
            if self.at("keyword", "var") or self.at("keyword", "let") \
                    or self.at("keyword", "const"):
                init = self.var_stmt()
                if (len(init[1]) == 1 and init[1][0][1] is None
                        and self.at("keyword", "in")):
                    self.next()
                    obj = self.expression()
                    self.expect("punct", ")")
                    return ("forin", init[1][0][0], obj, self.statement())
            else:
                e = self.expression()
                if self.at("keyword", "in") and e[0] == "ident":
                    self.next()
                    obj = self.expression()
                    self.expect("punct", ")")
                    return ("forin", e[1], obj, self.statement())
                init = ("expr", e)
        self.expect("punct", ";")
        test = None if self.at("punct", ";") else self.expression()
        self.expect("punct", ";")
        upd = None if self.at("punct", ")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, test, upd, self.statement())

    def try_stmt(self) -> tuple:
        self.next()
        blk = self.block()
        param = catch = fin = None
        if self.eat("keyword", "catch"):
            self.expect("punct", "(")
            param = self.expect("ident")[1]
            self.expect("punct", ")")
            catch = self.block()
        if self.eat("keyword", "finally"):
            fin = self.block()
        if catch is None and fin is None:
            raise JSSyntaxError("try without catch or finally")
        return ("try", blk, param, catch, fin)

    def switch_stmt(self) -> tuple:
        self.next()
        self.expect("punct", "(")
        disc = self.expression()
        self.expect("punct", ")")
        self.expect("punct", "{")
        cases: List[Tuple[Optional[tuple], List[tuple]]] = []
        while not self.at("punct", "}"):
            if self.eat("keyword", "case"):
                test = self.expression()
                self.expect("punct", ":")
            else:
                self.expect("keyword", "default")
                self.expect("punct", ":")
                test = None
            body: List[tuple] = []
            while not (self.at("keyword", "case")
                       or self.at("keyword", "default")
                       or self.at("punct", "}")):
                body.append(self.statement())
            cases.append((test, body))
        self.next()
        return ("switch", disc, cases)

    # ---- expressions
    def expression(self) -> tuple:
        e = self.assignment()
        if self.at("punct", ","):
            exprs = [e]
            while self.eat("punct", ","):
                exprs.append(self.assignment())
            return ("seq", exprs)
        return e

    def assignment(self) -> tuple:
        e = self.conditional()
        t = self.peek()
        if t[0] == "punct" and t[1] in _ASSIGN_OPS:
            if e[0] not in ("ident", "member"):
                raise JSSyntaxError("invalid assignment target")
            self.next()
            return ("assign", t[1], e, self.assignment())
        return e

    def conditional(self) -> tuple:
        c = self.binary(0)
        if self.eat("punct", "?"):
            t = self.assignment()
            self.expect("punct", ":")
            return ("cond", c, t, self.assignment())
        return c

    def binary(self, min_prec: int) -> tuple:
        # || and && below bitwise, with short-circuit nodes
        left = self.binary_tier(1) if min_prec == 0 else None
        if left is not None:
            return left
        raise AssertionError  # pragma: no cover

    def binary_tier(self, prec: int) -> tuple:
        if prec == 1:  # ||
            l = self.binary_tier(2)
            while self.at("punct", "||"):
                self.next()
                l = ("logic", "||", l, self.binary_tier(2))
            return l
        if prec == 2:  # &&
            l = self.binary_tier(3)
            while self.at("punct", "&&"):
                self.next()
                l = ("logic", "&&", l, self.binary_tier(3))
            return l
        return self.binary_ops(3)

    def binary_ops(self, min_prec: int) -> tuple:
        l = self.unary()
        while True:
            t = self.peek()
            op = t[1]
            if t[0] == "punct" and op in _BIN_PREC:
                prec = _BIN_PREC[op]
            elif t[0] == "keyword" and op in ("instanceof", "in"):
                prec = _BIN_PREC[op]
            else:
                return l
            if prec < min_prec:
                return l
            self.next()
            r = self.binary_rhs(prec + 1)
            l = ("bin", op, l, r)

    def binary_rhs(self, min_prec: int) -> tuple:
        r = self.unary()
        while True:
            t = self.peek()
            op = t[1]
            if t[0] == "punct" and op in _BIN_PREC:
                prec = _BIN_PREC[op]
            elif t[0] == "keyword" and op in ("instanceof", "in"):
                prec = _BIN_PREC[op]
            else:
                return r
            if prec < min_prec:
                return r
            self.next()
            r = ("bin", op, r, self.binary_rhs(prec + 1))

    def unary(self) -> tuple:
        t = self.peek()
        if t[0] == "punct" and t[1] in ("!", "~", "+", "-"):
            self.next()
            return ("unary", t[1], self.unary())
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.next()
            target = self.unary()
            if target[0] not in ("ident", "member"):
                raise JSSyntaxError("invalid update target")
            return ("update", t[1], target, True)
        if t[0] == "keyword" and t[1] in ("typeof", "void", "delete"):
            self.next()
            return ("unary", t[1], self.unary())
        return self.postfix()

    def postfix(self) -> tuple:
        e = self.call_member()
        t = self.peek()
        if t[0] == "punct" and t[1] in ("++", "--"):
            if e[0] in ("ident", "member"):
                self.next()
                return ("update", t[1], e, False)
        return e

    def call_member(self) -> tuple:
        if self.at("keyword", "new"):
            self.next()
            callee = self.member_only(self.primary())
            args = self.arguments() if self.at("punct", "(") else []
            e: tuple = ("new", callee, args)
        else:
            e = self.primary()
        while True:
            if self.eat("punct", "."):
                name = self.next()
                if name[0] not in ("ident", "keyword"):
                    raise JSSyntaxError(f"bad property {name[1]!r}")
                e = ("member", e, ("str", name[1]), False)
            elif self.at("punct", "["):
                self.next()
                prop = self.expression()
                self.expect("punct", "]")
                e = ("member", e, prop, True)
            elif self.at("punct", "("):
                e = ("call", e, self.arguments())
            else:
                return e

    def member_only(self, e: tuple) -> tuple:
        while True:
            if self.eat("punct", "."):
                name = self.next()
                e = ("member", e, ("str", name[1]), False)
            elif self.at("punct", "["):
                self.next()
                prop = self.expression()
                self.expect("punct", "]")
                e = ("member", e, prop, True)
            else:
                return e

    def arguments(self) -> List[tuple]:
        self.expect("punct", "(")
        args = []
        while not self.at("punct", ")"):
            args.append(self.assignment())
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return args

    def primary(self) -> tuple:
        t = self.next()
        kind, val = t[0], t[1]
        if kind == "num":
            return ("num", val)
        if kind == "str":
            return ("str", val)
        if kind == "regex":
            return ("regex", val[0], val[1])
        if kind == "ident":
            return ("ident", val)
        if kind == "keyword":
            if val == "null":
                return ("null",)
            if val == "undefined":
                return ("undef",)
            if val in ("true", "false"):
                return ("bool", val == "true")
            if val == "this":
                return ("this",)
            if val == "function":
                self.i -= 1
                return self.function()
            raise JSSyntaxError(f"unexpected keyword {val!r}")
        if kind == "punct":
            if val == "(":
                e = self.expression()
                self.expect("punct", ")")
                return e
            if val == "[":
                items = []
                while not self.at("punct", "]"):
                    items.append(self.assignment())
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", "]")
                return ("array", items)
            if val == "{":
                pairs = []
                while not self.at("punct", "}"):
                    k = self.next()
                    if k[0] in ("ident", "str", "keyword"):
                        key = k[1]
                    elif k[0] == "num":
                        key = js_num_str(k[1])
                    else:
                        raise JSSyntaxError(f"bad object key {k[1]!r}")
                    self.expect("punct", ":")
                    pairs.append((key, self.assignment()))
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", "}")
                return ("object", pairs)
        raise JSSyntaxError(f"unexpected token {val!r} at offset {t[2]}")


def parse(src: str) -> List[tuple]:
    return _Parser(tokenize(src)).parse_program()


# =========================================================== semantics

def truthy(v: Any) -> bool:
    if v is UNDEFINED or v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return v != ""
    return True  # objects/arrays/functions: always truthy, even empty


def to_number(v: Any) -> float:
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if v is None:
        return 0
    if v is UNDEFINED:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0
        try:
            if s.lower().startswith(("0x", "-0x", "+0x")):
                return int(s, 16)
            f = float(s)
            return int(f) if f.is_integer() and "e" not in s.lower() \
                and "." not in s else f
        except ValueError:
            return math.nan
    return math.nan


def to_int32(v: Any) -> int:
    n = to_number(v)
    if isinstance(n, float):
        if math.isnan(n) or math.isinf(n):
            return 0
        n = int(n)
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def js_num_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v.is_integer() and abs(v) < 1e21:
        return str(int(v))
    return repr(v)


def js_str(v: Any) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join(
            "" if x is None or x is UNDEFINED else js_str(x) for x in v)
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    if isinstance(v, (JSFunction, Native)):
        return f"function {getattr(v, 'name', '') or ''}() {{ ... }}"
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def strict_eq(a: Any, b: Any) -> bool:
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) and math.isnan(a):
            return False
        if isinstance(b, float) and math.isnan(b):
            return False
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b  # objects: identity


def loose_eq(a: Any, b: Any) -> bool:
    null_a = a is None or a is UNDEFINED
    null_b = b is None or b is UNDEFINED
    if null_a or null_b:
        return null_a and null_b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (bool, int, float)) and isinstance(b, (bool, int, float)):
        return to_number(a) == to_number(b) and not (
            isinstance(to_number(a), float) and math.isnan(to_number(a)))
    if isinstance(a, str) and isinstance(b, (bool, int, float)):
        return loose_eq(to_number(a), to_number(b))
    if isinstance(b, str) and isinstance(a, (bool, int, float)):
        return loose_eq(to_number(a), to_number(b))
    return a is b


def js_typeof(v: Any) -> str:
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (JSFunction, Native)):
        return "function"
    return "object"  # null, dict, list, regex, Event


# ======================================================== value model

class JSFunction:
    __slots__ = ("name", "params", "body", "scope")

    def __init__(self, name, params, body, scope):
        self.name = name
        self.params = params
        self.body = body
        self.scope = scope


class Native:
    """A python-implemented callable; fn(interp, this, args) -> value.
    ``statics`` holds constructor-attached helpers (Array.isArray…)."""
    __slots__ = ("name", "fn", "ctor", "statics")

    def __init__(self, name: str, fn, ctor: bool = False,
                 statics: Optional[Dict[str, Any]] = None):
        self.name = name
        self.fn = fn
        self.ctor = ctor
        self.statics = statics


class JSMatchArray(list):
    """regex exec()/match() result: a list with .index and .input."""
    __slots__ = ("index", "input")


class JSRegExp:
    __slots__ = ("source", "flags", "rx", "global_", "lastIndex")

    def __init__(self, source: str, flags: str = ""):
        self.source = source
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= _re.I
        if "m" in flags:
            py_flags |= _re.M
        if "s" in flags:
            py_flags |= _re.S
        self.global_ = "g" in flags
        self.lastIndex = 0
        try:
            self.rx = _re.compile(_translate_regex(source), py_flags)
        except _re.error as e:
            raise JSSyntaxError(f"bad regex /{source}/: {e}") from None

    def _match_arr(self, m: "_re.Match", s: str) -> JSMatchArray:
        arr = JSMatchArray([m.group(0)] + [
            g if g is not None else UNDEFINED for g in m.groups()])
        arr.index = m.start()
        arr.input = s
        return arr

    def test(self, s: str) -> bool:
        if self.global_:
            m = self.rx.search(s, min(self.lastIndex, len(s)))
            self.lastIndex = m.end() if m else 0
            return m is not None
        return self.rx.search(s) is not None

    def exec(self, s: str):
        start = min(self.lastIndex, len(s)) if self.global_ else 0
        m = self.rx.search(s, start)
        if m is None:
            self.lastIndex = 0
            return None
        if self.global_:
            self.lastIndex = m.end() if m.end() > m.start() else m.end() + 1
        return self._match_arr(m, s)


def _translate_regex(source: str) -> str:
    """JS → python regex: named groups and \\uXXXX escapes; the rest of
    the common syntax is shared."""
    out = _re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", source)
    out = _re.sub(
        r"\\u([0-9a-fA-F]{4})",
        lambda m: _re.escape(chr(int(m.group(1), 16))), out)
    return out


def _js_replacement(repl: str):
    """JS $-patterns in a replacement string → a python sub callback."""
    def cb(m: "_re.Match") -> str:
        out: List[str] = []
        i, n = 0, len(repl)
        while i < n:
            c = repl[i]
            if c == "$" and i + 1 < n:
                d = repl[i + 1]
                if d == "$":
                    out.append("$")
                    i += 2
                    continue
                if d == "&":
                    out.append(m.group(0))
                    i += 2
                    continue
                if d.isdigit():
                    j = i + 1
                    num = d
                    if j + 1 < n and repl[j + 1].isdigit() and \
                            int(num + repl[j + 1]) <= len(m.groups()):
                        num += repl[j + 1]
                        j += 1
                    gi = int(num)
                    if 1 <= gi <= len(m.groups()):
                        out.append(m.group(gi) or "")
                        i = j + 1
                        continue
            out.append(c)
            i += 1
        return "".join(out)
    return cb


# ========================================================== evaluator

class Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: Optional["Scope"] = None):
        self.vars: Dict[str, Any] = {}
        self.parent = parent

    def lookup(self, name: str):
        s: Optional[Scope] = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None

    def get(self, name: str):
        s = self.lookup(name)
        if s is None:
            raise JSThrow(f"ReferenceError: {name} is not defined")
        return s.vars[name]

    def set(self, name: str, val: Any):
        s = self.lookup(name)
        if s is None:  # assignment to undeclared: global (ES5 sloppy)
            s = self
            while s.parent is not None:
                s = s.parent
        s.vars[name] = val

    def declare(self, name: str, val: Any = UNDEFINED):
        self.vars[name] = val


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


# JS call-stack ceiling: real engines (incl. the reference's embedded
# one) bound the stack and throw a CATCHABLE RangeError; without this
# a self-recursive user script escapes as a Python RecursionError and
# kills the Spark task instead of following the exception contract.
# Each JS frame costs ~11 Python frames, so the Python recursion limit
# needs ~3× headroom over _MAX_CALL_DEPTH for the guard to fire first.
_MAX_CALL_DEPTH = 200
import sys as _sys
if _sys.getrecursionlimit() < 8000:
    _sys.setrecursionlimit(8000)


class Interp:
    def __init__(self, max_ops: int = 2_000_000):
        self.max_ops = max_ops
        self.ops = 0
        self.depth = 0

    def tick(self):
        self.ops += 1
        if self.ops > self.max_ops:
            raise JSTimeout("javascript processor execution timeout")

    # ---- statements
    def run_block(self, stmts: List[tuple], scope: Scope):
        for s in stmts:
            self.stmt(s, scope)

    def hoist(self, stmts: List[tuple], scope: Scope):
        """function-scope hoisting for var + function declarations."""
        for s in stmts:
            k = s[0]
            if k == "var":
                for name, _ in s[1]:
                    if scope.lookup(name) is not scope:
                        scope.declare(name)
            elif k == "funcdecl":
                scope.declare(s[1][1],
                              JSFunction(s[1][1], s[1][2], s[1][3], scope))
            elif k == "block":
                self.hoist(s[1], scope)
            elif k == "if":
                self.hoist([s[2]], scope)
                if s[3] is not None:
                    self.hoist([s[3]], scope)
            elif k in ("while",):
                self.hoist([s[2]], scope)
            elif k == "dowhile":
                self.hoist([s[1]], scope)
            elif k == "for":
                if s[1] is not None and s[1][0] == "var":
                    self.hoist([s[1]], scope)
                self.hoist([s[4]], scope)
            elif k == "forin":
                scope.declare(s[1]) if scope.lookup(s[1]) is None else None
                self.hoist([s[3]], scope)
            elif k == "try":
                self.hoist(s[1][1], scope)
                if s[3] is not None:
                    self.hoist(s[3][1], scope)
                if s[4] is not None:
                    self.hoist(s[4][1], scope)
            elif k == "switch":
                for _, body in s[2]:
                    self.hoist(body, scope)

    def stmt(self, s: tuple, scope: Scope):
        self.tick()
        k = s[0]
        if k == "expr":
            self.eval(s[1], scope)
        elif k == "var":
            for name, init in s[1]:
                if init is not None:
                    scope.set(name, self.eval(init, scope))
                elif scope.lookup(name) is None:
                    scope.declare(name)
        elif k == "if":
            if truthy(self.eval(s[1], scope)):
                self.stmt(s[2], scope)
            elif s[3] is not None:
                self.stmt(s[3], scope)
        elif k == "block":
            self.run_block(s[1], scope)
        elif k == "while":
            while truthy(self.eval(s[1], scope)):
                self.tick()
                try:
                    self.stmt(s[2], scope)
                except _Break:
                    break
                except _Continue:
                    continue
        elif k == "dowhile":
            while True:
                self.tick()
                try:
                    self.stmt(s[1], scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if not truthy(self.eval(s[2], scope)):
                    break
        elif k == "for":
            if s[1] is not None:
                self.stmt(s[1], scope)
            while s[2] is None or truthy(self.eval(s[2], scope)):
                self.tick()
                try:
                    self.stmt(s[4], scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if s[3] is not None:
                    self.eval(s[3], scope)
        elif k == "forin":
            obj = self.eval(s[2], scope)
            if isinstance(obj, Event):
                obj = obj.fields
            keys: List[Any]
            if isinstance(obj, dict):
                keys = list(obj.keys())
            elif isinstance(obj, list):
                keys = [str(i) for i in range(len(obj))]
            elif isinstance(obj, str):
                keys = [str(i) for i in range(len(obj))]
            else:
                keys = []
            if scope.lookup(s[1]) is None:
                scope.declare(s[1])
            for key in keys:
                self.tick()
                scope.set(s[1], key)
                try:
                    self.stmt(s[3], scope)
                except _Break:
                    break
                except _Continue:
                    continue
        elif k == "return":
            raise _Return(UNDEFINED if s[1] is None
                          else self.eval(s[1], scope))
        elif k == "break":
            raise _Break()
        elif k == "continue":
            raise _Continue()
        elif k == "throw":
            raise JSThrow(self.eval(s[1], scope))
        elif k == "funcdecl":
            pass  # hoisted
        elif k == "try":
            # the Python finally is the ONLY place the JS finally
            # block runs — running it inside the except arm too
            # executed it twice on uncaught throws
            try:
                try:
                    self.run_block(s[1][1], scope)
                except JSThrow as e:
                    if s[3] is None:
                        raise
                    cscope = Scope(scope)
                    cscope.declare(s[2], e.value)
                    self.run_block(s[3][1], cscope)
            finally:
                if s[4] is not None:
                    self.run_block(s[4][1], scope)
        elif k == "switch":
            disc = self.eval(s[1], scope)
            matched = False
            try:
                for test, body in s[2]:
                    if not matched and test is not None and \
                            strict_eq(disc, self.eval(test, scope)):
                        matched = True
                    if matched:
                        self.run_block(body, scope)
                if not matched:
                    run = False
                    for test, body in s[2]:
                        if test is None:
                            run = True
                        if run:
                            self.run_block(body, scope)
            except _Break:
                pass
        elif k == "empty":
            pass
        else:  # pragma: no cover
            raise JSError(f"unknown statement {k}")

    # ---- expressions
    def eval(self, e: tuple, scope: Scope) -> Any:
        self.tick()
        k = e[0]
        if k == "num" or k == "str":
            return e[1]
        if k == "ident":
            return scope.get(e[1])
        if k == "null":
            return None
        if k == "undef":
            return UNDEFINED
        if k == "bool":
            return e[1]
        if k == "this":
            s = scope.lookup("this")
            return s.vars["this"] if s else UNDEFINED
        if k == "regex":
            return JSRegExp(e[1], e[2])
        if k == "array":
            return [self.eval(x, scope) for x in e[1]]
        if k == "object":
            return {key: self.eval(v, scope) for key, v in e[1]}
        if k == "func":
            return JSFunction(e[1], e[2], e[3], scope)
        if k == "member":
            obj = self.eval(e[1], scope)
            prop = self.eval(e[2], scope)
            return self.get_member(obj, prop)
        if k == "call":
            return self.eval_call(e, scope)
        if k == "new":
            callee = self.eval(e[1], scope)
            args = [self.eval(a, scope) for a in e[2]]
            if isinstance(callee, Native) and callee.ctor:
                return self._invoke_native(callee, UNDEFINED, args)
            if isinstance(callee, JSFunction):
                this: Dict[str, Any] = {}
                self.call_function(callee, this, args)
                return this
            raise JSThrow("TypeError: not a constructor")
        if k == "logic":
            l = self.eval(e[2], scope)
            if e[1] == "&&":
                return self.eval(e[3], scope) if truthy(l) else l
            return l if truthy(l) else self.eval(e[3], scope)
        if k == "cond":
            return self.eval(e[2] if truthy(self.eval(e[1], scope))
                             else e[3], scope)
        if k == "bin":
            return self.binop(e[1], self.eval(e[2], scope),
                              self.eval(e[3], scope))
        if k == "unary":
            return self.unop(e[1], e[2], scope)
        if k == "assign":
            return self.eval_assign(e, scope)
        if k == "update":
            return self.eval_update(e, scope)
        if k == "seq":
            v = UNDEFINED
            for x in e[1]:
                v = self.eval(x, scope)
            return v
        raise JSError(f"unknown expression {k}")  # pragma: no cover

    def eval_call(self, e: tuple, scope: Scope) -> Any:
        callee_node = e[1]
        args = [self.eval(a, scope) for a in e[2]]
        if callee_node[0] == "member":
            obj = self.eval(callee_node[1], scope)
            prop = self.eval(callee_node[2], scope)
            fn = self.get_member(obj, prop)
            this = obj
        else:
            fn = self.eval(callee_node, scope)
            this = UNDEFINED
        return self.call_value(fn, this, args,
                               name=callee_node[1]
                               if callee_node[0] == "ident" else "?")

    def _invoke_native(self, fn: "Native", this: Any,
                       args: List[Any]) -> Any:
        """Run a python-implemented builtin; a stray Python exception
        (bad argument, domain error) becomes a JS throw so the script
        processor's tag_on_exception contract still applies instead of
        the Spark task dying."""
        try:
            return fn.fn(self, this, args)
        except (JSError, _Return, _Break, _Continue):
            raise
        except Exception as ex:  # noqa: BLE001
            raise JSThrow(f"{type(ex).__name__} in {fn.name}: {ex}")

    def call_value(self, fn: Any, this: Any, args: List[Any],
                   name: str = "?") -> Any:
        if isinstance(fn, Native):
            return self._invoke_native(fn, this, args)
        if isinstance(fn, JSFunction):
            return self.call_function(fn, this, args)
        raise JSThrow(f"TypeError: {name} is not a function")

    def call_function(self, fn: JSFunction, this: Any,
                      args: List[Any]) -> Any:
        if self.depth >= _MAX_CALL_DEPTH:
            raise JSThrow("RangeError: Maximum call stack size exceeded")
        scope = Scope(fn.scope)
        scope.declare("this", this)
        scope.declare("arguments", list(args))
        for i, p in enumerate(fn.params):
            scope.declare(p, args[i] if i < len(args) else UNDEFINED)
        self.hoist(fn.body, scope)
        self.depth += 1
        try:
            self.run_block(fn.body, scope)
        except _Return as r:
            return r.value
        finally:
            self.depth -= 1
        return UNDEFINED

    # ---- operators
    def binop(self, op: str, l: Any, r: Any) -> Any:
        if op == "+":
            if isinstance(l, str) or isinstance(r, str) or \
                    isinstance(l, (dict, list)) or isinstance(r, (dict, list)):
                return js_str(l) + js_str(r)
            a, b = to_number(l), to_number(r)
            if isinstance(a, int) and isinstance(b, int):
                return a + b
            return a + b
        if op in ("-", "*"):
            a, b = to_number(l), to_number(r)
            try:
                return a - b if op == "-" else a * b
            except TypeError:
                return math.nan
        if op == "/":
            a, b = to_number(l), to_number(r)
            if b == 0:
                if (isinstance(a, float) and math.isnan(a)) or a == 0:
                    return math.nan
                neg = (a < 0) != (str(b)[0] == "-" if isinstance(b, float)
                                  else False)
                return -math.inf if neg else math.inf
            res = a / b
            return res
        if op == "%":
            a, b = to_number(l), to_number(r)
            if b == 0 or (isinstance(a, float) and math.isinf(a)):
                return math.nan
            res = math.fmod(a, b)
            if isinstance(a, int) and isinstance(b, int):
                return int(res)
            return res
        if op == "==":
            return loose_eq(l, r)
        if op == "!=":
            return not loose_eq(l, r)
        if op == "===":
            return strict_eq(l, r)
        if op == "!==":
            return not strict_eq(l, r)
        if op in ("<", ">", "<=", ">="):
            if isinstance(l, str) and isinstance(r, str):
                a, b = l, r
            else:
                a, b = to_number(l), to_number(r)
                if (isinstance(a, float) and math.isnan(a)) or \
                        (isinstance(b, float) and math.isnan(b)):
                    return False
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            return a >= b
        if op == "&":
            return to_int32(l) & to_int32(r)
        if op == "|":
            return to_int32(l) | to_int32(r)
        if op == "^":
            return to_int32(l) ^ to_int32(r)
        if op == "<<":
            return to_int32(to_int32(l) << (to_int32(r) & 31))
        if op == ">>":
            return to_int32(l) >> (to_int32(r) & 31)
        if op == ">>>":
            return (to_int32(l) & 0xFFFFFFFF) >> (to_int32(r) & 31)
        if op == "in":
            if isinstance(r, dict):
                return js_str(l) in r
            if isinstance(r, list):
                n = to_number(l)
                return isinstance(n, (int, float)) and 0 <= n < len(r)
            if isinstance(r, Event):
                return r.ms_get(js_str(l)) is not UNDEFINED
            raise JSThrow("TypeError: 'in' on non-object")
        if op == "instanceof":
            return False  # no user prototypes in the subset
        raise JSError(f"unknown operator {op}")  # pragma: no cover

    def unop(self, op: str, node: tuple, scope: Scope) -> Any:
        if op == "typeof":
            if node[0] == "ident" and scope.lookup(node[1]) is None:
                return "undefined"
            return js_typeof(self.eval(node, scope))
        if op == "delete":
            if node[0] == "member":
                obj = self.eval(node[1], scope)
                prop = js_str(self.eval(node[2], scope))
                if isinstance(obj, dict):
                    obj.pop(prop, None)
                    return True
                if isinstance(obj, Event):
                    return obj.Delete(prop)
            return False
        v = self.eval(node, scope)
        if op == "!":
            return not truthy(v)
        if op == "-":
            n = to_number(v)
            return -n
        if op == "+":
            return to_number(v)
        if op == "~":
            return ~to_int32(v)
        if op == "void":
            return UNDEFINED
        raise JSError(f"unknown unary {op}")  # pragma: no cover

    def eval_assign(self, e: tuple, scope: Scope) -> Any:
        # member targets evaluate their object/index subexpressions
        # exactly ONCE (JS reference semantics): `a[i++] += 1` must
        # bump i once, not twice
        _, op, target, value_node = e
        if target[0] == "ident":
            value = self.eval(value_node, scope)
            if op != "=":
                value = self.binop(op[:-1],
                                   self.eval(target, scope), value)
            scope.set(target[1], value)
            return value
        obj = self.eval(target[1], scope)
        prop = self.eval(target[2], scope)
        value = self.eval(value_node, scope)
        if op != "=":
            value = self.binop(op[:-1],
                               self.get_member(obj, prop), value)
        self.set_member(obj, prop, value)
        return value

    def eval_update(self, e: tuple, scope: Scope) -> Any:
        _, op, target, prefix = e
        if target[0] == "ident":
            cur = to_number(self.eval(target, scope))
            new = cur + 1 if op == "++" else cur - 1
            scope.set(target[1], new)
        else:
            obj = self.eval(target[1], scope)
            prop = self.eval(target[2], scope)
            cur = to_number(self.get_member(obj, prop))
            new = cur + 1 if op == "++" else cur - 1
            self.set_member(obj, prop, new)
        return new if prefix else cur

    # ---- member access
    def get_member(self, obj: Any, prop: Any) -> Any:
        name = js_str(prop) if not isinstance(prop, str) else prop
        if obj is None or obj is UNDEFINED:
            raise JSThrow(
                f"TypeError: cannot read property {name!r} of "
                f"{js_str(obj)}")
        if isinstance(obj, Event):
            return obj.js_member(name)
        if isinstance(obj, dict):
            if name in obj:
                return obj[name]
            if name == "hasOwnProperty":
                return Native("hasOwnProperty",
                              lambda i, t, a: js_str(a[0]) in obj)
            if name == "toString":
                return Native("toString", lambda i, t, a: js_str(obj))
            return UNDEFINED
        if isinstance(obj, list):
            if name == "length":
                return len(obj)
            if isinstance(prop, (int, float)) or name.isdigit():
                idx = int(to_number(prop))
                return obj[idx] if 0 <= idx < len(obj) else UNDEFINED
            if isinstance(obj, JSMatchArray):
                if name == "index":
                    return obj.index
                if name == "input":
                    return obj.input
            m = _ARRAY_METHODS.get(name)
            if m is not None:
                return Native(name, lambda i, t, a, _m=m: _m(i, obj, a))
            return UNDEFINED
        if isinstance(obj, str):
            if name == "length":
                return len(obj)
            if isinstance(prop, (int, float)) or name.isdigit():
                idx = int(to_number(prop))
                return obj[idx] if 0 <= idx < len(obj) else UNDEFINED
            m = _STRING_METHODS.get(name)
            if m is not None:
                return Native(name, lambda i, t, a, _m=m: _m(i, obj, a))
            return UNDEFINED
        if isinstance(obj, JSRegExp):
            if name == "test":
                return Native("test",
                              lambda i, t, a: obj.test(js_str(a[0])))
            if name == "exec":
                return Native("exec",
                              lambda i, t, a: obj.exec(js_str(a[0])))
            if name == "source":
                return obj.source
            if name == "flags":
                return obj.flags
            if name == "global":
                return obj.global_
            if name == "lastIndex":
                return obj.lastIndex
            return UNDEFINED
        if isinstance(obj, bool):
            if name == "toString":
                return Native("toString", lambda i, t, a: js_str(obj))
            return UNDEFINED
        if isinstance(obj, (int, float)):
            if name == "toString":
                def _num_tostr(i, t, a):
                    if a and a[0] is not UNDEFINED:
                        radix = int(to_number(a[0]))
                        n = int(to_number(obj))
                        if n == 0:
                            return "0"
                        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
                        neg, n = n < 0, abs(n)
                        out = []
                        while n:
                            out.append(digits[n % radix])
                            n //= radix
                        return ("-" if neg else "") + "".join(out[::-1])
                    return js_num_str(obj)
                return Native("toString", _num_tostr)
            if name == "toFixed":
                return Native("toFixed", lambda i, t, a: (
                    f"{to_number(obj):.{int(to_number(a[0])) if a else 0}f}"))
            return UNDEFINED
        if isinstance(obj, (JSFunction, Native)):
            if isinstance(obj, Native) and obj.statics and \
                    name in obj.statics:
                return obj.statics[name]
            if name == "call":
                return Native("call", lambda i, t, a: i.call_value(
                    obj, a[0] if a else UNDEFINED, a[1:]))
            if name == "apply":
                return Native("apply", lambda i, t, a: i.call_value(
                    obj, a[0] if a else UNDEFINED,
                    list(a[1]) if len(a) > 1 and isinstance(a[1], list)
                    else []))
            return UNDEFINED
        return UNDEFINED

    def set_member(self, obj: Any, prop: Any, value: Any):
        name = js_str(prop) if not isinstance(prop, str) else prop
        if isinstance(obj, Event):
            obj.js_set_member(name, value)
            return
        if isinstance(obj, dict):
            obj[name] = value
            return
        if isinstance(obj, list):
            if name == "length":
                n = int(to_number(value))
                del obj[n:]
                obj.extend([UNDEFINED] * (n - len(obj)))
                return
            idx_n = to_number(prop)
            if (isinstance(idx_n, float) and math.isnan(idx_n)) \
                    or idx_n < 0:
                # JS stores a non-index property on the array object;
                # this model has no property bag, so the write is
                # dropped — it must NOT alias python negative indexing
                # and overwrite the last element
                return
            idx = int(idx_n)
            if idx >= len(obj):
                obj.extend([UNDEFINED] * (idx + 1 - len(obj)))
            obj[idx] = value
            return
        raise JSThrow(
            f"TypeError: cannot set property {name!r} on "
            f"{js_typeof(obj)}")


# ===================================================== string methods

def _arg(args: List[Any], i: int, default: Any = UNDEFINED) -> Any:
    return args[i] if i < len(args) else default


def _clamp_idx(n: float, length: int) -> int:
    if isinstance(n, float) and math.isnan(n):
        return 0
    n = int(n)
    if n < 0:
        n = max(length + n, 0)
    return min(n, length)


def _str_replace(interp: Interp, s: str, args: List[Any]) -> str:
    pat, repl = _arg(args, 0), _arg(args, 1)
    if isinstance(repl, (JSFunction, Native)):
        def cb(m: "_re.Match") -> str:
            groups = [g if g is not None else UNDEFINED
                      for g in m.groups()]
            return js_str(interp.call_value(
                repl, UNDEFINED, [m.group(0)] + groups +
                [m.start(), s]))
    else:
        cb = _js_replacement(js_str(repl))
    if isinstance(pat, JSRegExp):
        return pat.rx.sub(cb, s, count=0 if pat.global_ else 1)
    lit = js_str(pat)
    # string search: FIRST occurrence only (JS semantics)
    return _re.compile(_re.escape(lit)).sub(cb, s, count=1)


def _str_split(interp: Interp, s: str, args: List[Any]) -> List[str]:
    sep = _arg(args, 0)
    limit = _arg(args, 1)
    if sep is UNDEFINED:
        out: List[Any] = [s]
    elif isinstance(sep, JSRegExp):
        out = [x if x is not None else UNDEFINED
               for x in sep.rx.split(s)]
    else:
        sep_s = js_str(sep)
        out = list(s) if sep_s == "" else s.split(sep_s)
    if limit is not UNDEFINED:
        out = out[:int(to_number(limit))]
    return out


def _str_match(interp: Interp, s: str, args: List[Any]):
    pat = _arg(args, 0)
    rx = pat if isinstance(pat, JSRegExp) else JSRegExp(js_str(pat))
    if rx.global_:
        # one finditer pass: group(0) is always the full match, so no
        # tuple unwrapping is needed (findall would also have scanned
        # the subject a second time just to test emptiness)
        found = [m.group(0) for m in rx.rx.finditer(s)]
        return found or None
    m = rx.rx.search(s)
    return rx._match_arr(m, s) if m else None


_STRING_METHODS: Dict[str, Callable[[Interp, str, List[Any]], Any]] = {
    "charAt": lambda i, s, a: (
        s[int(to_number(_arg(a, 0, 0)))]
        if 0 <= int(to_number(_arg(a, 0, 0))) < len(s) else ""),
    "charCodeAt": lambda i, s, a: (
        ord(s[int(to_number(_arg(a, 0, 0)))])
        if 0 <= int(to_number(_arg(a, 0, 0))) < len(s) else math.nan),
    "indexOf": lambda i, s, a: s.find(
        js_str(_arg(a, 0)), int(to_number(_arg(a, 1, 0)))),
    "lastIndexOf": lambda i, s, a: s.rfind(js_str(_arg(a, 0))),
    "includes": lambda i, s, a: js_str(_arg(a, 0)) in s,
    "startsWith": lambda i, s, a: s.startswith(
        js_str(_arg(a, 0)), int(to_number(_arg(a, 1, 0)))),
    "endsWith": lambda i, s, a: (
        s[:int(to_number(a[1]))] if len(a) > 1 and
        a[1] is not UNDEFINED else s).endswith(js_str(_arg(a, 0))),
    "slice": lambda i, s, a: s[
        _clamp_idx(to_number(_arg(a, 0, 0)), len(s)):
        _clamp_idx(to_number(_arg(a, 1, len(s))), len(s))],
    "substring": lambda i, s, a: (lambda x, y: s[min(x, y):max(x, y)])(
        max(0, min(len(s), int(to_number(_arg(a, 0, 0)))
                   if not math.isnan(to_number(_arg(a, 0, 0))) else 0)),
        max(0, min(len(s), int(to_number(_arg(a, 1, len(s))))
                   if _arg(a, 1) is not UNDEFINED and
                   not math.isnan(to_number(_arg(a, 1))) else len(s)))),
    "substr": lambda i, s, a: (lambda st: s[st:st + int(
        to_number(_arg(a, 1, len(s))))])(
        _clamp_idx(to_number(_arg(a, 0, 0)), len(s))),
    "toLowerCase": lambda i, s, a: s.lower(),
    "toUpperCase": lambda i, s, a: s.upper(),
    "trim": lambda i, s, a: s.strip(),
    "trimStart": lambda i, s, a: s.lstrip(),
    "trimEnd": lambda i, s, a: s.rstrip(),
    "split": _str_split,
    "replace": _str_replace,
    "match": _str_match,
    "search": lambda i, s, a: (lambda rx: (
        lambda m: m.start() if m else -1)(rx.rx.search(s)))(
        _arg(a, 0) if isinstance(_arg(a, 0), JSRegExp)
        else JSRegExp(js_str(_arg(a, 0)))),
    "concat": lambda i, s, a: s + "".join(js_str(x) for x in a),
    "repeat": lambda i, s, a: s * int(to_number(_arg(a, 0, 0))),
    "padStart": lambda i, s, a: s.rjust(
        int(to_number(_arg(a, 0, 0))), js_str(_arg(a, 1, " "))[0] or " "),
    "padEnd": lambda i, s, a: s.ljust(
        int(to_number(_arg(a, 0, 0))), js_str(_arg(a, 1, " "))[0] or " "),
    "toString": lambda i, s, a: s,
    "valueOf": lambda i, s, a: s,
    "localeCompare": lambda i, s, a: (
        -1 if s < js_str(_arg(a, 0)) else
        (1 if s > js_str(_arg(a, 0)) else 0)),
}


# ====================================================== array methods

def _arr_splice(interp: Interp, arr: List[Any], args: List[Any]):
    start = _clamp_idx(to_number(_arg(args, 0, 0)), len(arr))
    count = (len(arr) - start if len(args) < 2
             else max(0, int(to_number(args[1]))))
    removed = arr[start:start + count]
    arr[start:start + count] = list(args[2:])
    return removed


def _arr_sort(interp: Interp, arr: List[Any], args: List[Any]):
    cmp = _arg(args, 0)
    if cmp is UNDEFINED:
        arr.sort(key=js_str)
    else:
        import functools
        arr.sort(key=functools.cmp_to_key(
            lambda x, y: (lambda r: -1 if r < 0 else (1 if r > 0 else 0))(
                to_number(interp.call_value(cmp, UNDEFINED, [x, y])))))
    return arr


def _arr_reduce(interp: Interp, arr: List[Any], args: List[Any]):
    fn = _arg(args, 0)
    if len(args) > 1:
        acc, start = args[1], 0
    elif arr:
        acc, start = arr[0], 1
    else:
        raise JSThrow("TypeError: reduce of empty array with no initial value")
    for idx in range(start, len(arr)):
        acc = interp.call_value(fn, UNDEFINED, [acc, arr[idx], idx, arr])
    return acc


_ARRAY_METHODS: Dict[str, Callable[[Interp, List[Any], List[Any]], Any]] = {
    "push": lambda i, arr, a: (arr.extend(a), len(arr))[1],
    "pop": lambda i, arr, a: arr.pop() if arr else UNDEFINED,
    "shift": lambda i, arr, a: arr.pop(0) if arr else UNDEFINED,
    "unshift": lambda i, arr, a: (arr.__setitem__(
        slice(0, 0), list(a)), len(arr))[1],
    "indexOf": lambda i, arr, a: next(
        (j for j, x in enumerate(arr) if strict_eq(x, _arg(a, 0))), -1),
    "lastIndexOf": lambda i, arr, a: next(
        (j for j in range(len(arr) - 1, -1, -1)
         if strict_eq(arr[j], _arg(a, 0))), -1),
    "includes": lambda i, arr, a: any(
        strict_eq(x, _arg(a, 0)) for x in arr),
    "join": lambda i, arr, a: (
        js_str(_arg(a, 0, ",")) if _arg(a, 0) is not UNDEFINED else ","
    ).join("" if x is None or x is UNDEFINED else js_str(x) for x in arr),
    "slice": lambda i, arr, a: arr[
        _clamp_idx(to_number(_arg(a, 0, 0)), len(arr)):
        _clamp_idx(to_number(_arg(a, 1, len(arr))), len(arr))],
    "splice": _arr_splice,
    "concat": lambda i, arr, a: sum(
        (x if isinstance(x, list) else [x] for x in a), arr[:]),
    "reverse": lambda i, arr, a: (arr.reverse(), arr)[1],
    "sort": _arr_sort,
    "map": lambda i, arr, a: [
        i.call_value(a[0], UNDEFINED, [x, j, arr])
        for j, x in enumerate(arr)],
    "filter": lambda i, arr, a: [
        x for j, x in enumerate(arr)
        if truthy(i.call_value(a[0], UNDEFINED, [x, j, arr]))],
    "forEach": lambda i, arr, a: ([
        i.call_value(a[0], UNDEFINED, [x, j, arr])
        for j, x in enumerate(arr)], UNDEFINED)[1],
    "reduce": _arr_reduce,
    "some": lambda i, arr, a: any(
        truthy(i.call_value(a[0], UNDEFINED, [x, j, arr]))
        for j, x in enumerate(arr)),
    "every": lambda i, arr, a: all(
        truthy(i.call_value(a[0], UNDEFINED, [x, j, arr]))
        for j, x in enumerate(arr)),
    "find": lambda i, arr, a: next(
        (x for j, x in enumerate(arr)
         if truthy(i.call_value(a[0], UNDEFINED, [x, j, arr]))),
        UNDEFINED),
    "findIndex": lambda i, arr, a: next(
        (j for j, x in enumerate(arr)
         if truthy(i.call_value(a[0], UNDEFINED, [x, j, arr]))), -1),
    "toString": lambda i, arr, a: js_str(arr),
}


# ============================================================ globals

def _js_pow(x: float, y: float) -> float:
    """JS Math.pow: negative base with fractional exponent is NaN
    (Python returns complex), 0**negative is Infinity, overflow is
    Infinity."""
    try:
        return math.pow(x, y)
    except OverflowError:
        return math.inf
    except ValueError:
        return math.inf if x == 0 else math.nan


def _js_log(x: float) -> float:
    if x > 0:
        return math.log(x)
    return -math.inf if x == 0 else math.nan


def _js_exp(x: float) -> float:
    try:
        return math.exp(x)
    except OverflowError:
        return math.inf


def _parse_int(interp, this, args):
    s = js_str(_arg(args, 0)).strip()
    radix = int(to_number(_arg(args, 1, 10) or 10))
    sign = 1
    if s[:1] in ("+", "-"):
        sign = -1 if s[0] == "-" else 1
        s = s[1:]
    if radix == 16 or (radix == 10 and s[:2].lower() == "0x"):
        if s[:2].lower() == "0x":
            s = s[2:]
        radix = 16
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
    out = 0
    seen = False
    for ch in s.lower():
        d = digits.find(ch)
        if d < 0:
            break
        out = out * radix + d
        seen = True
    return sign * out if seen else math.nan


def _parse_float(interp, this, args):
    s = js_str(_arg(args, 0)).strip()
    m = _re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    if not m:
        return math.nan
    v = float(m.group(0))
    return int(v) if v.is_integer() and "." not in m.group(0) \
        and "e" not in m.group(0).lower() else v


def _json_stringify_value(v: Any, indent: Optional[int],
                          depth: int = 0) -> Optional[str]:
    if v is UNDEFINED or isinstance(v, (JSFunction, Native)):
        return None
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return "null"
        return js_num_str(v)
    if isinstance(v, str):
        return _json.dumps(v, ensure_ascii=False)
    nl, pad, pad1 = "", "", ""
    if indent:
        nl = "\n"
        pad = " " * (indent * (depth + 1))
        pad1 = " " * (indent * depth)
    if isinstance(v, list):
        items = [
            _json_stringify_value(x, indent, depth + 1) or "null"
            for x in v]
        if not items:
            return "[]"
        sep = "," + nl + pad if indent else ","
        return "[" + nl + pad + sep.join(items) + nl + pad1 + "]"
    if isinstance(v, dict):
        parts = []
        for k, x in v.items():
            sx = _json_stringify_value(x, indent, depth + 1)
            if sx is None:
                continue
            colon = ": " if indent else ":"
            parts.append(
                _json.dumps(js_str(k), ensure_ascii=False) + colon + sx)
        if not parts:
            return "{}"
        sep = "," + nl + pad if indent else ","
        return "{" + nl + pad + sep.join(parts) + nl + pad1 + "}"
    if isinstance(v, Event):
        return _json_stringify_value(v.fields, indent, depth)
    return _json.dumps(js_str(v), ensure_ascii=False)


def _make_globals() -> Dict[str, Any]:
    def unsupported(name: str, why: str):
        def raiser(interp, this, args):
            raise JSThrow(f"{name} is not supported in the batch "
                          f"script processor ({why})")
        return Native(name, raiser, ctor=True)

    g: Dict[str, Any] = {
        "undefined": UNDEFINED,
        "NaN": math.nan,
        "Infinity": math.inf,
        "parseInt": Native("parseInt", _parse_int),
        "parseFloat": Native("parseFloat", _parse_float),
        "isNaN": Native("isNaN", lambda i, t, a: (
            lambda n: isinstance(n, float) and math.isnan(n))(
            to_number(_arg(a, 0)))),
        "isFinite": Native("isFinite", lambda i, t, a: (
            lambda n: not (isinstance(n, float) and
                           (math.isnan(n) or math.isinf(n))))(
            to_number(_arg(a, 0)))),
        "String": Native("String", lambda i, t, a: js_str(
            _arg(a, 0, "")), ctor=True, statics={
                "fromCharCode": Native("fromCharCode", lambda i, t, a:
                                       "".join(chr(int(to_number(x)))
                                               for x in a))}),
        "Number": Native("Number", lambda i, t, a: to_number(
            _arg(a, 0, 0)), ctor=True),
        "Boolean": Native("Boolean", lambda i, t, a: truthy(
            _arg(a, 0)), ctor=True),
        "Array": Native("Array", lambda i, t, a: (
            [UNDEFINED] * int(a[0]) if len(a) == 1 and
            isinstance(a[0], (int, float)) else list(a)), ctor=True,
            statics={"isArray": Native(
                "isArray", lambda i, t, a: isinstance(_arg(a, 0), list))}),
        "RegExp": Native("RegExp", lambda i, t, a: JSRegExp(
            js_str(_arg(a, 0, "")), js_str(_arg(a, 1, ""))
            if _arg(a, 1) is not UNDEFINED else ""), ctor=True),
        "Error": Native("Error", lambda i, t, a: {
            "name": "Error", "message": js_str(_arg(a, 0, ""))},
            ctor=True),
        "TypeError": Native("TypeError", lambda i, t, a: {
            "name": "TypeError", "message": js_str(_arg(a, 0, ""))},
            ctor=True),
        "Date": unsupported("Date", "nondeterministic under task retry"),
        "setTimeout": unsupported("setTimeout", "no event loop"),
        "encodeURIComponent": Native(
            "encodeURIComponent", lambda i, t, a: _url.quote(
                js_str(_arg(a, 0, "")), safe="!'()*-._~")),
        "decodeURIComponent": Native(
            "decodeURIComponent", lambda i, t, a: _url.unquote(
                js_str(_arg(a, 0, "")))),
        "Math": {
            "floor": Native("floor", lambda i, t, a: math.floor(
                to_number(_arg(a, 0)))),
            "ceil": Native("ceil", lambda i, t, a: math.ceil(
                to_number(_arg(a, 0)))),
            # JS rounds .5 toward +Infinity (not banker's)
            "round": Native("round", lambda i, t, a: math.floor(
                to_number(_arg(a, 0)) + 0.5)),
            "trunc": Native("trunc", lambda i, t, a: math.trunc(
                to_number(_arg(a, 0)))),
            "abs": Native("abs", lambda i, t, a: abs(
                to_number(_arg(a, 0)))),
            "min": Native("min", lambda i, t, a: min(
                (to_number(x) for x in a), default=math.inf)),
            "max": Native("max", lambda i, t, a: max(
                (to_number(x) for x in a), default=-math.inf)),
            "pow": Native("pow", lambda i, t, a: _js_pow(
                to_number(_arg(a, 0)), to_number(_arg(a, 1)))),
            "sqrt": Native("sqrt", lambda i, t, a: (
                lambda x: math.sqrt(x) if x >= 0 else math.nan)(
                to_number(_arg(a, 0)))),
            "log": Native("log", lambda i, t, a: _js_log(
                to_number(_arg(a, 0)))),
            "exp": Native("exp", lambda i, t, a: _js_exp(
                to_number(_arg(a, 0)))),
            "random": unsupported(
                "Math.random", "nondeterministic under task retry"),
            "PI": math.pi,
            "E": math.e,
        },
        "JSON": {
            "parse": Native("parse", lambda i, t, a: _json_parse(
                js_str(_arg(a, 0)))),
            "stringify": Native("stringify", lambda i, t, a: (
                lambda s: s if s is not None else UNDEFINED)(
                _json_stringify_value(
                    _arg(a, 0),
                    int(to_number(a[2])) if len(a) > 2 and
                    _arg(a, 2) is not UNDEFINED else None))),
        },
        "Object": {
            "keys": Native("keys", lambda i, t, a: list(
                a[0].fields.keys()) if isinstance(a[0], Event)
                else (list(a[0].keys()) if isinstance(a[0], dict)
                      else [str(j) for j in range(len(a[0]))]
                      if isinstance(a[0], list) else [])),
            "values": Native("values", lambda i, t, a: list(
                a[0].values()) if isinstance(a[0], dict)
                else (list(a[0]) if isinstance(a[0], list) else [])),
            "assign": Native("assign", lambda i, t, a: (
                [a[0].update(x) for x in a[1:]
                 if isinstance(x, dict)], a[0])[1]),
        },
    }
    return g


def _json_parse(s: str) -> Any:
    try:
        return _json.loads(s)
    except ValueError as e:
        raise JSThrow(f"SyntaxError: JSON.parse: {e}") from None


# ========================================================= Event host
#
# mapstr.M dotted-path semantics (elastic-agent-libs mapstr): at each
# level the FULL remaining key is tried as a literal first, then split
# on the first dot — so flat column names containing dots and nested
# objects both resolve.

_MISSING = object()


def ms_get(d: Any, key: str) -> Any:
    """GetValue: _MISSING when absent (callers map to null/undefined)."""
    if not isinstance(d, dict):
        return _MISSING
    if key in d:
        return d[key]
    if "." in key:
        head, rest = key.split(".", 1)
        if head in d:
            return ms_get(d[head], rest)
    return _MISSING


def ms_put(d: Dict[str, Any], key: str, value: Any) -> Any:
    """PutValue: returns the old value (or None). Raises JSThrow when
    an intermediate segment exists and is not an object (the reference
    panics → JS exception)."""
    if key in d:
        old = d[key]
        d[key] = value
        return old
    if "." in key:
        head, rest = key.split(".", 1)
        if head not in d:
            d[head] = {}
        elif not isinstance(d[head], dict):
            raise JSThrow(
                f"expected map but type is {js_typeof(d[head])} "
                f"(key {head!r})")
        return ms_put(d[head], rest, value)
    d[key] = value
    return None


def ms_delete(d: Any, key: str) -> bool:
    if not isinstance(d, dict):
        return False
    if key in d:
        del d[key]
        return True
    if "." in key:
        head, rest = key.split(".", 1)
        if head in d:
            return ms_delete(d[head], rest)
    return False


def _append_string(fields: Dict[str, Any], field: str, value: str,
                   always_array: bool):
    """beatevent_v0.go:appendString — dedup append, string or
    string-array target only."""
    cur = ms_get(fields, field)
    if cur is _MISSING or cur is None:
        ms_put(fields, field, [value] if always_array else value)
        return
    if isinstance(cur, str):
        if value != cur:
            ms_put(fields, field, [cur, value])
        elif always_array:
            ms_put(fields, field, [cur])
        return
    if isinstance(cur, list):
        if value not in cur:
            cur.append(value)
        return
    raise JSThrow(
        f"unexpected type {js_typeof(cur)} found for {field} field")


class Event:
    """The beat event bridged into JS (``beatevent_v0.go:82-96``)."""

    __slots__ = ("fields", "meta", "cancelled")

    def __init__(self, fields: Optional[Dict[str, Any]] = None,
                 meta: Optional[Dict[str, Any]] = None):
        self.fields: Dict[str, Any] = fields if fields is not None else {}
        self.meta: Dict[str, Any] = meta if meta is not None else {}
        self.cancelled = False

    # key routing: beat.Event special-cases the @metadata prefix
    def _route(self, key: str) -> Tuple[Dict[str, Any], Optional[str]]:
        if key == "@metadata":
            return self.meta, None
        if key.startswith("@metadata."):
            return self.meta, key[len("@metadata."):]
        return self.fields, key

    def ms_get(self, key: str) -> Any:
        d, k = self._route(key)
        if k is None:
            return d
        v = ms_get(d, k)
        return UNDEFINED if v is _MISSING else v

    # ---- the JS API
    def Get(self, key: Any = UNDEFINED) -> Any:
        if key is UNDEFINED:
            return self.fields
        v = self.ms_get(js_str(key))
        return None if v is UNDEFINED else v

    def Put(self, key: str, value: Any) -> Any:
        d, k = self._route(js_str(key))
        if k is None:
            raise JSThrow("Put @metadata requires a subkey")
        return ms_put(d, k, value)

    def Rename(self, frm: str, to: str) -> bool:
        frm, to = js_str(frm), js_str(to)
        if self.ms_get(to) is not UNDEFINED:
            return False  # fields cannot be overwritten
        v = self.ms_get(frm)
        if v is UNDEFINED:
            return False
        d, k = self._route(frm)
        # delete first: supports `a` → `a.b`
        if not ms_delete(d, k):
            return False
        try:
            dd, kk = self._route(to)
            ms_put(dd, kk, v)
        except JSThrow:
            ms_put(d, k, v)  # undo
            return False
        return True

    def Delete(self, key: str) -> bool:
        d, k = self._route(js_str(key))
        if k is None:
            return False
        return ms_delete(d, k)

    def Cancel(self):
        self.cancelled = True

    def Tag(self, tag: str):
        _append_string(self.fields, "tags", js_str(tag),
                       always_array=True)

    def AppendTo(self, field: str, value: str):
        _append_string(self.fields, js_str(field), js_str(value),
                       always_array=False)

    # ---- member bridge
    def js_member(self, name: str) -> Any:
        if name == "fields":
            return self.fields
        meth = getattr(self, name, None)
        if name in ("Get", "Put", "Rename", "Delete", "Cancel", "Tag",
                    "AppendTo") and meth is not None:
            def native(interp, this, args, _m=meth):
                return _js_undef_to_none(_m(*args))
            return Native(name, native)
        return UNDEFINED

    def js_set_member(self, name: str, value: Any):
        if name == "fields":
            if not isinstance(value, dict):
                raise JSThrow("fields must be an object")
            self.fields = value
            return
        raise JSThrow(f"cannot set {name!r} on event")


def _js_undef_to_none(v: Any) -> Any:
    # API methods return goja values; undefined normalizes fine as-is
    return v


# ============================================================= Script

_PROCESS_FN = "process"
_REGISTER_FN = "register"
_TEST_FN = "test"


class Script:
    """A compiled processor script: global scope + process()."""

    def __init__(self, source: str,
                 params: Optional[Mapping[str, Any]] = None,
                 max_ops: int = 2_000_000):
        self.source = source
        self.max_ops = max_ops
        try:
            ast = parse(source)
        except RecursionError:
            raise JSSyntaxError("script nests too deeply") from None
        self.scope = Scope()
        self.scope.vars.update(_make_globals())
        self.scope.declare("Event", Native(
            "Event", _event_ctor, ctor=True))
        interp = Interp(max_ops)
        try:
            interp.hoist(ast, self.scope)
            interp.run_block(ast, self.scope)
        except RecursionError:
            raise JSThrow(
                "RangeError: Maximum call stack size exceeded") from None
        proc = self.scope.vars.get(_PROCESS_FN)
        if proc is None or not isinstance(proc, (JSFunction, Native)):
            raise JSError("process function not found")
        self.process_fn = proc
        try:
            if params is not None:
                reg = self.scope.vars.get(_REGISTER_FN)
                if reg is None:
                    raise JSError("params were provided but no register "
                                  "function was found")
                interp.call_value(reg, UNDEFINED, [dict(params)])
            test = self.scope.vars.get(_TEST_FN)
            if isinstance(test, (JSFunction, Native)):
                interp.call_value(test, UNDEFINED, [])
        except RecursionError:
            raise JSThrow(
                "RangeError: Maximum call stack size exceeded") from None

    def run(self, evt: Event) -> Optional[Event]:
        """process() one event; None when cancelled. JS exceptions
        propagate as JSThrow — the processor layer applies the
        tag_on_exception contract. A Python stack blowout that slips
        past the call-depth guard (pathological non-call nesting)
        surfaces as the same catchable RangeError, never as a
        task-killing RecursionError."""
        interp = Interp(self.max_ops)
        try:
            interp.call_value(self.process_fn, UNDEFINED, [evt])
        except RecursionError:
            raise JSThrow(
                "RangeError: Maximum call stack size exceeded") from None
        return None if evt.cancelled else evt


def _event_ctor(interp, this, args):
    a0 = _arg(args, 0)
    if not isinstance(a0, dict):
        raise JSThrow("Event constructor requires map argument")
    return Event(fields=a0)


def compile_script(source: str,
                   params: Optional[Mapping[str, Any]] = None,
                   max_ops: int = 2_000_000) -> Script:
    return Script(source, params=params, max_ops=max_ops)
