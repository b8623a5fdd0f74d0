"""Hostile-input hardening for the ES5 interpreter (minijs is a trust
boundary for user configs): stack exhaustion, op-budget boundaries,
deep static nesting, prototype-chain games, and a hypothesis fuzz over
a small expression grammar. The invariant throughout: user source can
NEVER surface a non-JSError Python exception (which would kill the
Spark task); everything is the reference's exception contract —
catchable in JS, taggable by tag_on_exception."""

import pytest
from hypothesis import given, settings, strategies as st

from beats_spark.functions.minijs import (
    Event, JSError, JSSyntaxError, JSThrow, JSTimeout, UNDEFINED,
    compile_script,
)


def run(body, max_ops=500_000):
    s = compile_script("function process(evt){" + body + "}",
                       max_ops=max_ops)
    e = Event(fields={})
    s.run(e)
    return e


# ---- call-stack ceiling (the goja RangeError contract) -------------

def test_self_recursion_is_catchable_rangeerror():
    e = run("function f(n){ return f(n+1); }"
            "var got = 'no';"
            "try { f(0); } catch (err) { got = String(err); }"
            "evt.Put('got', got);")
    assert "RangeError" in e.fields["got"]


def test_uncaught_recursion_raises_jsthrow_not_recursionerror():
    s = compile_script(
        "function f(){ return f(); } function process(evt){ f(); }")
    with pytest.raises(JSThrow, match="RangeError"):
        s.run(Event(fields={}))


def test_mutual_recursion_guarded():
    e = run("function a(n){ return b(n); } function b(n){ return a(n); }"
            "var got = 'no';"
            "try { a(0); } catch (err) { got = 'caught'; }"
            "evt.Put('got', got);")
    assert e.fields["got"] == "caught"


def test_legitimate_deep_recursion_below_ceiling_works():
    e = run("function fact(n){ return n <= 1 ? 1 : n * fact(n - 1); }"
            "evt.Put('x', fact(150) > 0);")
    assert e.fields["x"] is True


def test_recursion_at_budget_boundary_still_contract():
    # tiny op budget + recursion: whichever limit trips first, the
    # failure is a JSError, never a Python crash
    src = ("function f(n){ return f(n+1); } "
           "function process(evt){ f(0); }")
    with pytest.raises((JSThrow, JSTimeout)):
        compile_script(src, max_ops=300).run(Event(fields={}))


# ---- op-budget boundary ---------------------------------------------

def test_budget_is_deterministic_across_runs():
    src = ("function process(evt){ var s = 0;"
           "for (var i = 0; i < 500; i++) { s += i; }"
           "evt.Put('s', s); }")
    # find a budget that passes, then shrink until it fails — the
    # boundary must be crisp and stable
    s_ok = compile_script(src, max_ops=100_000)
    e1, e2 = Event(fields={}), Event(fields={})
    s_ok.run(e1); s_ok.run(e2)
    assert e1.fields["s"] == e2.fields["s"] == 124750
    with pytest.raises(JSTimeout):
        compile_script(src, max_ops=500).run(Event(fields={}))


@given(st.integers(min_value=1, max_value=4000))
@settings(max_examples=25, deadline=None)
def test_any_budget_yields_result_or_timeout(budget):
    src = ("function process(evt){ var s = 0;"
           "for (var i = 0; i < 100; i++) { s += i; }"
           "evt.Put('s', s); }")
    try:
        e = Event(fields={})
        compile_script(src, max_ops=budget).run(e)
        assert e.fields["s"] == 4950
    except JSTimeout:
        pass  # the only acceptable failure


# ---- deep static nesting (parser guard) -----------------------------

@given(st.integers(min_value=1, max_value=4000),
       st.sampled_from(["paren", "block", "array", "object", "unary"]))
@settings(max_examples=20, deadline=None)
def test_deep_nesting_parses_or_syntax_errors(depth, kind):
    if kind == "paren":
        body = "var x = " + "(" * depth + "1" + ")" * depth + ";"
    elif kind == "block":
        body = "{" * depth + "}" * depth
    elif kind == "array":
        body = "var x = " + "[" * depth + "]" * depth + ";"
    elif kind == "object":
        body = "var x = " + "{a:" * depth + "1" + "}" * depth + ";"
    else:
        body = "var x = " + "!" * depth + "1;"
    src = "function process(evt){" + body + "}"
    try:
        compile_script(src, max_ops=500_000).run(Event(fields={}))
    except JSError:
        pass  # JSSyntaxError (too deep) or runtime JSError: both fine


# ---- prototype-chain / property games -------------------------------

def test_getterless_prototype_chain_lookups():
    e = run("var o = {a: 1};"
            "evt.Put('proto', o.__proto__ === undefined);"
            "evt.Put('ctor', typeof o.constructor);"
            "evt.Put('own', o.hasOwnProperty('a'));"
            "evt.Put('miss', o.hasOwnProperty('__proto__'));")
    assert e.fields["proto"] is True
    assert e.fields["ctor"] == "undefined"
    assert e.fields["own"] is True
    assert e.fields["miss"] is False


def test_chained_access_on_missing_is_catchable_typeerror():
    e = run("var got = 'no';"
            "try { var x = ({}).missing.deeper.still; }"
            "catch (err) { got = String(err); }"
            "evt.Put('got', got);")
    assert "TypeError" in e.fields["got"]


def test_write_through_undefined_is_catchable():
    e = run("var got = 'no';"
            "try { undefined.x = 1; } catch (err) { got = 'caught'; }"
            "try { null.y = 2; } catch (err2) { got += '+null'; }"
            "evt.Put('got', got);")
    assert e.fields["got"] == "caught+null"


def test_shadowing_builtins_does_not_escape():
    # overwrite String/Math inside the script: confined to the scope,
    # no Python-side state leaks between compiles
    e = run("String = function(){ return 'hacked'; };"
            "Math = {};"
            "evt.Put('s', String(1));")
    assert e.fields["s"] == "hacked"
    e2 = run("evt.Put('s', String(1)); evt.Put('m', Math.floor(1.5));")
    assert e2.fields["s"] == "1" and e2.fields["m"] == 1


# ---- hypothesis fuzz over an expression grammar ----------------------

_ATOMS = st.sampled_from(
    ["1", "0", "-3", "2.5", "'a'", "'\\n'", "true", "false", "null",
     "undefined", "[]", "[1,2]", "({})", "({a:1})", "NaN", "x", "s"])
_BINOPS = st.sampled_from(
    ["+", "-", "*", "/", "%", "<", ">", "==", "===", "!=", "&&", "||"])
_UNOPS = st.sampled_from(["!", "-", "typeof ", "+"])


def _expr(depth):
    if depth <= 0:
        return _ATOMS
    sub = st.deferred(lambda: _expr(depth - 1))
    return st.one_of(
        _ATOMS,
        st.tuples(sub, _BINOPS, sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(_UNOPS, sub).map(lambda t: f"({t[0]}{t[1]})"),
        st.tuples(sub, sub, sub).map(
            lambda t: f"({t[0]} ? {t[1]} : {t[2]})"),
    )


@given(_expr(4))
@settings(max_examples=120, deadline=None)
def test_fuzzed_expressions_never_crash_and_are_deterministic(expr):
    src = ("function process(evt){ var x = 7; var s = 'q';"
           f"var r; try {{ r = ({expr}); }} catch (err) {{ r = 'E'; }}"
           "evt.Put('r', String(r)); }")
    try:
        script = compile_script(src, max_ops=100_000)
    except JSSyntaxError:
        return  # grammar corner the subset rejects at compile: fine
    e1, e2 = Event(fields={}), Event(fields={})
    script.run(e1)
    script.run(e2)
    assert e1.fields["r"] == e2.fields["r"]


@given(st.text(alphabet="(){}[];+-*/%!<>=?:&|'\"abc123 ,.",
               min_size=0, max_size=60))
@settings(max_examples=150, deadline=None)
def test_garbage_source_only_raises_jserrors(garbage):
    src = "function process(evt){" + garbage + "}"
    try:
        compile_script(src, max_ops=50_000).run(Event(fields={}))
    except JSError:
        pass  # any JSError subclass honors the contract
    # anything else (RecursionError, TypeError, IndexError...) fails
