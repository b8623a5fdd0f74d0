"""ES5 interpreter + JS ``script`` processor.

Event-API vectors ported from the reference's
``script/javascript/beatevent_v0_test.go`` and the session contract
from ``session_test.go`` (register/params, missing process, runaway
loop, compile-time test()); plus a language-semantics battery and the
Spark integration (schema contract, Cancel, tag_on_exception).
"""

from __future__ import annotations

import math

import pytest

from beats_spark.functions.minijs import (
    Event, JSError, JSSyntaxError, JSThrow, JSTimeout, UNDEFINED,
    compile_script,
)

H, F = "function process(evt) {", "}"


def _evt() -> Event:
    # testEvent() from beatevent_v0_test.go:149
    return Event(fields={"source": {"ip": "192.0.2.1"}},
                 meta={"pipeline": "beat-1.2.3-module"})


def run(src: str, evt: Event | None = None):
    evt = evt if evt is not None else _evt()
    s = compile_script(H + src + F)
    return s.run(evt), evt


# ----------------------------------------- beatevent_v0_test.go vectors

class TestBeatEventV0:
    def test_put(self):
        _, e = run('evt.Put("hello", "world");')
        assert e.fields["hello"] == "world"

    def test_object_put_key(self):
        _, e = run('evt.fields["hello"] = "world";')
        assert e.fields["hello"] == "world"

    def test_get(self):
        run('var ip = evt.Get("source.ip");'
            'if ("192.0.2.1" !== ip) { throw "failed to get IP"; }')

    def test_get_object(self):
        run('var source = evt.Get("source");'
            'if ("192.0.2.1" !== source.ip) { throw "failed"; }')

    def test_get_undefined_key(self):
        run('var ip = evt.Get().source.ip;'
            'if ("192.0.2.1" !== ip) { throw "failed"; }')

    def test_fields_get_key(self):
        run('var ip = evt.fields.source.ip;'
            'if ("192.0.2.1" !== ip) { throw "failed"; }')

    def test_delete(self):
        _, e = run('if (!evt.Delete("source.ip")) { throw "nope"; }')
        assert e.ms_get("source.ip") is UNDEFINED

    def test_rename(self):
        _, e = run('if (!evt.Rename("source", "destination")) '
                   '{ throw "nope"; }')
        assert e.ms_get("destination.ip") == "192.0.2.1"
        assert e.ms_get("source") is UNDEFINED

    def test_rename_no_overwrite(self):
        e = Event({"a": 1, "b": 2})
        run('if (evt.Rename("a", "b")) { throw "should not overwrite"; }',
            e)
        assert e.fields == {"a": 1, "b": 2}

    def test_get_metadata(self):
        run('if (evt.Get("@metadata.pipeline") !== "beat-1.2.3-module")'
            ' { throw "failed"; }')

    def test_put_metadata(self):
        _, e = run('evt.Put("@metadata.foo", "bar");')
        assert e.meta["foo"] == "bar"

    def test_delete_metadata(self):
        _, e = run('evt.Delete("@metadata.pipeline");')
        assert "pipeline" not in e.meta

    def test_cancel(self):
        out, _ = run("evt.Cancel();")
        assert out is None

    def test_tag_dedup(self):
        _, e = run('evt.Tag("foo"); evt.Tag("bar"); evt.Tag("foo");')
        assert e.fields["tags"] == ["foo", "bar"]

    def test_append_to(self):
        _, e = run('evt.AppendTo("source.ip", "10.0.0.1");')
        assert e.ms_get("source.ip") == ["192.0.2.1", "10.0.0.1"]

    def test_put_returns_old(self):
        run('var old = evt.Put("source.ip", "10.0.0.1");'
            'if (old !== "192.0.2.1") { throw "old=" + old; }')

    def test_put_intermediate_non_object_throws(self):
        e = Event({"a": "scalar"})
        s = compile_script(H + 'evt.Put("a.b", 1);' + F)
        with pytest.raises(JSThrow):
            s.run(e)

    def test_new_event_constructor(self):
        compile_script(
            'function process(evt) {}'
            'function test() {'
            '  var e = new Event({"a": {"b": 1}});'
            '  if (e.Get("a.b") !== 1) { throw "ctor"; }'
            '}')


# --------------------------------------------- session_test.go contract

class TestSession:
    def test_missing_process(self):
        with pytest.raises(JSError, match="process function not found"):
            compile_script("var x = 1;")

    def test_register_required_for_params(self):
        with pytest.raises(JSError, match="params were provided"):
            compile_script(H + F, params={"x": 1})

    def test_register_params(self):
        compile_script(
            'function register(params) {'
            '  if (params["threshold"] !== 42) { throw "invalid"; }'
            '}' + H + F, params={"threshold": 42})

    def test_register_params_failure_propagates(self):
        with pytest.raises(JSThrow, match="invalid"):
            compile_script(
                'function register(params) { throw "invalid"; }'
                + H + F, params={"x": 1})

    def test_runaway_loop_times_out(self):
        s = compile_script(H + "while (true) {}" + F, max_ops=50_000)
        with pytest.raises(
                JSTimeout,
                match="javascript processor execution timeout"):
            s.run(Event({}))

    def test_compile_time_test_hook(self):
        with pytest.raises(JSThrow, match="broken"):
            compile_script(
                H + F + 'function test() { throw "broken"; }')

    def test_state_persists_across_events(self):
        # register()-established globals persist for the session
        s = compile_script(
            "var count = 0;" + H + 'count++; evt.Put("n", count);' + F)
        _, e1 = s.run(Event({})), None
        e2 = Event({})
        s.run(e2)
        assert e2.fields["n"] == 2

    def test_syntax_error_at_compile(self):
        with pytest.raises(JSSyntaxError):
            compile_script("function process(evt) { var = ; }")

    def test_unsupported_date_raises(self):
        s = compile_script(H + "var d = new Date();" + F)
        with pytest.raises(JSThrow, match="Date is not supported"):
            s.run(Event({}))


# -------------------------------------------------- language semantics

BATTERY = [
    ("var x=0; for(var i=0;i<5;i++){x+=i;} R(x);", 10),
    ("var a=[3,1,2]; a.sort(); R(a.join('-'));", "1-2-3"),
    ("R([1,2,3].map(function(x){return x*2;}).join(','));", "2,4,6"),
    ("R('Hello World'.toLowerCase().split(' ')[1]);", "world"),
    ("R(parseInt('0x1f'));", 31),
    ("R(parseInt('42abc'));", 42),
    ("R(parseFloat('3.5rem'));", 3.5),
    ("R(typeof not_defined);", "undefined"),
    ("R(1 + '2');", "12"),
    ("R('5' * '4');", 20),
    ("R(null == undefined);", True),
    ("R(null === undefined);", False),
    ("R(Math.round(-2.5));", -2),  # JS rounds .5 toward +Infinity
    ("R(Math.round(2.5));", 3),
    ("R(-5 % 3);", -2),            # sign of dividend, not python %
    ("R(JSON.stringify({b:1, a:[1,null]}));", '{"b":1,"a":[1,null]}'),
    ("var o=JSON.parse('{\"k\": [1, 2]}'); R(o.k[1]);", 2),
    ("R(/ab+c/.test('xabbbc'));", True),
    ("var m='key=val'.match(/(\\w+)=(\\w+)/); R(m[2]);", "val"),
    ("R('a-b-c'.replace(/-/g, '_'));", "a_b_c"),
    ("R('a-b-c'.replace('-', '_'));", "a_b-c"),  # string: first only
    ("R('x1'.replace(/(x)(\\d)/, '[$2$1]'));", "[1x]"),
    ("var s=''; for (var k in {a:1,b:2}) { s+=k; } R(s);", "ab"),
    ("R('abcdef'.slice(-3));", "def"),
    ("R('abcdef'.substring(4, 2));", "cd"),  # swaps args
    ("var x=5; switch(x){case 5: x=50; break; default: x=0;} R(x);", 50),
    ("try { null.foo; } catch (e) { R('caught'); }", "caught"),
    ("try { throw {msg:'custom'}; } catch (e) { R(e.msg); }", "custom"),
    ("function f(n){return n<=1?1:n*f(n-1);} R(f(5));", 120),
    ("var add=function(a){return function(b){return a+b;};};"
     "R(add(3)(4));", 7),
    ("R([4,5,6].reduce(function(a,b){return a+b;}, 0));", 15),
    ("R(encodeURIComponent('a b&c'));", "a%20b%26c"),
    ("R(decodeURIComponent('a%20b'));", "a b"),
    ("R(Array.isArray([1]));", True),
    ("R(String.fromCharCode(72, 105));", "Hi"),
    ("R((8).toString(2));", "1000"),
    ("R((3.14159).toFixed(2));", "3.14"),
    ("R(7 & 3);", 3),
    ("R(1 << 4);", 16),
    ("R('b' in {a:1, b:2});", True),
    ("var i=0,s=0; do { s+=i; i++; } while (i<3); R(s);", 3),
    # concat spreads argument arrays ONE level (JS semantics)
    ("R([1,[2,3]].concat([4]).length);", 3),
    ("R([10,1,2].sort().join(','));", "1,10,2"),  # default sort: string
    ("R([10,1,2].sort(function(a,b){return a-b;}).join(','));",
     "1,2,10"),
    ("R(Object.keys({x:1,y:2}).join());", "x,y"),
    ("R('  pad  '.trim());", "pad"),
    ("R('ab'.repeat(3));", "ababab"),
    ("R([1,2,3,4].filter(function(x){return x%2===0;}).join());", "2,4"),
    ("R([1,2,3].indexOf(9));", -1),
    ("R('aaa'.indexOf('a', 1));", 1),
    ("R(isNaN(parseInt('zz')));", True),
    ("R(1/0);", math.inf),
    ("var a={}; a['k']=1; a.k+=2; R(a.k);", 3),
]


@pytest.mark.parametrize("src,expect", BATTERY,
                         ids=[s[:40] for s, _ in BATTERY])
def test_battery(src, expect):
    s = compile_script(
        "function process(out) { function R(v) { out.Put('r', v); }"
        + src + "}")
    e = Event({})
    s.run(e)
    assert e.fields.get("r") == expect


def test_global_regex_lastindex():
    s = compile_script(H + '''
        var rx = /a(\\d)/g;
        var hits = [];
        var m;
        while ((m = rx.exec("a1 b a2 a3")) !== null) { hits.push(m[1]); }
        evt.Put("r", hits.join(","));
    ''' + F)
    e = Event({})
    s.run(e)
    assert e.fields["r"] == "1,2,3"


# ----------------------------------------------------- Spark processor

class TestScriptProcessorSpark:
    def test_full_contract(self, spark):
        from beats_spark.processors import build_processor
        df = spark.createDataFrame(
            [(1, "error", 150.0), (2, "ok", 50.0), (3, "ok", 250.0),
             (7, "ok", 10.0)],
            "id bigint, status string, value double")
        proc = build_processor({"script": {
            "lang": "javascript",
            "source": """
var threshold = 0;
function register(params) { threshold = params.threshold; }
function process(evt) {
    if (evt.Get("id") === 7) { evt.Cancel(); return; }
    evt.Put("band", evt.Get("value") >= threshold ? "high" : "low");
    if (evt.Get("status") === "error") { evt.Tag("err"); }
}
""",
            "params": {"threshold": 100},
            "fields": {"band": "string"},
        }})
        rows = {r["id"]: r for r in proc(df).collect()}
        assert set(rows) == {1, 2, 3}          # 7 cancelled
        assert rows[1]["band"] == "high" and rows[1]["tags"] == ["err"]
        assert rows[2]["band"] == "low" and rows[2]["tags"] is None
        assert rows[3]["band"] == "high"

    def test_exception_contract(self, spark):
        from beats_spark.processors import build_processor
        df = spark.createDataFrame([(1, "boom"), (2, "fine")],
                                   "id bigint, kind string")
        proc = build_processor({"script": {"source": """
function process(evt) {
    evt.Put("touched", true);
    if (evt.Get("kind") === "boom") { throw "kaput"; }
}""", "fields": {"touched": "boolean"}}})
        rows = {r["id"]: r for r in proc(df).collect()}
        # event passes through WITH prior mutations + tag + message
        assert rows[1]["touched"] is True
        assert rows[1]["tags"] == ["_js_exception"]
        assert "kaput" in rows[1]["error.message"]
        assert rows[2]["tags"] is None
        assert rows[2]["error.message"] is None

    def test_config_validation(self):
        from beats_spark.processors import build_processor
        with pytest.raises(ValueError, match="exactly one"):
            build_processor({"script": {
                "source": "function process(e){}",
                "file": "/tmp/x.js"}})

    def test_yaml_front_door(self, spark):
        from beats_spark.config import load_pipeline
        yml = """
processors:
  - script:
      lang: javascript
      source: >
        function process(evt) {
          evt.Put("shout", evt.Get("word").toUpperCase());
        }
      fields:
        shout: string
"""
        df = spark.createDataFrame([("hi",), ("yo",)], "word string")
        out = load_pipeline(yml).transform(df)
        got = sorted(r["shout"] for r in out.collect())
        assert got == ["HI", "YO"]


# ------------------------------- round-3 self-review regressions

class TestReviewRegressions:
    def test_try_finally_runs_once_on_throw(self):
        _, e = run('var c = 0;'
                   'try { try { throw "x"; } finally { c++; } }'
                   'catch (err) {}'
                   'evt.Put("c", c);')
        assert e.fields["c"] == 1

    def test_try_finally_runs_once_normal_and_caught(self):
        _, e = run('var c = 0;'
                   'try { c += 10; } finally { c++; }'
                   'try { throw "y"; } catch (err) { c += 100; }'
                   'finally { c++; }'
                   'evt.Put("c", c);')
        assert e.fields["c"] == 112

    def test_parse_int_empty_and_math_domains(self):
        _, e = run('evt.Put("a", parseInt(""));'
                   'evt.Put("b", Math.sqrt(-1));'
                   'evt.Put("c", Math.log(0));'
                   'evt.Put("d", Math.pow(-1, 0.5));'
                   'evt.Put("e", Math.pow(0, -1));')
        assert math.isnan(e.fields["a"])
        assert math.isnan(e.fields["b"])
        assert e.fields["c"] == -math.inf
        assert math.isnan(e.fields["d"])
        assert e.fields["e"] == math.inf

    def test_native_python_error_is_js_catchable(self):
        # a buggy native argument must surface as a JS throw (the
        # script processor's tag_on_exception contract), not a raw
        # Python exception that kills the Spark task
        _, e = run('var got = "no";'
                   'try { [1,2,3].join(undefined, {bad: true}).x.y; }'
                   'catch (err) { got = "caught"; }'
                   'evt.Put("got", got);')
        assert e.fields["got"] == "caught"

    def test_negative_array_index_write_is_dropped(self):
        _, e = run('var a = [1, 2, 3]; a[-1] = 99; a.foo = 5;'
                   'evt.Put("last", a[2]); evt.Put("len", a.length);'
                   'evt.Put("neg", a[-1]);')
        assert e.fields["last"] == 3
        assert e.fields["len"] == 3
        assert e.fields["neg"] is UNDEFINED

    def test_compound_assign_evaluates_index_once(self):
        _, e = run('var i = 0; var a = [10, 20];'
                   'a[i++] += 1;'
                   'evt.Put("i", i); evt.Put("a0", a[0]);'
                   'var j = 0; var b = [5, 5]; b[j++]++;'
                   'evt.Put("j", j); evt.Put("b0", b[0]);')
        assert e.fields["i"] == 1 and e.fields["a0"] == 11
        assert e.fields["j"] == 1 and e.fields["b0"] == 6

    def test_global_match_still_returns_all(self):
        _, e = run('var m = "a1b2c3".match(/[0-9]/g);'
                   'evt.Put("n", m.length); evt.Put("m0", m[0]);'
                   'evt.Put("none", "xyz".match(/[0-9]/g) === null);')
        assert e.fields["n"] == 3 and e.fields["m0"] == "1"
        assert e.fields["none"] is True
