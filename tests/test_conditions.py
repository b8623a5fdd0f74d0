"""Condition-compiler corpus, mirroring
``libbeat/conditions/conditions_test.go`` case tables."""

import pytest

from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (id, type, status, code, ip, msg, tags)
        (1, "http", "OK", 200, "10.1.2.3", "GET /index.html", ["prod"]),
        (2, "http", "ERR", 500, "192.168.1.5", "POST /login failed", ["prod"]),
        (3, "dns", "OK", 0, "8.8.8.8", "query example.com", ["test"]),
        (4, "http", "OK", 404, "127.0.0.1", "GET /missing", None),
        (5, None, "OK", 301, "172.16.0.9", None, ["prod", "canary"]),
    ]
    return spark.createDataFrame(
        rows, "id int, type string, status string, code int, ip string, "
              "msg string, tags array<string>")


def ids(df, cond):
    return sorted(r.id for r in df.filter(cond).select("id").collect())


def test_equals_string(events):
    assert ids(events, compile_condition({"equals": {"type": "http"}})) == [1, 2, 4]


def test_equals_int_and_multi_field_conjunctive(events):
    c = compile_condition({"equals": {"type": "http", "code": 200}})
    assert ids(events, c) == [1]


def test_equals_missing_value_is_false(events):
    assert ids(events, compile_condition({"equals": {"type": "nope"}})) == []


def test_contains(events):
    assert ids(events, compile_condition({"contains": {"msg": "GET"}})) == [1, 4]


def test_regexp(events):
    c = compile_condition({"regexp": {"msg": r"^GET /\w+$"}})
    assert ids(events, c) == [4]


def test_range_conjunctive(events):
    c = compile_condition({"range": {"code": {"gte": 400, "lt": 500}}})
    assert ids(events, c) == [4]


def test_has_fields(events):
    assert ids(events, compile_condition({"has_fields": ["type", "msg"]})) == [1, 2, 3, 4]


def test_network_private(events):
    c = compile_condition({"network": {"ip": "private"}})
    assert ids(events, c) == [1, 2, 5]


def test_network_cidr_list_is_or(events):
    c = compile_condition({"network": {"ip": ["127.0.0.0/8", "8.8.8.0/24"]}})
    assert ids(events, c) == [3, 4]


def test_network_public(events):
    assert ids(events, compile_condition({"network": {"ip": "public"}})) == [3]


def test_network_loopback(events):
    assert ids(events, compile_condition({"network": {"ip": "loopback"}})) == [4]


def test_and_or_not(events):
    c = compile_condition({
        "and": [
            {"equals": {"type": "http"}},
            {"or": [
                {"range": {"code": {"gte": 500}}},
                {"not": {"equals": {"status": "OK"}}},
            ]},
        ]
    })
    assert ids(events, c) == [2]


def test_condition_is_plan_side_no_python(events):
    """v4 CIDR conditions must stay fully JVM-side (no Python UDF
    nodes — pushdown-eligible mask arithmetic); named-network specs
    may carry exactly ONE Arrow node for the IPv6/mapped-v4 rows the
    mask arithmetic can't see."""
    df = events.filter(compile_condition(
        {"network": {"ip": ["10.0.0.0/8", "192.168.0.0/16"]}}))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan

    named = events.filter(compile_condition({"network": {"ip": "private"}}))
    nplan = named._jdf.queryExecution().executedPlan().toString()
    assert nplan.count("ArrowEvalPython") <= 1


def test_nested_condition_bodies_are_field_paths(spark):
    # config loaders may deliver 'log.flags: x' as {'log': {'flags':
    # 'x'}}; both spellings must compile to the same field-path
    # condition (the struct column log.flags)
    from beats_spark.conditions import compile_condition
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, ("x", 10.0)), (2, ("y", 99.0))],
        "id int, log struct<flags: string, pct: double>")
    for body in ({"log.flags": "x"}, {"log": {"flags": "x"}}):
        got = [r["id"] for r in
               df.filter(compile_condition({"equals": body})).collect()]
        assert got == [1], body
    for body in ({"log.pct": {"gte": 50}},
                 {"log": {"pct": {"gte": 50}}}):
        got = [r["id"] for r in
               df.filter(compile_condition({"range": body})).collect()]
        assert got == [2], body


def test_network_condition_single_kernel_many_specs(spark):
    from beats_spark.conditions import compile_condition
    df = spark.createDataFrame(
        [("10.0.0.1",), ("2001:db8::1",), ("8.8.8.8",)], "ip string")
    cond = compile_condition({"network": {
        "ip": ["private", "loopback", "2001:db8::/32", "multicast"]}})
    out = df.filter(cond)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1
    assert sorted(r["ip"] for r in out.collect()) == \
        ["10.0.0.1", "2001:db8::1"]


def test_misspelled_range_op_still_raises_value_error(spark):
    from beats_spark.conditions import compile_condition
    with pytest.raises(ValueError, match="unknown range op"):
        compile_condition({"range": {"cpu": {"pct": {"eq": 5}}}})


def test_bad_range_spec_shapes_raise_value_error(spark):
    from beats_spark.conditions import compile_condition
    with pytest.raises(ValueError, match="non-empty mapping"):
        compile_condition({"range": {"cpu": {}}})
    with pytest.raises(ValueError, match="non-empty mapping"):
        compile_condition({"range": {"cpu.pct": 0.5}})
