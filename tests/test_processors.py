"""Processor-chain tests mirroring the per-processor ``_test.go`` tables
(``libbeat/processors/actions/*_test.go``)."""

import pytest

from pyspark.sql import functions as F

from beats_spark.processors import compile_processors, build_processor


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "alpha", "click", 10.5, '{"k": 1, "s": "x"}', "aGVsbG8=", "2024-03-15 10:00:00", "10.0.0.1"),
        (2, "beta", "view", 20.0, '{"k": 2, "s": "y"}', "d29ybGQ=", "15/Mar/2024:11:00:00", "8.8.8.8"),
        (3, "gamma", "error", -1.0, "not-json", None, "bogus", None),
    ]
    return spark.createDataFrame(
        rows, "id int, name string, event_type string, value double, "
              "props string, blob string, raw_ts string, ip string")


def by_id(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_add_fields_and_labels(events):
    t = compile_processors([
        {"add_fields": {"target": "", "fields": {"env": "prod"}}},
        {"add_fields": {"fields": {"team": "core"}}},          # default target
        {"add_labels": {"labels": {"dc": "eu-1"}}},
    ])
    row = by_id(t(events))[1]
    assert row["env"] == "prod"
    assert row["fields_team"] == "core"
    assert row["labels_dc"] == "eu-1"


def test_add_tags_and_append_dedup(events):
    t = compile_processors([
        {"add_tags": {"tags": ["a", "b"]}},
        {"add_tags": {"tags": ["b"]}},                         # no dedup
        {"append": {"target_field": "arr", "values": ["x", "x", "y"],
                    "allow_duplicate": False}},
    ])
    row = by_id(t(events))[1]
    assert row["tags"] == ["a", "b", "b"]
    assert row["arr"] == ["x", "y"]


def test_include_drop_rename_copy(events):
    t = compile_processors([
        {"copy_fields": {"fields": [{"from": "name", "to": "name_copy"}]}},
        {"rename": {"fields": [{"from": "value", "to": "metric"}]}},
        {"drop_fields": {"fields": ["props", "blob"]}},
    ])
    out = t(events)
    assert "metric" in out.columns and "value" not in out.columns
    assert "props" not in out.columns
    assert by_id(out)[1]["name_copy"] == "alpha"

    t2 = build_processor({"include_fields": {"fields": ["id", "name"]}})
    assert set(t2(events).columns) == {"id", "name"}


def test_rename_no_overwrite_existing(events):
    t = build_processor({"rename": {"fields": [{"from": "name", "to": "event_type"}]}})
    out = by_id(t(events))[1]
    assert out["event_type"] == "click"     # target existed → no-op
    assert out["name"] == "alpha"


def test_truncate_tags_log_flags(events):
    t = build_processor({"truncate_fields": {"fields": ["name"], "max_characters": 4}})
    got = by_id(t(events))
    assert got[1]["name"] == "alph" and "truncated" in got[1]["log_flags"]
    assert got(2) if False else got[2]["name"] == "beta"
    assert list(got[2]["log_flags"]) == []


def test_case_and_replace(events):
    t = compile_processors([
        {"uppercase": {"fields": ["name"]}},
        {"replace": {"fields": [{"field": "event_type", "pattern": "click",
                                 "replacement": "tap"}]}},
    ])
    got = by_id(t(events))
    assert got[1]["name"] == "ALPHA"
    assert got[1]["event_type"] == "tap"


def test_convert_modes(events):
    t = build_processor({"convert": {
        "fields": [{"from": "value", "to": "value_int", "type": "integer"}],
        "mode": "copy"}})
    got = by_id(t(events))
    assert got[1]["value_int"] == 10 and got[1]["value"] == 10.5


def test_decode_json_fields(events):
    t = build_processor({"decode_json_fields": {
        "fields": ["props"], "target": "p",
        "schema": "k int, s string"}})
    got = by_id(t(events))
    assert got[1]["p_k"] == 1 and got[1]["p_s"] == "x"
    assert got[3]["p_k"] is None            # bad json → nulls


def test_decode_base64(events):
    t = build_processor({"decode_base64_field": {
        "field": {"from": "blob", "to": "text"}}})
    got = by_id(t(events))
    assert got[1]["text"] == "hello"
    assert got[2]["text"] == "world"
    assert got[3]["text"] is None


def test_timestamp_layouts(events):
    t = build_processor({"timestamp": {
        "field": "raw_ts", "target_field": "@timestamp",
        "layouts": ["yyyy-MM-dd HH:mm:ss", "dd/MMM/yyyy:HH:mm:ss"]}})
    got = by_id(t(events))
    assert str(got[1]["@timestamp"]) == "2024-03-15 10:00:00"
    assert str(got[2]["@timestamp"]) == "2024-03-15 11:00:00"
    assert got[3]["@timestamp"] is None


def test_fingerprint_stable(events, spark):
    t = build_processor({"fingerprint": {"fields": ["name", "event_type"]}})
    a = by_id(t(events))
    b = by_id(t(events))
    assert a[1]["fingerprint"] == b[1]["fingerprint"]
    assert a[1]["fingerprint"] != a[2]["fingerprint"]
    assert len(a[1]["fingerprint"]) == 64    # sha256 hex


def test_when_guard_merges_columns(events):
    t = build_processor({
        "add_fields": {"target": "", "fields": {"flagged": "yes"}},
        "when": {"equals": {"event_type": "error"}},
    })
    got = by_id(t(events))
    assert got[3]["flagged"] == "yes"
    assert got[1]["flagged"] is None


def test_when_guard_is_single_scan(events):
    t = build_processor({
        "uppercase": {"fields": ["name"]},
        "when": {"equals": {"event_type": "click"}},
    })
    out = t(events)
    got = by_id(out)
    assert got[1]["name"] == "ALPHA" and got[2]["name"] == "beta"
    # column-merge strategy: one scan, no union
    assert "Union" not in out._jdf.queryExecution().executedPlan().toString()


def test_if_then_else(events):
    t = build_processor({
        "if": {"range": {"value": {"gte": 15}}},
        "then": [{"add_fields": {"target": "", "fields": {"size": "big"}}}],
        "else": [{"add_fields": {"target": "", "fields": {"size": "small"}}}],
    })
    got = by_id(t(events))
    assert got[2]["size"] == "big"
    assert got[1]["size"] == "small" and got[3]["size"] == "small"


def test_drop_event_with_when(events):
    t = build_processor({
        "drop_event": {},
        "when": {"equals": {"event_type": "error"}},
    })
    assert sorted(by_id(t(events))) == [1, 2]


def test_dissect_processor_in_chain(events, spark):
    df = spark.createDataFrame(
        [(1, "level=info code=200"), (2, "level=warn code=500"), (3, "junk")],
        "id int, message string")
    t = build_processor({"dissect": {
        "tokenizer": "level=%{level} code=%{code|integer}",
        "target_prefix": ""}})
    got = by_id(t(df))
    assert got[1]["level"] == "info" and got[1]["code"] == 200
    assert "dissect_parsing_error" in got[3]["log_flags"]


def test_urldecode_and_extract(events, spark):
    df = spark.createDataFrame([(1, "a%20b", "x:y:z")], "id int, u string, s string")
    t = compile_processors([
        {"urldecode": {"fields": [{"from": "u"}]}},
        {"extract_field": {"field": "s", "separator": ":", "index": 1,
                           "target": "mid"}},
    ])
    got = by_id(t(df))
    assert got[1]["u"] == "a b"
    assert got[1]["mid"] == "y"


def test_decode_duration(events, spark):
    df = spark.createDataFrame(
        [(1, "1h30m"), (2, "250ms"), (3, "2m10s")], "id int, d string")
    t = build_processor({"decode_duration": {"field": "d",
                                             "format": "seconds"}})
    got = by_id(t(df))
    assert got[1]["d"] == pytest.approx(5400.0)
    assert got[2]["d"] == pytest.approx(0.25)
    assert got[3]["d"] == pytest.approx(130.0)


def test_registered_domain(events, spark):
    df = spark.createDataFrame(
        [(1, "www.example.co.uk"), (2, "cdn.site.com"), (3, "com")],
        "id int, host string")
    t = build_processor({"registered_domain": {
        "field": "host", "target_field": "rd",
        "target_subdomain_field": "sub"}})
    got = by_id(t(df))
    assert got[1]["rd"] == "example.co.uk" and got[1]["sub"] == "www"
    assert got[2]["rd"] == "site.com" and got[2]["sub"] == "cdn"
    assert got[3]["rd"] is None


def test_rate_limit(events, spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, "k", base + dt.timedelta(milliseconds=100 * i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, key string, `@timestamp` timestamp")
    t = build_processor({"rate_limit": {"limit": "5/s", "fields": ["key"]}})
    out = t(df)
    # 30 rows over 3 seconds at 10/s → 5 kept per 1s window
    assert out.count() == 15


# ------------------------------------------------- json_schema_profile

def test_json_schema_profile_types_drift_and_hostile(spark):
    from beats_spark.processors.decode import json_schema_profile
    docs = [
        '{"a": 1, "b": "x", "c": true, "d": null, "e": [1], '
        '"f": {"g": 1.5, "h": {"deep": 1}}}',
        '{"a": "1"}',            # type drift: a flips number -> string
        'not json at all',
        None,
        '[1, 2, 3]',             # valid JSON but not an object
    ]
    df = spark.createDataFrame([(d,) for d in docs], "message string")
    got = {(r.path, r.jtype): r.n
           for r in json_schema_profile(df, "message",
                                        max_depth=2).collect()}
    assert got[("a", "number")] == 1 and got[("a", "string")] == 1
    assert got[("b", "string")] == 1
    assert got[("c", "boolean")] == 1
    assert got[("d", "null")] == 1
    assert got[("e", "array")] == 1
    assert got[("f", "object")] == 1
    assert got[("f.g", "number")] == 1
    # depth cap: f.h is reported as object, f.h.deep is NOT expanded
    assert got[("f.h", "object")] == 1
    assert ("f.h.deep", "number") not in got
    # unparseable / non-object docs count under the sentinel
    assert got[("<invalid>", "null")] == 3
