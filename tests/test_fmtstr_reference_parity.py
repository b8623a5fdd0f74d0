"""fmtstr parity: the TestEventFormatString table from
``libbeat/common/fmtstr/formatevents_test.go`` re-expressed against
``compile_fmtstr`` (nested access, defaults, repeated fields, Joda
timestamp patterns, the ISO8601 rendering of ``%{[@timestamp]}``)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beats_spark.fmtstr import compile_fmtstr

TS = dt.datetime(2015, 5, 1, 20, 12, 34)

# (name, template, row{key,key1,key2,nested_key}, expected)
CASES = [
    ("no fields configured", "format string", {}, "format string"),
    ("expand event field", "%{[key]}", {"key": "value"}, "value"),
    ("expand with default", "%{[key]:default}", {}, "default"),
    ("expand nested event field", "%{[nested.key]}",
     {"nested_key": "value"}, "value"),
    ("expand nested event field (alt. syntax)", "%{[nested][key]}",
     {"nested_key": "value"}, "value"),
    ("multiple event fields", "%{[key1]} - %{[key2]}",
     {"key1": "v1", "key2": "v2"}, "v1 - v2"),
    ("same fields", "%{[key]} - %{[key]}", {"key": "value"},
     "value - value"),
    ("same fields with default (first)", "%{[key]:default} - %{[key]}",
     {"key": "value"}, "value - value"),
    ("same fields with default (second)", "%{[key]} - %{[key]:default}",
     {"key": "value"}, "value - value"),
    ("timestamp formatter", "%{[key]}: %{+YYYY.MM.dd}",
     {"key": "timestamp"}, "timestamp: 2015.05.01"),
    ("timestamp field renders ISO8601", "%{[@timestamp]}: %{+YYYY.MM.dd}",
     {"key": "timestamp"}, "2015-05-01T20:12:34.000Z: 2015.05.01"),
]


@pytest.mark.parametrize("name,template,row,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_fmtstr_reference_case(spark, name, template, row, expected):
    # the engine's flat-column convention: beats path `nested.key`
    # (either spelling) is the column `nested_key`
    df = spark.createDataFrame(
        [(row.get("key"), row.get("key1"), row.get("key2"),
          row.get("nested_key"), TS)],
        "key string, key1 string, key2 string, nested_key string, "
        "ts timestamp"
    ).withColumnRenamed("ts", "@timestamp")
    got = df.select(
        compile_fmtstr(template).alias("s")).collect()[0]["s"]
    assert got == expected, name


def test_year_boundary_joda_Y_is_calendar_year(spark):
    # Joda YYYY = year-of-era; Spark's Y = week-based year, which says
    # "2016" on 2015-12-31 — the mapping must yield the calendar year
    df = spark.createDataFrame(
        [(dt.datetime(2015, 12, 31, 12, 0, 0),)], "`@timestamp` timestamp")
    got = df.select(compile_fmtstr("%{+YYYY.MM.dd}").alias("s")) \
            .collect()[0]["s"]
    assert got == "2015.12.31"


def test_missing_column_with_default_routes(spark):
    # an absent COLUMN (not just a null value) degrades to the
    # fmtstr default instead of an analysis error when routing
    from beats_spark.routing import route
    df = spark.createDataFrame([("a",)], "present string")
    out = route(df, [{"index": "%{[gone.field]:fallback}"}],
                timestamp_field="present")
    assert out.collect()[0]["sink"] == "fallback"
    # and with no default, the rule yields nothing -> next rule wins
    out2 = route(df, [{"index": "%{[gone]}"}, {"index": "next"}],
                 timestamp_field="present")
    assert out2.collect()[0]["sink"] == "next"


def test_joda_year_of_era_with_week_field(spark):
    # Joda Y is ALWAYS year-of-era: %{+YYYY.ww} on 2025-12-29 renders
    # the calendar year 2025 (Joda), not the ISO week-year 2026 that
    # Java's Y would produce; Joda's weekyear is x -> Java Y
    from pyspark.sql import functions as F
    from beats_spark.fmtstr import compile_fmtstr
    df = spark.createDataFrame([("2025-12-29 10:00:00",)], "ts string") \
        .withColumn("@timestamp", F.to_timestamp("ts"))
    out = df.select(
        compile_fmtstr("%{+YYYY.ww}").alias("a"),
        compile_fmtstr("%{+xxxx.ww}").alias("b"),
        compile_fmtstr("%{+yyyy'Y'}").alias("c")).collect()[0]
    assert out["a"].startswith("2025.")
    assert out["b"].startswith("2026.")   # weekyear of Dec 29 2025
    assert out["c"] == "2025Y"            # quoted literal untouched


def test_joda_week_min_digit_and_two_digit_year(spark):
    # Joda letter counts are MINIMUM digits (never truncate); the
    # two-letter weekyear means "last two digits"
    from pyspark.sql import functions as F
    from beats_spark.fmtstr import compile_fmtstr
    df = spark.createDataFrame([("2026-12-28 10:00:00",)], "ts string") \
        .withColumn("@timestamp", F.to_timestamp("ts"))
    got = df.select(
        compile_fmtstr("%{+w}").alias("w1"),      # ISO week 53 of 2026
        compile_fmtstr("%{+www}").alias("w3"),
        compile_fmtstr("%{+xx}").alias("x2"),
        compile_fmtstr("%{+xxxxx}").alias("x5")).collect()[0]
    assert got["w1"] == "53"
    assert got["w3"] == "053"
    assert got["x2"] == "26"
    assert got["x5"] == "02026"
