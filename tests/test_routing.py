"""Router + format-string tests, mirroring ``outil/select.go`` and
``fmtstr/formatevents.go`` semantics."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from beats_spark.fmtstr import compile_fmtstr
from beats_spark.routing import route, compile_selector


@pytest.fixture(scope="module")
def events(spark):
    ts = dt.datetime(2024, 3, 15, 12, 0, 0)
    rows = [
        (1, "en", "web", 200, ts, None),
        (2, "de", "app", 500, ts, None),
        (3, "zz", "web", 200, ts, None),
        (4, "fr", None, 404, ts, "forced-index"),
        (5, "en", "app", 200, ts, None),
    ]
    return spark.createDataFrame(
        rows, "id int, lang string, channel string, code int, "
              "ts timestamp, meta_raw_index string")


def vals(df, col="sink"):
    return {r.id: r[col] for r in df.collect()}


def test_fmtstr_fields_and_literals(events):
    c = compile_fmtstr("logs-%{[lang]}-%{[channel]}")
    got = vals(events.withColumn("sink", c))
    assert got[1] == "logs-en-web"
    assert got[4] is None  # missing field nulls the template


def test_fmtstr_default(events):
    c = compile_fmtstr("logs-%{[channel]:none}")
    assert vals(events.withColumn("sink", c))[4] == "logs-none"


def test_fmtstr_timestamp_pattern(events):
    c = compile_fmtstr("idx-%{+yyyy.MM.dd}", timestamp_field="ts")
    assert vals(events.withColumn("sink", c))[1] == "idx-2024.03.15"


def test_first_match_wins(events):
    rules = [
        {"index": "errors", "when": {"range": {"code": {"gte": 500}}}},
        {"index": "dropped", "when": {"equals": {"lang": "zz"}}},
        {"index": "es-%{[channel]}"},
    ]
    got = vals(route(events, rules, default="fallback"))
    assert got[2] == "errors"       # rule order beats rule 3 match
    assert got[3] == "dropped"
    assert got[1] == "es-web"
    assert got[4] == "fallback"     # null channel → template null → default


def test_mappings_with_default(events):
    rules = [{
        "index": "%{[lang]}",
        "mappings": {"en": "english-sink", "de": "german-sink"},
        "default": "other-sink",
    }]
    got = vals(route(events, rules))
    assert got[1] == "english-sink"
    assert got[2] == "german-sink"
    assert got[3] == "other-sink"


def test_meta_override_wins(events):
    rules = [{"index": "es-%{[lang]}"}]
    got = vals(route(events, rules, meta_override="meta_raw_index"))
    assert got[4] == "forced-index"
    assert got[1] == "es-en"


def test_selector_is_jvm_side(events):
    df = events.withColumn("sink", compile_selector(
        [{"index": "a-%{[lang]}", "when": {"equals": {"code": 200}}}],
        default="d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_constant_selector_folds(events):
    # constant rule → Catalyst folds to a literal in the optimized plan
    df = events.withColumn("sink", compile_selector(["just-a-constant"]))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "just-a-constant" in plan
