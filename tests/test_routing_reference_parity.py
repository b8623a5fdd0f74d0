"""outil selector parity: the TestSelector table from
``libbeat/outputs/outil/select_test.go`` re-expressed against
``compile_selector``. Each case is (rules, event row, want,
lowercase); a missing event field is a null column in the
schema-bound engine."""

import pytest
from pyspark.sql import functions as F

from beats_spark.routing import compile_selector

# (name, rules, event{key,test}, lowercase, want) — select_test.go:40-270
CASES = [
    ("constant key", ["value"], {}, False, "value"),
    ("lowercase constant key", ["vAlUe"], {}, True, "value"),
    ("do not lowercase constant key by default",
     ["VaLuE"], {}, False, "VaLuE"),
    ("format string key", ["%{[key]}"], {"key": "value"}, False, "value"),
    ("lowercase format string key",
     ["%{[key]}"], {"key": "VaLuE"}, True, "value"),
    ("do not lowercase format string by default",
     ["%{[key]}"], {"key": "VaLuE"}, False, "VaLuE"),
    ("constant in multi key", [{"index": "value"}], {}, False, "value"),
    ("format string in multi key",
     [{"index": "%{[key]}"}], {"key": "value"}, False, "value"),
    ("missing format string key with default in rule",
     [{"index": "%{[key]}", "default": "value"}], {}, False, "value"),
    ("lowercase missing format string key with default in rule",
     [{"index": "%{[key]}", "default": "vAlUe"}], {}, True, "value"),
    ("do not lowercase missing fmtstr default",
     [{"index": "%{[key]}", "default": "vAlUe"}], {}, False, "vAlUe"),
    ("empty format string key with default in rule",
     [{"index": "%{[key]}", "default": "value"}], {"key": ""}, False,
     "value"),
    ("lowercase empty fmtstr default",
     [{"index": "%{[key]}", "default": "vAluE"}], {"key": ""}, True,
     "value"),
    ("missing format string key with constant in next rule",
     [{"index": "%{[key]}"}, {"index": "value"}], {}, False, "value"),
    ("apply mapping",
     [{"index": "%{[key]}", "mappings": {"v": "value"}}],
     {"key": "v"}, False, "value"),
    ("lowercase applied mapping",
     [{"index": "%{[key]}", "mappings": {"v": "vAlUe"}}],
     {"key": "v"}, True, "value"),
    ("apply mapping with default on empty key",
     [{"index": "%{[key]}", "default": "value",
       "mappings": {"v": "v"}}], {"key": ""}, False, "value"),
    ("apply mapping with default on empty lookup",
     [{"index": "%{[key]}", "default": "value",
       "mappings": {"v": ""}}], {"key": "v"}, False, "value"),
    ("apply mapping without match",
     [{"index": "%{[key]}", "mappings": {"v": "v"}},
      {"index": "value"}], {"key": "x"}, False, "value"),
    ("mapping with constant key",
     [{"index": "v", "mappings": {"v": "value"}}], {}, False, "value"),
    ("mapping with missing constant key",
     [{"index": "missing", "mappings": {"v": "v"}},
      {"index": "value"}], {}, False, "value"),
    ("mapping with missing constant key, but default",
     [{"index": "missing", "mappings": {"v": "v"},
       "default": "value"}], {}, False, "value"),
    ("matching condition",
     [{"index": "value", "when": {"equals": {"test": "test"}}}],
     {"test": "test"}, False, "value"),
    ("failing condition",
     [{"index": "wrong", "when": {"equals": {"test": "test"}}},
      {"index": "value"}], {"test": "x"}, False, "value"),
]


@pytest.mark.parametrize("name,rules,event,lower,want",
                         CASES, ids=[c[0] for c in CASES])
def test_selector_reference_case(spark, name, rules, event, lower, want):
    df = spark.createDataFrame(
        [(event.get("key"), event.get("test"))],
        "key string, test string")
    sel = compile_selector(rules, key="index", lowercase=lower,
                           timestamp_field="key")
    got = df.select(sel.alias("s")).collect()[0]["s"]
    assert got == want, name
