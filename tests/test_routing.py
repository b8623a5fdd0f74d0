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


def test_consistent_route_matches_hashlib_replay(spark):
    import hashlib
    from beats_spark.routing import consistent_route
    hosts = ["h1", "h2", "h3"]
    df = spark.createDataFrame([(i,) for i in range(200)],
                               "k long")
    got = {r["k"]: r["host"]
           for r in consistent_route(df, hosts, "k",
                                     vnodes=16).collect()}
    ring = sorted(
        (int(hashlib.md5(f"{h}#{i}#".encode()).hexdigest()[:15], 16),
         h)
        for h in hosts for i in range(16))
    for k in range(200):
        kh = int(hashlib.md5(f"{k}#".encode()).hexdigest()[:15], 16)
        exp = next((h for p, h in ring if p >= kh), ring[0][1])
        assert got[k] == exp, k
    # every host serves someone at this key count
    assert set(got.values()) == set(hosts)


def test_consistent_route_minimal_disruption_on_host_loss(spark):
    from beats_spark.routing import consistent_route
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    full = {r["k"]: r["host"] for r in consistent_route(
        df, ["h1", "h2", "h3", "h4"], "k").collect()}
    less = {r["k"]: r["host"] for r in consistent_route(
        df, ["h1", "h2", "h4"], "k").collect()}
    moved = {k for k in full if full[k] != less[k]}
    # ONLY keys that lived on the removed host move
    assert moved == {k for k, h in full.items() if h == "h3"}
    # and they spread over the survivors, not one successor
    assert len({less[k] for k in moved}) > 1


def test_consistent_route_guards(spark):
    import pytest
    from beats_spark.routing import consistent_route
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        consistent_route(df, [], "k")
    with pytest.raises(ValueError):
        consistent_route(df, ["a", "a"], "k")
    nul = spark.createDataFrame([(None,)], "k string")
    with pytest.raises(Exception):
        consistent_route(nul, ["a", "b"], "k").collect()
