"""Regression tests for the round-4 review (ADVICE.md) findings:
counter_rates tied-timestamp determinism, cidr_enrich non-canonical
base / empty-dim / duplicate-prefix handling, gapfill_series NULL
observation vs absent bucket, and streaming counter-rate truncation
parity with the batch decimal DIV on negative deltas."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beats_spark.dataops.events import counter_rates, gapfill_series
from beats_spark.processors.enrich import cidr_enrich


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_counter_rates_tied_timestamps_deterministic(spark):
    # two samples at the identical (key, ts): the lag order is now
    # pinned by the counter value, so delta/was_reset on the tied
    # rows cannot vary between runs
    rows = [("h", _ts("2024-01-01T00:00:00"), 10),
            ("h", _ts("2024-01-01T00:00:01"), 30),
            ("h", _ts("2024-01-01T00:00:01"), 20),
            ("h", _ts("2024-01-01T00:00:02"), 40)]
    df = spark.createDataFrame(rows, "host string, ts timestamp, c long")
    out = counter_rates(df, "host", "ts", "c").orderBy("ts", "delta")
    got = [(r["delta"], r["dt_us"], r["was_reset"])
           for r in out.collect()]
    # order by (ts, c): 10 → 20 (dt=1s), 20 → 30 (dt=0, tied), 30 → 40
    assert got == [(10, 1_000_000, False), (10, 0, False),
                   (10, 1_000_000, False)]


def test_cidr_enrich_non_canonical_base_matches(spark):
    facts = spark.createDataFrame([("10.1.1.200",), ("10.2.0.1",)],
                                  "ip string")
    # non-canonical: host bits set in the base; must match its /24
    dims = spark.createDataFrame([("10.1.1.7/24", "asn-a")],
                                 "cidr string, asn string")
    got = {r["ip"]: r["asn"]
           for r in cidr_enrich(facts, dims, "ip").collect()}
    assert got["10.1.1.200"] == "asn-a"
    assert got["10.2.0.1"] is None


def test_cidr_enrich_empty_dim_yields_null_columns(spark):
    facts = spark.createDataFrame([("10.0.0.1",)], "ip string")
    dims = spark.createDataFrame([], "cidr string, asn string")
    out = cidr_enrich(facts, dims, "ip")
    assert "asn" in out.columns
    assert out.collect()[0]["asn"] is None


def test_cidr_enrich_duplicate_canonical_prefix_raises(spark):
    facts = spark.createDataFrame([("10.0.0.1",)], "ip string")
    # distinct spellings, same canonical /24 — a LEFT join against
    # this dim would silently duplicate fact rows
    dims = spark.createDataFrame(
        [("10.0.0.0/24", "a"), ("10.0.0.9/24", "b")],
        "cidr string, asn string")
    with pytest.raises(Exception, match="duplicate canonical prefix"):
        cidr_enrich(facts, dims, "ip").collect()


def test_gapfill_null_observation_is_not_filled(spark):
    rows = [("k", 1, 5), ("k", 3, None)]
    df = spark.createDataFrame(
        rows, "key string, b long, v long")
    out = {r["b"]: (r["v"], r["is_filled"])
           for r in gapfill_series(df, "key", "b", "v").collect()}
    assert out[1] == (5, False)
    assert out[2] == (0, True)      # genuinely absent bucket
    # observed row with NULL value: keeps NULL, NOT flagged filled
    assert out[3] == (None, False)


def test_streaming_rate_truncation_matches_batch_div():
    # replicate the streaming kernel's arithmetic on a negative delta
    # (reset sample whose counter value is negative) and assert it
    # truncates toward zero like decimal DIV, not floor
    d, dtus = -7, 3_000_000
    num = d * 1_000_000_000_000
    trunc = -((-num) // dtus) if num < 0 else num // dtus
    assert trunc == -2333333        # toward zero; floor would be -2333334
    d2 = 7
    num2 = d2 * 1_000_000_000_000
    assert num2 // dtus == 2333333


def test_stateful_counter_rates_negative_reset_parity(spark, tmp_path):
    # batch reference: a reset to a negative counter value
    rows = [("h", _ts("2024-01-01T00:00:00"), 100),
            ("h", _ts("2024-01-01T00:00:03"), -7)]
    df = spark.createDataFrame(rows, "host string, ts timestamp, ctr long")
    batch = counter_rates(df, "host", "ts", "ctr").collect()
    assert len(batch) == 1
    r = batch[0]
    assert r["was_reset"] and r["delta"] == -7
    # batch decimal DIV truncates toward zero
    assert r["rate_micro"] == -(7 * 1_000_000_000_000 // 3_000_000)


def test_stateful_counter_rates_tie_is_late(spark, tmp_path):
    """Streaming counter-rates marks a duplicate (key, ts) sample
    late (dt_us = -1, state untouched) — the documented divergence
    from the batch tiebreaker: state cannot order ties across
    micro-batches, and in-batch ties follow the same rule so
    emission never depends on batch boundaries."""
    import os
    from pyspark.sql import functions as F
    from beats_spark.streaming.pipeline import stateful_counter_rates

    t0 = 1_700_000_000_000_000
    rows = [("h", t0, 10), ("h", t0 + 1_000_000, 30),
            ("h", t0 + 1_000_000, 20), ("h", t0 + 2_000_000, 40)]
    src = str(tmp_path / "src"); os.makedirs(src)
    (spark.createDataFrame(rows, "host string, us long, ctr long")
     .select("host", F.timestamp_micros("us").alias("ts"), "ctr")
     .coalesce(1).write.parquet(os.path.join(src, "b1")))
    stream = (spark.readStream
              .schema("host string, ts timestamp, ctr long")
              .parquet(src + "/*"))
    q = (stateful_counter_rates(stream, "host", "ts", "ctr")
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    lates = out.filter("dt_us = -1").collect()
    # the tie sorts (ts, ctr): 20 processes first, 30 arrives tied
    assert len(lates) == 1 and lates[0].ctr == 30
    ok = {(r.ctr): (r.delta, r.dt_us)
          for r in out.filter("dt_us >= 0").collect()}
    assert ok == {20: (10, 1_000_000), 40: (20, 1_000_000)}
