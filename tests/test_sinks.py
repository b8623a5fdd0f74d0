"""Outputs/codecs: json + format codecs, fileout path fmtstr, kafka
shaping, dead-letter split, per-sink writes."""

import glob
import json
import os

from pyspark.sql import functions as F

from beats_spark.sinks import (
    codec_json, codec_format, write_fileout, kafka_shape,
    split_dead_letter, write_sinks,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "click", 2.5), (2, "error", 0.5), (3, "view", 9.0)],
        "id bigint, etype string, score double")


def test_codec_json_roundtrip(spark):
    row = codec_json(_df(spark)).collect()[0]
    assert json.loads(row["value"]) == {"id": 1, "etype": "click",
                                        "score": 2.5}


def test_codec_format(spark):
    row = codec_format(_df(spark), "ev=%{[etype]} id=%{[id]}").collect()[0]
    assert row["value"] == "ev=click id=1"


def test_write_fileout_path_template(spark, tmp_path):
    out = str(tmp_path / "fileout")
    write_fileout(_df(spark), out, path_template="logs-%{[etype]}")
    dirs = {os.path.basename(p) for p in glob.glob(out + "/__path=*")}
    assert dirs == {"__path=logs-click", "__path=logs-error",
                    "__path=logs-view"}
    lines = spark.read.text(out + "/__path=logs-click").collect()
    assert json.loads(lines[0]["value"])["id"] == 1


def test_kafka_shape_hash(spark):
    shaped = kafka_shape(_df(spark).withColumn("sink", F.lit("t1")),
                         partitioner="hash", key_fields=["etype"],
                         num_partitions=4)
    assert [f.name for f in shaped.schema] == ["topic", "key", "value"]
    rows = shaped.collect()
    assert {r["key"] for r in rows} == {"click", "error", "view"}
    # Connect-safe partitioner check (no RDD handle): every key's rows
    # land in ONE partition, and all partition ids are < num_partitions
    placed = (shaped.select("key", F.spark_partition_id().alias("p"))
              .groupBy("key")
              .agg(F.countDistinct("p").alias("d"), F.max("p").alias("m"))
              .collect())
    assert all(r["d"] == 1 for r in placed)
    assert all(r["m"] < 4 for r in placed)


def test_split_dead_letter(spark):
    parts = split_dead_letter(_df(spark), F.col("score") > 1.0)
    assert parts["ok"].count() == 2
    assert parts["dead_letter"].count() == 1


def test_write_sinks_shapes(spark, tmp_path):
    out = str(tmp_path / "sinks")
    routed = _df(spark).withColumn(
        "sink", F.when(F.col("etype") == "error", "sink_err")
                 .otherwise("sink_ok"))
    write_sinks(routed, out,
                shapes={"sink_ok": lambda d: codec_json(d, "value")})
    ok = spark.read.parquet(os.path.join(out, "sink_ok"))
    err = spark.read.parquet(os.path.join(out, "sink_err"))
    assert ok.count() == 2 and "value" in ok.columns
    assert err.count() == 1 and "value" not in err.columns


def test_write_sinks_known_names_skip_discovery(spark, tmp_path):
    # passing the routing table's sink list skips the distinct() scan;
    # names with no rows still produce (empty) sink outputs
    out = str(tmp_path / "sinks2")
    routed = _df(spark).withColumn("sink", F.lit("sink_ok"))
    write_sinks(routed, out, sinks=["sink_ok", "sink_idle"])
    ok = spark.read.parquet(os.path.join(out, "sink_ok"))
    idle = spark.read.parquet(os.path.join(out, "sink_idle"))
    assert ok.count() == 3
    assert idle.count() == 0


# ---- ttl batch split (SplitRetry port) ------------------------------

def _split_retry_reference(sizes, cap):
    """Direct port of the reference recursion for cross-checking:
    SplitRetry halves at len/2 (ttl_batch.go:125) until the sub-batch
    fits; an unsplittable single event over the cap is the ES client's
    drop-with-permanent-error case."""
    out = []
    def rec(lo, hi):
        if sum(sizes[lo:hi]) <= cap or hi - lo < 2:
            out.append((lo, hi, hi - lo == 1 and sizes[lo] > cap))
            return
        mid = lo + (hi - lo) // 2
        rec(lo, mid)
        rec(mid, hi)
    if sizes:
        rec(0, len(sizes))
    return out


def test_ttl_batch_split_matches_reference_recursion(spark):
    from beats_spark.sinks import ttl_batch_split
    # deterministic uneven sizes incl. one oversized singleton
    sizes = [(7 * i * i + 3) % 97 + 1 for i in range(50)]
    sizes[17] = 500
    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(sizes)],
        "batch bigint, event_id bigint, nbytes bigint")
    got = (ttl_batch_split(df, "nbytes", max_batch_bytes=200)
           .orderBy("event_id").collect())

    expect = _split_retry_reference(sizes, 200)
    by_lo = {}
    for lo, hi, too in expect:
        for i in range(lo, hi):
            by_lo[i] = (lo, too and i == lo)
    assert [(r["sub_batch"], r["too_large"]) for r in got] == \
        [by_lo[i] for i in range(50)]
    # every sub-batch fits the cap unless it is a flagged singleton
    from collections import defaultdict
    totals = defaultdict(int)
    for r in got:
        totals[r["sub_batch"]] += sizes[r["event_id"]]
    for lo, hi, too in expect:
        assert totals[lo] <= 200 or (hi - lo == 1 and too)


def test_ttl_batch_split_exactly_once_and_dead_letter(spark):
    from beats_spark.sinks import ttl_batch_split, split_dead_letter
    rows = [(i // 10, i, 30 if i % 23 else 400) for i in range(100)]
    df = spark.createDataFrame(
        rows, "batch bigint, event_id bigint, nbytes bigint")
    out = ttl_batch_split(df, "nbytes", max_batch_bytes=128)
    # exactly-once: the union of sub-batches is the original multiset
    assert out.count() == 100
    assert (out.select("event_id").distinct().count() == 100)
    parts = split_dead_letter(out, ~F.col("too_large"))
    n_dead = parts["dead_letter"].count()
    assert n_dead == sum(1 for _, i, s in rows if s > 128)
    assert parts["ok"].count() + n_dead == 100


def test_write_sinks_max_records_per_file(spark, tmp_path):
    import glob
    out = str(tmp_path / "sinks3")
    df = spark.range(97).select(
        F.col("id").alias("event_id"),
        F.lit("sink_ok").alias("sink")).coalesce(1)
    write_sinks(df, out, sinks=["sink_ok"], max_records_per_file=10)
    back = spark.read.parquet(os.path.join(out, "sink_ok"))
    assert back.count() == 97          # split, never dropped
    files = glob.glob(os.path.join(out, "sink_ok", "*.parquet"))
    assert len(files) >= 10
    for f in files:
        assert spark.read.parquet(f).count() <= 10


def test_ttl_batch_split_plan_single_exchange(spark):
    """One hash exchange on the batch key into one Pandas group stage
    — the shuffle carries only (batch, event_id, nbytes) rows."""
    df = spark.range(200).select(
        (F.col("id") / 32).cast("bigint").alias("batch"),
        F.col("id").alias("event_id"),
        (F.col("id") % 7 + 1).alias("nbytes"))
    from beats_spark.sinks import ttl_batch_split
    out = ttl_batch_split(df, "nbytes", max_batch_bytes=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_es_bulk_shape_reference_encoding(spark):
    """Bulk action/source encoding per
    ``outputs/elasticsearch/client.go:361-423``: create default,
    index on request, delete without source, omitempty id/pipeline,
    delete-without-id is an encode error (the event-drop case)."""
    from beats_spark.sinks import es_bulk_shape
    df = spark.createDataFrame(
        [("logs-a", "id1", "create", None, "hello", 7),
         ("logs-b", None, "index", "geoip", "world", 8),
         ("logs-c", None, "delete", None, "x", 9),
         ("logs-d", "id4", "delete", None, "y", 10)],
        "sink string, doc_id string, op string, pipe string, "
        "msg string, n int")
    out = {r["_index"]: r for r in es_bulk_shape(
        df, "sink", id_col="doc_id", op_col="op",
        pipeline_col="pipe", columns=["msg", "n"]).collect()}
    assert out["logs-a"]["bulk_action"] == \
        '{"create":{"_index":"logs-a","_id":"id1"}}'
    assert out["logs-a"]["bulk_source"] == '{"msg":"hello","n":7}'
    assert out["logs-b"]["bulk_action"] == \
        '{"index":{"_index":"logs-b","pipeline":"geoip"}}'
    # delete: no source line; requires _id
    assert out["logs-d"]["bulk_action"] == \
        '{"delete":{"_index":"logs-d","_id":"id4"}}'
    assert out["logs-d"]["bulk_source"] is None
    assert out["logs-c"]["bulk_error"] == "delete requires _id"
    assert out["logs-c"]["bulk_action"] is None


def test_lumberjack_window_policy_reference_vectors():
    """window_test.go ported: shrink floors at 1; growth converges to
    min(batch, max); an unproven max_ok caps growth."""
    from beats_spark.sinks import LumberjackWindow
    w = LumberjackWindow(124, 2048)
    for _ in range(100):
        w.shrink()
    assert w.get() == 1

    def grow(initial, max_ok, max_w, batch, expected):
        w = LumberjackWindow(initial, max_w)
        w.max_ok_window_size = max_ok
        for _ in range(100):
            w.try_grow(batch)
        assert w.get() == expected
        assert w.max_ok_window_size == expected

    grow(10, 0, 1024, 114, 114)   # up to batch size
    grow(10, 0, 64, 114, 64)      # up to max window
    grow(1, 0, 1024, 114, 114)    # from 1
    grow(1, 71, 1024, 114, 71)    # capped by unproven max_ok


def test_lumberjack_frames_wire_layout(spark):
    from beats_spark.sinks import lumberjack_frames
    df = spark.createDataFrame(
        [(7, 1, "a"), (7, 2, "b")], "b long, seq long, msg string")
    rows = {(r["kind"], r["seq"]): bytes(r["frame"]) for r in
            lumberjack_frames(df, "b", "seq").collect()}
    # window frame: '2' 'W' + BE count
    assert rows[("W", None)] == b"2W" + (2).to_bytes(4, "big")
    f = rows[("J", 1)]
    payload = b'{"msg":"a"}'
    assert f == (b"2J" + (1).to_bytes(4, "big")
                 + len(payload).to_bytes(4, "big") + payload)
