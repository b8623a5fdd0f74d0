"""Catalog (parquet+manifest snapshot table) + incremental pipeline
resume."""

import os

from pyspark.sql import functions as F

from beats_spark.catalog import Catalog
from beats_spark.fixtures import pages, host_meta, lang_meta
from beats_spark.pipeline import run_pipeline_incremental


def test_snapshots_append_overwrite_timetravel(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    t = cat.table("events")
    df1 = spark.range(0, 10).withColumnRenamed("id", "x")
    df2 = spark.range(10, 15).withColumnRenamed("id", "x")
    s1 = t.append(df1)
    s2 = t.append(df2)
    assert t.read(spark).count() == 15
    assert t.read(spark, as_of=s1).count() == 10
    snaps = t.snapshots()
    assert [s.operation for s in snaps] == ["append", "append"]
    assert snaps[1].parent_id == s1 and snaps[1].rows == 5

    s3 = t.overwrite(spark.range(0, 3).withColumnRenamed("id", "x"))
    assert t.read(spark).count() == 3
    assert t.read(spark, as_of=s2).count() == 15
    assert t.current_snapshot() == s3


def test_read_incremental(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    t = cat.table("t")
    s1 = t.append(spark.range(5))
    df, ids = t.read_incremental(spark, set())
    assert df.count() == 5 and ids == [s1]
    s2 = t.append(spark.range(7))
    df, ids = t.read_incremental(spark, {s1})
    assert df.count() == 7 and ids == [s2]
    df, ids = t.read_incremental(spark, {s1, s2})
    assert df is None and ids == []


def test_incremental_pipeline_resume(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    out = str(tmp_path / "out")
    t = cat.table("pages")
    hm, lm = host_meta(spark), lang_meta(spark)

    t.append(pages(spark, 200))
    r1 = run_pipeline_incremental(spark, t, hm, lm, out)
    assert not r1.skipped and r1.metrics["events.total"] == 400

    # nothing new → skipped, no reprocessing
    r2 = run_pipeline_incremental(spark, t, hm, lm, out)
    assert r2.skipped

    # a new snapshot arrives → only ITS pages are processed
    t.append(pages(spark, 50))
    r3 = run_pipeline_incremental(spark, t, hm, lm, out)
    assert not r3.skipped and r3.metrics["events.total"] == 100

    # total routed rows across runs == both snapshots' events
    import glob
    total = sum(spark.read.parquet(p).count()
                for p in glob.glob(os.path.join(out, "runs", "*", "routed")))
    assert total == 500


def test_incremental_per_snapshot_granularity(spark, tmp_path):
    # three snapshots land while the pipeline is down; per_snapshot mode
    # processes and ACKs each one individually with its own accurate
    # event count (the crash-granularity contract: at most one snapshot
    # in flight)
    cat = Catalog(str(tmp_path / "cat"))
    out = str(tmp_path / "out")
    t = cat.table("pages")
    hm, lm = host_meta(spark), lang_meta(spark)
    for n in (100, 50, 25):
        t.append(pages(spark, n))

    r = run_pipeline_incremental(spark, t, hm, lm, out, per_snapshot=True)
    assert r.sub_runs is not None and len(r.sub_runs) == 3
    assert [x.metrics["events.total"] for x in r.sub_runs] == [200, 100, 50]

    # every snapshot individually watermarked — a rerun skips all
    r2 = run_pipeline_incremental(spark, t, hm, lm, out, per_snapshot=True)
    assert r2.skipped

    # each run's watermark carries ITS snapshot count (not combined)
    import glob as _glob
    import json as _json
    wm = [_json.load(open(p))
          for p in _glob.glob(os.path.join(out, "_watermarks", "*.json"))]
    assert sorted(w["events_total"] for w in wm) == [50, 100, 200]


def test_schema_evolution_additive(spark, tmp_path):
    """Iceberg-style additive evolution: an append with a new column
    reads back with NULLs for pre-evolution rows; time travel to the
    old snapshot still sees the old schema."""
    cat = Catalog(str(tmp_path))
    t = cat.table("ev")
    s1 = t.append(spark.range(0, 3).withColumnRenamed("id", "x"))
    t.append(spark.range(3, 5).withColumnRenamed("id", "x")
             .withColumn("lang", F.lit("en")))
    full = t.read(spark)
    assert set(full.columns) == {"x", "lang"}
    rows = {r["x"]: r["lang"] for r in full.collect()}
    assert rows[0] is None and rows[4] == "en"
    # time travel to pre-evolution snapshot: old schema only
    assert t.read(spark, as_of=s1).columns == ["x"]
    # incremental resume also merges schemas
    df, ids = t.read_incremental(spark, processed=set())
    assert set(df.columns) == {"x", "lang"} and len(ids) == 2


def test_compact_and_expire(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    t = cat.table("c")
    s1 = t.append(spark.range(0, 5).withColumnRenamed("id", "x"))
    s2 = t.append(spark.range(5, 8).withColumnRenamed("id", "x"))
    cid = t.compact(spark)
    assert cid is not None
    assert t.read(spark).count() == 8
    assert [s.operation for s in t.snapshots()][-1] == "compact"
    # live chain collapsed to one snapshot; compacting again no-ops
    assert t.compact(spark) is None
    # history intact until expiry
    assert t.read(spark, as_of=s1).count() == 5
    expired = set(t.expire_snapshots())
    assert expired == {s1, s2}
    assert t.read(spark).count() == 8          # live state unaffected
    import pytest
    with pytest.raises(Exception):
        t.read(spark, as_of=s1).count()        # data gone, loudly


def test_delete_where_copy_on_write(spark, tmp_path):
    from pyspark.sql import functions as F
    cat = Catalog(str(tmp_path))
    t = cat.table("d")
    s1 = t.append(spark.range(0, 10).withColumnRenamed("id", "x")
                  .withColumn("flag", F.when(F.col("x") % 3 == 0, True)))
    did = t.delete_where(spark, "flag")      # NULL flag rows are KEPT
    assert did is not None
    left = sorted(r["x"] for r in t.read(spark).collect())
    assert left == [x for x in range(10) if x % 3 != 0]
    # pre-delete time travel still shows everything
    assert t.read(spark, as_of=s1).count() == 10
    # delete is a reset op: a later append chains on top of it
    t.append(spark.range(100, 101).withColumnRenamed("id", "x")
             .withColumn("flag", F.lit(False)))
    assert t.read(spark).count() == len(left) + 1
