"""Salted two-phase aggregation: exact equality with plain groupBy
under the fixtures' real Zipf host skew (hottest host ~26% of rows)."""

from pyspark.sql import functions as F

from beats_spark.fixtures import pages
from beats_spark.skew import salted_agg, salted_repartition


def test_salted_agg_equals_plain_groupby(spark):
    pg = pages(spark, 5_000).withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1))
    plain = {(r["host"],): (r["n"], r["b"]) for r in
             pg.groupBy("host").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.length("text")).alias("b")).collect()}
    salted_df = salted_agg(
        pg.withColumn("__len", F.length("text")), ["host"],
        {"n": ("count", ""), "b": ("sum", "__len")}, salts=8)
    salted = {(r["host"],): (r["n"], r["b"])
              for r in salted_df.collect()}
    assert salted == plain
    # the hot host really is hot (skew is present in the fixture)
    counts = sorted((v[0] for v in plain.values()), reverse=True)
    assert counts[0] > 4 * counts[-1]


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest
    pg = pages(spark, 100)
    with pytest.raises(ValueError):
        salted_agg(pg, ["lang"], {"a": ("avg", "warc_ts")})


def test_salted_repartition_spreads_hot_key(spark):
    pg = pages(spark, 2_000).withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1))
    out = salted_repartition(pg, "host", salts=8, partitions=8)
    # the hot host must occupy more than one partition after salting
    hot = (pg.groupBy("host").count()
             .orderBy(F.col("count").desc()).first()["host"])
    parts = (out.filter(F.col("host") == hot)
                .select(F.spark_partition_id().alias("p"))
                .distinct().count())
    assert parts > 1
