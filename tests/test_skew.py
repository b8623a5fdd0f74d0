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


class TestSaltedJoin:
    def test_result_matches_plain_join(self, spark):
        from beats_spark.skew import salted_join
        big = spark.createDataFrame(
            [(k, i) for i in range(300) for k in
             ([1] * 3 + [2])], ["k", "v"])  # key 1 is 3x hot
        dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                    ["k", "label"])
        got = salted_join(big, dim, "k", salts=4) \
            .groupBy("k", "label").count().collect()
        want = big.join(dim, "k") \
            .groupBy("k", "label").count().collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_left_keeps_unmatched_once(self, spark):
        from beats_spark.skew import salted_join
        big = spark.createDataFrame([(1, 10), (99, 20)], ["k", "v"])
        dim = spark.createDataFrame([(1, "a")], ["k", "label"])
        out = salted_join(big, dim, "k", salts=4, how="left").collect()
        assert len(out) == 2
        assert {r.k: r.label for r in out} == {1: "a", 99: None}

    def test_spreads_hot_key_over_salts(self, spark):
        from beats_spark.skew import salted_join
        from pyspark.sql import functions as F
        big = spark.createDataFrame([(1, i) for i in range(400)],
                                    ["k", "v"])
        salts = 8
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(salts))
        n_shards = big.select(salt.alias("s")).distinct().count()
        assert n_shards >= salts - 1  # one key really fans out

    def test_how_guard(self, spark):
        from beats_spark.skew import salted_join
        df = spark.createDataFrame([(1, 2)], ["k", "v"])
        import pytest as _pt
        with _pt.raises(ValueError, match="inner or left"):
            salted_join(df, df, "k", how="full")

    def test_salt_on_spreads_identical_rows(self, spark):
        """Byte-identical hot rows share a full-row salt (documented);
        salt_on with a distinguishing column restores the spread."""
        from beats_spark.skew import salted_join
        from pyspark.sql import functions as F
        big = spark.createDataFrame(
            [(1, "same", i) for i in range(64)], ["k", "payload", "rid"])
        full = F.pmod(F.xxhash64(F.col("k"), F.col("payload")),
                      F.lit(8))
        assert big.select(full.alias("s")).distinct().count() == 1
        dim = spark.createDataFrame([(1, "a")], ["k", "label"])
        out = salted_join(big, dim, "k", salts=8,
                          salt_on=["k", "rid"])
        assert out.count() == 64
        import pytest as _pt
        with _pt.raises(ValueError, match="salt_on"):
            salted_join(big, dim, "k", salt_on=["nope"])

    def test_empty_salt_on_rejected(self, spark):
        from beats_spark.skew import salted_join
        df = spark.createDataFrame([(1, 2)], ["k", "v"])
        import pytest as _pt
        with _pt.raises(ValueError, match="at least one"):
            salted_join(df, df, "k", salt_on=[])


class TestChunkedRangeJoin:
    def _ranges(self, spark):
        return spark.createDataFrame(
            [(0, 99, "low"), (100, 999, "mid"), (1000, 5000, "high")],
            ["range_start", "range_end", "tier"])

    def test_matches_between_semantics(self, spark):
        from beats_spark.skew import chunked_range_join
        facts = spark.createDataFrame(
            [(1, 0), (2, 99), (3, 100), (4, 999), (5, 1000),
             (6, 5000), (7, 5001), (8, 550)], ["fid", "v"])
        out = {r.fid: r.tier for r in chunked_range_join(
            facts, self._ranges(spark), "v", chunk_bits=4).collect()}
        assert out == {1: "low", 2: "low", 3: "mid", 4: "mid",
                       5: "high", 6: "high", 7: None, 8: "mid"}

    def test_inner_drops_unmatched_and_overlaps_duplicate(self, spark):
        from beats_spark.skew import chunked_range_join
        ranges = spark.createDataFrame(
            [(0, 100, "a"), (50, 150, "b")],
            ["range_start", "range_end", "tier"])
        facts = spark.createDataFrame([(1, 75), (2, 999)],
                                      ["fid", "v"])
        out = chunked_range_join(facts, ranges, "v", how="inner",
                                 chunk_bits=4).collect()
        assert sorted((r.fid, r.tier) for r in out) == \
            [(1, "a"), (1, "b")]  # overlap matches twice, 999 gone

    def test_negative_values(self, spark):
        from beats_spark.skew import chunked_range_join
        ranges = spark.createDataFrame(
            [(-100, -1, "neg")], ["range_start", "range_end", "tier"])
        facts = spark.createDataFrame([(1, -50), (2, 5)],
                                      ["fid", "v"])
        out = {r.fid: r.tier for r in chunked_range_join(
            facts, ranges, "v", chunk_bits=4).collect()}
        assert out == {1: "neg", 2: None}

    def test_no_nested_loop_join(self, spark):
        from beats_spark.skew import chunked_range_join
        facts = spark.createDataFrame([(1, 5)], ["fid", "v"])
        plan = chunked_range_join(facts, self._ranges(spark), "v") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_wide_range_fails_loudly(self, spark):
        from beats_spark.skew import chunked_range_join
        ranges = spark.createDataFrame(
            [(0, 1 << 40, "huge")], ["range_start", "range_end", "tier"])
        facts = spark.createDataFrame([(1, 5)], ["fid", "v"])
        import pytest as _pt
        with _pt.raises(Exception, match="max_chunks_per_range"):
            chunked_range_join(facts, ranges, "v",
                               chunk_bits=4).collect()
