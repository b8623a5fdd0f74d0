"""Governance primitives: k-anonymity, violation audit, purge; plus
session co-visitation."""

import pytest
from pyspark.sql import functions as F

from beats_spark.dataops.governance import (
    k_anonymize, k_violations, purge_ids)
from beats_spark.dataops.events import covisitation


def _rows(spark):
    # QI (city, age): ("a", 30) ×3, ("a", 40) ×1, ("b", 30) ×2
    return spark.createDataFrame(
        [(1, "a", 30), (2, "a", 30), (3, "a", 30),
         (4, "a", 40), (5, "b", 30), (6, "b", 30)],
        "id bigint, city string, age int")


def test_k_anonymize_suppresses_small_groups(spark):
    df = _rows(spark)
    kept = {r["id"] for r in k_anonymize(df, ["city", "age"], 2).collect()}
    assert kept == {1, 2, 3, 5, 6}
    kept3 = {r["id"] for r in k_anonymize(df, ["city", "age"], 3).collect()}
    assert kept3 == {1, 2, 3}
    # k=1 keeps everything
    assert k_anonymize(df, ["city", "age"], 1).count() == 6


def test_k_violations_audit(spark):
    df = _rows(spark)
    v = {(r["city"], r["age"]): r["n"]
         for r in k_violations(df, ["city", "age"], 3).collect()}
    assert v == {("a", 40): 1, ("b", 30): 2}
    with pytest.raises(ValueError, match="k must be"):
        k_violations(df, ["city"], 0)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymize(df, [], 2)


def test_purge_ids_anti_join(spark):
    df = _rows(spark)
    tomb = spark.createDataFrame([(2,), (5,), (99,)], "id bigint")
    left = {r["id"] for r in purge_ids(df, tomb, "id").collect()}
    assert left == {1, 3, 4, 6}
    # purge is idempotent
    assert purge_ids(purge_ids(df, tomb, "id"), tomb, "id").count() == 4


def test_covisitation_counts_and_fixed_point(spark):
    # sessions: s1={x,y,z}, s2={x,y}, s3={x}
    df = spark.createDataFrame(
        [("s1", "x"), ("s1", "y"), ("s1", "z"), ("s1", "x"),  # dup row
         ("s2", "x"), ("s2", "y"), ("s3", "x"), ("s3", None)],
        "sid string, item string")
    out = {(r["item_a"], r["item_b"]): r
           for r in covisitation(df, session_cols=("sid",),
                                 item_col="item").collect()}
    xy = out[("x", "y")]
    assert xy["c_ab"] == 2 and xy["c_a"] == 3 and xy["c_b"] == 2
    # conf = P(y|x) = (1e6*2) div 3; lift = (conf * 3 sessions) div 2
    assert xy["conf_micro"] == 666666
    assert xy["lift_micro"] == (666666 * 3) // 2
    assert out[("y", "z")]["c_ab"] == 1
    assert ("x", "x") not in out          # a < b only, dups collapsed


def test_covisitation_session_cap(spark):
    df = spark.createDataFrame(
        [("s", f"i{k:02d}") for k in range(10)] + [("t", "i00"),
                                                   ("t", "i01")],
        "sid string, item string")
    out = covisitation(df, session_cols=("sid",), item_col="item",
                       max_items_per_session=3, top_n=100).collect()
    pairs = {(r["item_a"], r["item_b"]) for r in out}
    # only the 3 lowest item ids of session s survive the cap
    assert pairs == {("i00", "i01"), ("i00", "i02"), ("i01", "i02")}
    # c_ab for (i00,i01): both sessions
    c = {(r["item_a"], r["item_b"]): r["c_ab"] for r in out}
    assert c[("i00", "i01")] == 2
