"""Curation funnel: metrics funnel consistency + determinism."""

from beats_spark.dataops.curate import curate


def test_curation_metrics_funnel(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = curate(docs, min_quality=0.65, langs=("en", "de", "fr"))
    m = res.metrics
    assert m["docs.total"] >= m["docs.quality_kept"] >= m["docs.lang_kept"]
    assert m["docs.lang_kept"] >= m["docs.exact_kept"]
    assert m["docs.exact_kept"] >= m["docs.near_dup_kept"]
    assert m["docs.near_dup_kept"] == res.kept.count()
    assert m["docs.dropped"] == m["docs.total"] - m["docs.near_dup_kept"]
    # the funnel actually removed something at each configured stage
    assert m["docs.quality_kept"] < m["docs.total"]
    assert m["docs.lang_kept"] < m["docs.quality_kept"]


def test_curation_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r["doc_id"] for r in
               curate(docs, with_metrics=False).kept.collect())
    b = sorted(r["doc_id"] for r in
               curate(docs, with_metrics=False).kept.collect())
    assert a == b and len(a) > 0


def test_fused_lang_matches_jvm_stopword_path(spark, sf_dir):
    # the Arrow kernel's lang field == the JVM lang_id_stopword column
    # (same marker argmax + lexicographic tie-break + 'und' at zero)
    from pyspark.sql import functions as F
    from beats_spark.dataops.textstats import (lang_id_stopword,
                                               text_stats_arrow)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = text_stats_arrow("text", with_lang=True)
    both = docs.select(
        lang_id_stopword(F.col("text")).alias("jvm"),
        st["lang"].alias("fused"),
        st["quality"].alias("q"))
    assert both.filter(F.col("jvm") != F.col("fused")).count() == 0
    # kernel struct stays backward compatible
    assert both.filter(F.col("q").isNull()).count() == 0
