"""Similarity search: exact top-k determinism and the LSH variant's
bucket/rerank correctness."""

from pyspark.sql import functions as F

from beats_spark.dataops import cosine_topk, lsh_cosine_topk
from beats_spark.dataops.similarity import (
    cosine_similarity, lsh_signature,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_topk_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    a = cosine_topk(emb, q, k=3).collect()
    b = cosine_topk(emb, q, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == [1, 2, 3]
        assert all(r["neighbor_id"] != qid for r in rows)


def test_lsh_candidates_share_bucket_and_scores_are_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    approx = lsh_cosine_topk(emb, q, k=3, num_planes=3)

    sig = emb.select("vec_id",
                     lsh_signature(F.col("embedding"), 3).alias("sig"))
    sigs = {r["vec_id"]: r["sig"] for r in sig.collect()}
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in cosine_topk(emb, q, k=10**6).collect()}

    rows = approx.collect()
    assert rows, "LSH with 3 planes must yield candidates at this scale"
    for r in rows:
        # candidate really shares the query's hyperplane bucket…
        assert sigs[r["neighbor_id"]] == sigs[r["query_id"]]
        # …and the rerank cosine equals the exact computation
        assert r["cosine"] == exact[(r["query_id"], r["neighbor_id"])]


def test_ivf_lists_partition_corpus(spark, sf_dir):
    from pyspark.sql import functions as F
    from beats_spark.dataops.similarity import ivf_assign, ivf_cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = (emb.orderBy("vec_id").limit(8)
            .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    lists = ivf_assign(emb, cent)
    # every vector lands in exactly one inverted list
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()
    n_lists = lists.select("__list").distinct().count()
    assert 1 < n_lists <= 8

    # probing ALL lists with nprobe=n_centroids reproduces brute force
    from beats_spark.dataops.similarity import cosine_topk
    q = emb.filter(F.col("vec_id") < 5)
    full = ivf_cosine_topk(emb, q, k=3, n_centroids=8, nprobe=8)
    brute = cosine_topk(emb, q, k=3)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, brute.collect()))
