"""Bigram LM quality scoring (beats_spark.dataops.lm)."""
import math

from pyspark.sql import functions as F

from beats_spark.dataops import bigram_model, lm_score


def test_lm_score_hand_case(spark):
    # corpus tokens: a,b (x2), a,c, x -> vocab {a,b,c,x}: V=4, c(a)=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "x"), (5, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in lm_score(docs).collect()}
    # P(b|a) = (2+1)/(3+4) = 3/7 ; P(c|a) = (1+1)/(3+4) = 2/7
    lp_ab = int(round(math.log(3 / 7) * 1e6))
    lp_ac = int(round(math.log(2 / 7) * 1e6))
    assert out[1].lp_micro == lp_ab and out[1].n_bigrams == 1
    assert out[3].lp_micro == lp_ac
    assert out[1].avg_lp_micro == math.floor(lp_ab / 1)
    # fluent ("a b", seen twice) scores higher than rarer "a c"
    assert out[1].avg_lp_micro > out[3].avg_lp_micro
    # docs with <2 tokens: zero bigrams, NULL average
    assert out[4].n_bigrams == 0 and out[4].avg_lp_micro is None
    assert out[5].n_bigrams == 0


def test_lm_frozen_model_scores_new_batch_totally(spark):
    corpus = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")],
        "doc_id long, text string")
    model = bigram_model(corpus)
    new = spark.createDataFrame(
        [(10, "the cat sat"),        # all seen
         (11, "zz qq")],             # fully unseen: P = 1/V
        "doc_id long, text string")
    out = {r.doc_id: r for r in lm_score(new, model=model).collect()}
    # V = 4 (the, cat, sat, ran); unseen bigram w/ unseen w1: 1/V
    lp_unseen = int(round(math.log(1 / 4) * 1e6))
    assert out[11].lp_micro == lp_unseen
    assert out[10].avg_lp_micro > out[11].avg_lp_micro


def test_lm_score_partition_invariant(spark):
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5}")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, lm_score(docs).collect()))
    b = sorted(map(tuple, lm_score(docs.repartition(13)).collect()))
    # integer micro-nat sums: bit-identical under any partitioning
    assert a == b
