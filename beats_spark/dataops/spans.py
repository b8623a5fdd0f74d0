"""Duplicate n-gram span statistics — the exact-substring dedup
signal of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (2022), at token-n-gram granularity.

Document-level dedup (exact / MinHash / SimHash in
:mod:`beats_spark.dataops.dedup`) misses PARTIAL duplication:
boilerplate paragraphs, licence blocks, and templated passages that
repeat across otherwise-distinct pages. The suffix-array approach of
the paper does not distribute naturally; the standard scalable
approximation is sliding token n-grams — a span duplicated anywhere
in the corpus necessarily duplicates all its n-grams, so per-document
"fraction of n-grams seen elsewhere" is a sound (slightly
over-counting at span edges) duplication measure, computed with two
hash shuffles and zero Python.

Plan shape:
  tokenize (map) → sliding n-grams via one ``transform`` over index
  ``sequence`` (map) → posexplode → window-count per n-gram key
  (shuffle 1, payload ``(key, doc_id)`` — documents never move whole)
  → re-aggregate per document (shuffle 2).

Skew: the hottest key is a boilerplate n-gram; the window count
streams its group (no ``collect_list``), so a 10^9-occurrence n-gram
costs one partition scan, not memory.

Keying: ``by_hash=True`` (default — the 100 TB path) shuffles the
64-bit ``xxhash64`` of each n-gram instead of the string, cutting the
shuffle payload several-fold; a hash collision merging two distinct
n-grams' counts is ~p²/2^65 for p distinct n-grams (≈1e-7 even at
10^9). ``by_hash=False`` shuffles the n-gram text itself — exact, and
what an external SQL oracle reproduces; a test pins both modes equal
on real data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import tokens, _spread

__all__ = ["ngram_duplicate_stats", "doc_ngrams"]


def doc_ngrams(text: Column, n: int) -> Column:
    """Sliding word-``n``-grams of ``text`` as an array of strings
    (space-joined lowercased tokens); empty array when the document
    has fewer than ``n`` tokens. One pass: the token split appears
    once in the expression tree."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def ngram_duplicate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    by_hash: bool = True,
) -> DataFrame:
    """Per-document duplicate-n-gram statistics:

    ``(id_col, n_ngrams, dup_ngrams, dup_frac)`` where ``dup_ngrams``
    counts this document's n-grams whose CORPUS-WIDE occurrence count
    (across all documents, including repeats within one document) is
    ≥ ``min_count``, and ``dup_frac = dup_ngrams / n_ngrams`` rounded
    to 6 (0.0 for documents shorter than ``n`` tokens — nothing to
    measure, not "all duplicate").

    Filter downstream on ``dup_frac`` (e.g. > 0.5 drops
    boilerplate-dominated pages) or join back for span removal.

    Documents shorter than ``n`` tokens still appear in the output
    (with zeros) WITHOUT a join-back: ``explode_outer`` emits one
    null-n-gram row for them, keyed per-document so the nulls never
    pile into one hot shuffle group, and the aggregates simply don't
    count null n-grams. Exactly two exchanges, no recomputation of
    the n-gram pipeline for the short-document branch (measured: the
    join-back variant re-ran the whole tokenize+explode a second
    time as the anti-join's build side).
    """
    ng = F.col("__ng")
    key = F.xxhash64(ng) if by_hash else ng
    # short docs: one row with __ng NULL; give it a per-doc group key
    # (0 for real n-gram rows) so the window never sees a hot null key
    exploded = (_spread(df)
                .select(F.col(id_col),
                        F.explode_outer(doc_ngrams(F.col(text_col), n))
                         .alias("__ng"))
                .select(id_col, ng,
                        key.alias("__k"),
                        F.when(ng.isNull(), F.col(id_col))
                         .otherwise(F.lit(0)).cast("long")
                         .alias("__short")))
    cnt = F.count("__ng").over(Window.partitionBy("__k", "__short"))
    return (exploded
            .withColumn("__c", cnt)
            .groupBy(id_col)
            .agg(F.count("__ng").alias("n_ngrams"),
                 F.coalesce(
                     F.sum(F.when(ng.isNotNull()
                                  & (F.col("__c") >= min_count), 1)
                            .cast("bigint")),
                     F.lit(0).cast("bigint")).alias("dup_ngrams"))
            .withColumn(
                "dup_frac",
                F.round(F.col("dup_ngrams")
                        / F.greatest(F.col("n_ngrams"), F.lit(1)), 6)))
