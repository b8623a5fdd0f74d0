"""Entity resolution / record linkage: blocked candidate generation +
edit-distance scoring + best-match selection (the Fellegi–Sunter
blocking-and-comparison shape every dedup-ing ingest pipeline needs —
linking dirty crawl-extracted entity mentions to a clean registry).

Scale shape: the ONLY join is equality on the blocking key, so the
shuffle is bounded by block sizes — never an all-pairs scan. Scoring
is Spark's built-in ``levenshtein`` (JVM, whole-stage codegen); the
best-match pick is one window over CANDIDATES (match volume, not
corpus volume). A hot blocking key (e.g. a prefix shared by millions
of names) is the documented skew risk: lengthen the prefix, add a
second key component (length bucket, phonetic code), or salt — same
playbook as the salted joins in ``skew.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["blocked_link"]


def blocked_link(
    dirty: DataFrame,
    clean: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    prefix_len: int = 2,
    max_dist: int = 2,
    best_only: bool = True,
) -> DataFrame:
    """Link each ``dirty`` record to ``clean`` records whose name is
    within ``max_dist`` edits, considering only candidates that share
    a ``prefix_len``-character blocking key.

    Completeness bound (documented, not hidden): a corruption inside
    the first ``prefix_len`` characters moves the record to a
    different block and it will NOT be linked — the standard
    blocking-recall trade-off; run a second pass with a different key
    (suffix, phonetic) to recover those.

    ``best_only=True`` keeps one row per dirty record (min distance,
    ties broken by min clean id); otherwise all matches within
    ``max_dist`` are returned. Output:
    ``(dirty_id, clean_id, lev)``.
    """
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    blk = F.substring(F.col(name_col), 1, prefix_len)
    d = dirty.select(F.col(id_col).alias("dirty_id"),
                     F.col(name_col).alias("__dn"), blk.alias("__blk"))
    c = clean.select(F.col(id_col).alias("clean_id"),
                     F.col(name_col).alias("__cn"), blk.alias("__blk"))
    cand = (d.join(c, "__blk")
            .withColumn("lev", F.levenshtein(F.col("__dn"),
                                             F.col("__cn")))
            .filter(F.col("lev") <= max_dist))
    if best_only:
        w = Window.partitionBy("dirty_id").orderBy("lev", "clean_id")
        cand = (cand.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1))
    return cand.select("dirty_id", "clean_id",
                       F.col("lev").cast("int").alias("lev"))
