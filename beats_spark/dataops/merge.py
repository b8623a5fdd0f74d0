"""SCD1 snapshot merge (the Iceberg ``MERGE INTO`` shape): fold a
delta of re-crawled/re-ingested rows into the current corpus, with
per-row change classification — the maintenance operation a living
10^12-page table runs every ingest cycle.

Scale spelling (the ``dedup_exact`` lesson applied to CDC): the WIDE
payloads never ride the classification exchange. Both sides reduce to
``(key, digest)`` — 40-byte rows — for the change join; payload
movement is then:

- delta rows: one join against the (tiny) per-key verdict frame —
  broadcast by AQE when the delta is bounded, the common daily-delta
  case;
- carried rows (current-only): a LEFT ANTI join of the big table
  against the delta's KEY SET — broadcastable for bounded deltas, so
  the 100 TB side stays map-side.

Classification is ``inserted`` (key new), ``updated`` (key exists,
compare-digest differs), ``unchanged`` (digest equal — the delta row
wins the tie, byte-identical anyway), ``carried`` (current-only).
``unchanged`` deltas can be dropped before the expensive write with
``drop_unchanged=True`` — re-crawls are mostly unchanged pages, and
not rewriting them is the point of classifying.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["merge_upsert"]


def _digest(cols: Sequence[str]):
    # null-safe: a NULL column must differ from the string 'None' or
    # '' — encode presence explicitly per column
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
        parts.append(F.lit("\x1f"))
    return F.sha2(F.concat(*parts), 256)


def merge_upsert(
    current: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    change_col: str = "change",
    drop_unchanged: bool = False,
) -> DataFrame:
    """Merged table = ``delta`` rows (winning their keys) plus
    ``current`` rows whose key the delta does not touch, with
    ``change_col`` ∈ inserted / updated / unchanged / carried.

    ``compare_cols`` defaults to every non-key column shared by both
    frames (order-insensitive digest input order: sorted names).
    Duplicate keys within ``delta`` are rejected in-plan (a MERGE
    with two sources for one key is ambiguous — same contract as
    Iceberg's cardinality check)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("merge_upsert: key_cols must be non-empty")
    if compare_cols is None:
        shared = set(current.columns) & set(delta.columns)
        compare_cols = sorted(shared - set(keys))
    if not compare_cols:
        raise ValueError("merge_upsert: no compare columns "
                         "(pass compare_cols explicitly)")
    if change_col in delta.columns or change_col in current.columns:
        raise ValueError(f"merge_upsert: rename the existing "
                         f"{change_col} column first")

    cur_keys = current.select(
        *keys, _digest(compare_cols).alias("__cur_digest"))
    dup = F.assert_true(
        F.col("__n") == 1,
        F.lit("merge_upsert: duplicate key in delta (ambiguous MERGE "
              "source — dedupe the delta first)"))
    delta_keys = (delta.select(*keys,
                               _digest(compare_cols).alias("__d"))
                  .groupBy(*keys)
                  .agg(F.count(F.lit(1)).alias("__n"),
                       F.first("__d").alias("__new_digest"))
                  .withColumn("__guard", dup).drop("__n"))
    verdict = (delta_keys.join(cur_keys, keys, "left")
               .select(*keys, F.col("__guard"),
                       F.when(F.col("__cur_digest").isNull(),
                              F.lit("inserted"))
                       .when(F.col("__cur_digest")
                             == F.col("__new_digest"),
                             F.lit("unchanged"))
                       .otherwise(F.lit("updated"))
                       .alias(change_col))
               .withColumn(change_col,
                           F.when(F.col("__guard").isNull(),
                                  F.col(change_col)))
               .drop("__guard"))
    out_cols = [c for c in delta.columns if c in current.columns]
    classified = (delta.select(*out_cols).join(verdict, keys)
                  .select(*out_cols, change_col))
    if drop_unchanged:
        classified = classified.filter(F.col(change_col) != "unchanged")
    carried = (current.select(*out_cols)
               .join(delta.select(*keys).distinct(), keys, "left_anti")
               .withColumn(change_col, F.lit("carried")))
    return classified.unionByName(carried)
