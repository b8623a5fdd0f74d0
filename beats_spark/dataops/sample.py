"""Deterministic sampling for training-corpus construction.

Web crawls are power-law skewed by host: a handful of domains
contribute most pages, and training mixes routinely cap or
down-weight them. Spark's ``sample()`` is NOT reproducible across
runs/partitionings (per-partition RNG seeded by partition id — the
same hazard :mod:`beats_spark.dataops.splits` documents for
``randomSplit``), so both operators here are pure functions of row
keys:

- :func:`cap_per_key` — keep at most ``k`` rows per key,
  deterministically ranked. One shuffle on the key; the row_number
  window streams each group, so a 10^8-page host costs a partition
  scan, not memory. This IS the skew treatment: the output is
  cap-bounded per key, so downstream stages see a flattened
  distribution.
- :func:`hash_sample` — Bernoulli(p) by md5-bucket of the key
  (:func:`~beats_spark.dataops.splits.split_bucket`): zero shuffle,
  map-side, pushdown-safe, stable under repartitioning and engine
  changes, and consistent — the same key always samples the same way,
  so sampling documents by cluster/domain key keeps or drops whole
  groups together (the same leakage-control trick as hash_split).
  A ``seed`` string folds into the hashed key so independent samples
  draw from independent bucketings.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .splits import split_bucket

__all__ = ["cap_per_key", "hash_sample"]


def cap_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    order_by: Optional[Sequence[Column]] = None,
    keep_rank: bool = False,
) -> DataFrame:
    """At most ``k`` rows per ``key_col``, keeping the first ``k`` in
    ``order_by`` order (default: md5-bucket of the full row id is NOT
    assumed — callers pass an explicit total order; with no
    ``order_by`` the key's natural column order must already be
    total, so prefer passing one). ``keep_rank=True`` retains the
    1-based rank as ``rank_in_key`` for quota diagnostics."""
    if k < 1:
        raise ValueError(f"cap_per_key: k must be >= 1, got {k}")
    order = list(order_by) if order_by else [F.col(key_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    out = df.withColumn("rank_in_key", F.row_number().over(w)) \
            .filter(F.col("rank_in_key") <= k)
    return out if keep_rank else out.drop("rank_in_key")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose
    ``md5(key || '#' || seed)`` bucket (in ``[0, granularity)``)
    falls below ``fraction * granularity``. The realized rate
    converges to ``fraction`` with quantization error < 1/granularity.

    Null keys fail the job at scan time (a null key would silently
    vanish from every sample — the same guard as ``hash_split``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"hash_sample: fraction must be in [0,1], "
                         f"got {fraction}")
    key = F.col(key_col)
    guard = F.assert_true(
        key.isNotNull(),
        F.lit(f"hash_sample: null {key_col} (filter or fill nulls "
              "before sampling)"))
    salted = F.concat(key.cast("string"), F.lit("#"), F.lit(seed))
    bucket = F.when(guard.isNull(), split_bucket(salted, granularity))
    bound = int(round(fraction * granularity))
    return df.filter(bucket < bound)
