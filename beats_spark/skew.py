"""Skew handling for hot keys (north_rule: "skew from hot domains is
handled with salted repartitioning and AQE").

The flagship parse/enrich/route path is map-side, so Zipf-skewed hosts
cost nothing there (no shuffle keyed on host). Skew bites where a
*shuffle* is keyed on the hot column — host-keyed aggregations and
joins. Two tools:

- ``salted_agg``: two-phase aggregation — shuffle #1 on
  ``(key, salt)`` spreads the hot key over N reducers computing
  partial aggregates; shuffle #2 on ``key`` combines N tiny partials.
  Exact same result as a plain groupBy for any algebraic aggregate.
- AQE (``spark.sql.adaptive.skewJoin.enabled``) splits skewed join
  partitions at runtime; bench/pipeline sessions enable it. Salting
  remains for aggregations, which AQE skew handling does not cover.

Salt factor guidance: ≈ ceil(hot_key_share × shuffle_partitions); the
fixtures' hottest host carries ~26% of rows, so 8–16 salts fully
flatten it at 32–64 partitions.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["chunked_range_join", "salted_agg", "salted_join",
           "salted_repartition"]

# (merge_fn, finish_fn): how partials combine, how the result is named
_MERGEABLE = {
    "count": (F.sum, "bigint"),
    "sum": (F.sum, None),
    "min": (F.min, None),
    "max": (F.max, None),
}


def salted_repartition(df: DataFrame, key: str, salts: int = 16,
                       partitions: int | None = None) -> DataFrame:
    """Repartition by ``(key, salt)`` so one hot key spreads over
    ``salts`` partitions — the pre-shuffle for any downstream
    partition-local work keyed on ``key``. Deterministic salt (hash of
    the full row) so task retries re-derive identical placement."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salts)
    out = df.withColumn("__salt", salt)
    if partitions:
        return out.repartition(partitions, F.col(key), F.col("__salt"))
    return out.repartition(F.col(key), F.col("__salt"))


def chunked_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    start_col: str = "range_start",
    end_col: str = "range_end",
    chunk_bits: int = 8,
    how: str = "left",
    max_chunks_per_range: int = 4096,
) -> DataFrame:
    """Interval-containment join (``start <= value <= end``) as an
    EQUI-join — the GeoIP/CIDR-block lookup shape (reference:
    ``processors/add_network_direction`` matches IPs against nets;
    at table scale that becomes "join each event's integer IP against
    a block-range table"). Spark plans a naive range join as
    BroadcastNestedLoopJoin — O(facts × ranges) compares; this is the
    banded spelling: every range EXPLODES into the fixed-width chunks
    (``2^chunk_bits`` wide) it overlaps, facts compute their chunk
    with one shift, and the join runs on the chunk key with the
    BETWEEN as a post-filter — each fact meets only the ranges
    sharing its chunk.

    Ranges overlapping a fact each emit a row (a fact inside k ranges
    matches k times — dedupe upstream if ranges must be disjoint). A
    range spanning more than ``max_chunks_per_range`` chunks fails
    loudly: raise ``chunk_bits`` instead of exploding a giant chunk
    list (chunk fan-out × |ranges| is the replicated-side cost, like
    :func:`salted_join`'s × salts). ``how`` inner or left (left keeps
    rangeless facts with NULL payloads). Negative values work: both
    sides chunk with the same floor (arithmetic) shift.
    """
    if how not in ("inner", "left"):
        raise ValueError("chunked_range_join: how must be inner or "
                         f"left, got {how!r}")
    if not 0 < chunk_bits < 62:
        raise ValueError("chunked_range_join: chunk_bits must be in "
                         f"(0, 62), got {chunk_bits}")
    guard = F.assert_true(
        (F.col(end_col) >= F.col(start_col))
        & ((F.shiftright(F.col(end_col).cast("long"), chunk_bits)
            - F.shiftright(F.col(start_col).cast("long"), chunk_bits))
           < F.lit(int(max_chunks_per_range))),
        F.lit("chunked_range_join: range inverted or wider than "
              f"max_chunks_per_range × 2^{chunk_bits} — raise "
              "chunk_bits"))
    # the guard rides INSIDE the sequence bound: a generator cannot
    # nest under when(), but its arguments can
    r = ranges.withColumn(
        "__chunk",
        F.explode(F.sequence(
            F.when(guard.isNull(),
                   F.shiftright(F.col(start_col).cast("long"),
                                chunk_bits)),
            F.shiftright(F.col(end_col).cast("long"), chunk_bits))))
    f = facts.withColumn(
        "__chunk", F.shiftright(F.col(value_col).cast("long"),
                                chunk_bits))
    fa, ra = f.alias("__f"), r.alias("__r")
    cond = ((F.col("__f.__chunk") == F.col("__r.__chunk"))
            & (F.col(f"__f.{value_col}") >= F.col(f"__r.{start_col}"))
            & (F.col(f"__f.{value_col}") <= F.col(f"__r.{end_col}")))
    return (fa.join(ra, on=cond, how=how)
            .drop(F.col("__f.__chunk")).drop(F.col("__r.__chunk"))
            .drop(start_col, end_col))


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join for a dim side too big to broadcast: the
    big side salts each row deterministically (hash of the full row,
    retry-safe like :func:`salted_agg`), the dim side REPLICATES each
    row ``salts`` times (one per salt value), and the join runs on
    ``(key, salt)`` — a key carrying 30% of the big side now spreads
    over ``salts`` reducers instead of melting one. Result is
    row-identical to the plain join.

    Cost model: the dim shuffle grows ×``salts`` — right for a
    mid-size dim (too big for broadcast, ≪ big side). ``how`` is
    inner or left only: right/full would count each unmatched dim
    row once PER REPLICA. AQE's skew-join split is the runtime
    alternative for sort-merge joins; explicit salting also covers
    the shuffled-hash path and makes the layout deterministic.

    The salt hashes the full row (``salt_on`` overrides which
    columns). Caveat: rows that are IDENTICAL on the salted columns
    share a salt — a hot key whose rows are byte-identical does not
    spread (pass a distinguishing column via ``salt_on``, or
    pre-aggregate: identical fact rows usually want a count, not a
    join). Retry-safety requires the salt be a pure row function —
    never a partition or arrival index.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how must be inner or left "
                         f"(right/full would duplicate unmatched dim "
                         f"rows per replica), got {how!r}")
    if salts < 1:
        raise ValueError(f"salted_join: salts must be >= 1, "
                         f"got {salts}")
    scols = list(salt_on) if salt_on is not None else big.columns
    if not scols:
        raise ValueError("salted_join: salt_on must name at least "
                         "one column")
    missing = [c for c in scols if c not in big.columns]
    if missing:
        raise ValueError(f"salted_join: salt_on columns {missing} "
                         "not on the big side")
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in scols]),
                    F.lit(salts))
    b = big.withColumn("__salt", salt_b)
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return b.join(d, [key, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Exact two-phase salted aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    count/sum/min/max (algebraic, so partials merge losslessly).
    Phase 1 groups by (keys, salt): the hot key's rows split across
    ``salts`` reducers. Phase 2 groups by keys over ≤ salts partial
    rows per key — trivially balanced.

    The salt is a DETERMINISTIC hash of the row's own key+input values
    — a task re-run after a shuffle-fetch failure must re-derive the
    same salt per row, or recomputed partials would overlap/miss rows
    consumed by surviving reducers (monotonically_increasing_id and
    spark_partition_id both break under retry). Identical rows sharing
    a salt is fine: they are interchangeable in any algebraic merge.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  salts).alias("__salt")

    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
        elif fn in _MERGEABLE:
            phase1_aggs.append(getattr(F, fn)(F.col(col))
                               .alias(f"__p_{out}"))
        else:
            raise ValueError(
                f"{fn!r} is not algebraic-mergeable; use plain groupBy "
                f"or rewrite (avg = sum/count)")
    phase1 = (df.withColumn("__salt", salt)
                .groupBy(*keys, "__salt").agg(*phase1_aggs))

    phase2_aggs = []
    for out, (fn, _) in aggs.items():
        merge, cast_to = _MERGEABLE[fn]
        col = merge(F.col(f"__p_{out}"))
        if cast_to:
            col = col.cast(cast_to)
        phase2_aggs.append(col.alias(out))
    return phase1.groupBy(*keys).agg(*phase2_aggs)
