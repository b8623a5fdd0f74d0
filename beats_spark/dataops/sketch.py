"""Mergeable, bounded-state sketches for web-scale profiling: KMV
distinct-count, count-min frequency, and Bloom-filter membership.

At 10^12 rows the exact answers these approximate are themselves
shuffle monsters (a COUNT(DISTINCT url) per language moves every
distinct key; a per-key frequency table for hot-key detection is the
skew it is trying to diagnose). The sketch forms bound both state and
communication to constants chosen up front:

- **KMV (k-minimum-values)** distinct estimate: keep the ``k``
  smallest 60-bit hash values per group. Partial sketches merge by
  union-then-truncate, so the heavy pass is a zero-shuffle Arrow
  stage emitting ≤ ``partitions × groups × k`` candidate rows; the
  one exchange carries 8-byte hashes, never data values. Estimator
  ``(k-1) · 2^60 / kth_min`` (Bar-Yossef et al. 2002, the standard
  bottom-k form); groups with fewer than ``k`` distinct values come
  back exact.
- **Count-min** (Cormode & Muthukrishnan 2005): ``depth × width``
  counter grid, cell ``(j, h_j(key) mod width)`` accumulates the
  key's count; a point query reads the minimum over ``depth`` cells
  (overestimates only, never under). The build is one partial-agg
  shuffle whose reduce side is at most ``depth·width`` rows no matter
  the input size — the hot-key histogram that never itself skews.
- **Bloom filter**: ``n_hashes`` bit positions per key OR-ed into
  62-bit words (62, not 64: DuckDB's ``<<`` refuses to shift into
  the sign bit, and the point of these spellings is exact
  cross-engine reproducibility). The probe is ``n_hashes``
  broadcast hash joins on the word index — the big side never
  shuffles, the classic semi-join reduction before an expensive join
  or fetch. False positives are deterministic functions of the data,
  so even they reproduce bit-for-bit in the SQL oracle.

All hashing is the repo's portable 60-bit md5 trick
(``conv(substr(md5(x),1,15),16,10)``) so DuckDB/Trino replay the
exact same sketch — including its approximation error. Determinism
notes: the KMV Arrow partial's OUTPUT depends on partition layout,
but the merged result does not (the union of per-partition bottom-k
sets always contains the global bottom-k).

Reference scope: Beats ships no sketches (its counters at
``libbeat/monitoring/`` are exact in-process sums — see
``metrics.py``); these serve SURVEY §2's curation/profiling layer
over the north_star's 10^12-page table.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _spread

__all__ = [
    "bloom_build", "bloom_probe", "countmin_build", "countmin_estimate",
    "h60", "hdr_histogram", "hdr_percentiles", "heavy_hitters",
    "hll_distinct", "hll_estimate", "hll_merge", "hll_registers",
    "kmv_distinct",
]

#: hash space size: the 60-bit md5 prefix spans [0, 2^60)
_SPACE = float(2 ** 60)

#: usable bits per Bloom word — 62 keeps ``1 << bit`` positive in
#: every engine (DuckDB raises on shifts into the BIGINT sign bit)
_WORD_BITS = 62


def h60(col: Column, salt: "str | Column" = "") -> Column:
    """Portable 60-bit hash: ``conv(substr(md5(x # salt),1,15),16,10)``.

    The '#'-salted md5-prefix spelling every sampling/split op in this
    repo uses — identical output in Spark, DuckDB and Trino, which is
    what makes the sketches' *errors* oracle-checkable. ``salt`` may
    be a Column for data-dependent salts (the count-min row index)."""
    tail = (F.concat(F.lit("#"), salt) if isinstance(salt, Column)
            else F.lit("#" + salt))
    salted = F.concat(col.cast("string"), tail)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def _not_null(col: Column, op: str, what: str) -> Column:
    guard = F.assert_true(
        col.isNotNull(), F.lit(f"{op}: null {what} (filter or fill first)"))
    return F.when(guard.isNull(), col)


# ---------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------

def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    by: Optional[str] = None,
    seed: str = "",
) -> DataFrame:
    """Distinct-count estimate of ``value_col`` (per ``by`` group when
    given): ``(by?, est_distinct, is_exact)``.

    Two stages: (1) a zero-shuffle Arrow partial that keeps the ``k``
    smallest distinct hashes per group per partition — the only pass
    over the full data, and its output is bounded by ``parts·k`` rows
    per group regardless of input size; (2) one small aggregation that
    unions the partials, truncates back to ``k``, and evaluates the
    estimator. Groups whose candidate union holds fewer than ``k``
    hashes were never truncated anywhere, so their count is exact
    (``is_exact = true``).

    Contrast with exact ``count_distinct``: that moves every distinct
    (group, value) pair through an exchange; this moves at most
    ``k`` longs per group per input split.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    import numpy as np
    import pandas as pd

    val = _not_null(F.col(value_col), "kmv_distinct", value_col)
    if by is not None:
        gtype = dict(df.dtypes)[by]
        base = df.select(
            _not_null(F.col(by), "kmv_distinct", by).alias("g"),
            h60(val, seed).alias("h"))
        out_schema = f"g {gtype}, h long"
    else:
        base = df.select(F.lit("").alias("g"), h60(val, seed).alias("h"))
        out_schema = "g string, h long"

    kk = k

    def partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False):
                hs = np.unique(sub["h"].to_numpy())  # sorted ascending
                prev = acc.get(g)
                if prev is not None:
                    hs = np.unique(np.concatenate([prev, hs]))
                acc[g] = hs[:kk]
        if acc:
            gs = np.concatenate(
                [np.repeat(np.array([g], dtype=object), len(v))
                 for g, v in acc.items()])
            yield pd.DataFrame(
                {"g": gs,
                 "h": np.concatenate(list(acc.values()))})

    cand = _spread(base).mapInPandas(partial, schema=out_schema)
    if by is None:
        # seed the global group so an empty input yields the exact
        # answer (0, true) instead of zero rows — collect_set ignores
        # the sentinel NULL hash
        spark = df.sparkSession
        sentinel = spark.range(1).select(
            F.lit("").alias("g"), F.lit(None).cast("long").alias("h"))
        cand = cand.unionByName(sentinel)
    kth = F.element_at("hs", k)
    est = (F.when(F.size("hs") < k, F.size("hs").cast("long"))
           .otherwise(F.floor(F.lit(float(k - 1)) * F.lit(_SPACE)
                              / kth.cast("double")).cast("long")))
    merged = (cand.groupBy("g")
              .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k)
                   .alias("hs"))
              .select(F.col("g"),
                      est.alias("est_distinct"),
                      (F.size("hs") < k).alias("is_exact")))
    if by is not None:
        return merged.withColumnRenamed("g", by)
    return merged.select("est_distinct", "is_exact")


# ---------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------

def _cm_bucket(key: Column, j: Column, width: int, seed: str) -> Column:
    """Row ``j``'s bucket for ``key``: 60-bit hash of ``key#seed#j``
    mod ``width`` (both operands non-negative, so ``pmod`` ≡ ``%``
    across engines)."""
    return F.pmod(
        h60(key, F.concat(F.lit(seed + "#"), j.cast("string"))),
        F.lit(width))


def countmin_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "",
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies: ``(j, bucket,
    cnt)``, at most ``depth × width`` rows.

    Map side replicates each row ``depth`` ways (a literal-array
    explode — the documented ×depth cost of the grid) and the single
    aggregation partial-combines, so the exchange delivers at most
    ``depth·width`` rows per map task: a frequency profile whose
    reduce-side size is a constant, immune to the key skew it is
    built to measure."""
    if width < 2 or depth < 1:
        raise ValueError(
            f"countmin_build: need width >= 2, depth >= 1, "
            f"got {width}x{depth}")
    key = _not_null(F.col(key_col), "countmin_build", key_col)
    rows = df.select(
        key.cast("string").alias("k"),
        F.explode(F.array([F.lit(j) for j in range(depth)])).alias("j"))
    return (rows
            .select("j", _cm_bucket(F.col("k"), F.col("j"), width, seed)
                    .alias("bucket"))
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "",
    out_col: str = "est_cnt",
) -> DataFrame:
    """Point-query ``keys`` against a :func:`countmin_build` sketch.
    Returns ``(key_col, out_col)`` ONLY — ``out_col`` = min over the
    ``depth`` cells (the classic CM upper-bound estimate; cells no key
    hashed to read 0); other columns of ``keys`` do not survive the
    readout aggregation, so join them back on ``key_col`` if needed
    (as the ``countmin_freq`` catalog query does).

    The sketch is at most ``depth·width`` rows — broadcast it; the
    probe side explodes ×``depth`` and regroups on the key, which is
    fine because point queries are by construction a small keyset
    (the full-corpus frequency table is what the sketch avoids)."""
    key = _not_null(F.col(key_col), "countmin_estimate", key_col)
    probes = keys.select(
        F.col(key_col),
        key.cast("string").alias("__k"),
        F.explode(F.array([F.lit(j) for j in range(depth)])).alias("j"))
    probes = probes.withColumn(
        "bucket", _cm_bucket(F.col("__k"), F.col("j"), width, seed))
    return (probes
            .join(F.broadcast(sketch), ["j", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias(out_col)))


# ---------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------

def _bloom_pos(key: Column, j: int, n_bits: int, seed: str) -> Column:
    return F.pmod(h60(key, f"{seed}#{j}"), F.lit(n_bits))


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: str = "",
) -> DataFrame:
    """Bloom filter over ``key_col``: ``(word_idx, word)`` rows, one
    per non-zero 62-bit word, at most ``ceil(n_bits/62)`` of them.

    Build is map-side bit math (positions ``h_j(key) mod n_bits``,
    ``1 << (pos mod 62)`` into word ``pos div 62``) plus one
    partial-combining ``bit_or`` aggregation — the exchange carries at
    most the word count per map task. Distinct keys are NOT
    pre-deduplicated: OR-ing a key's bits twice is idempotent, and a
    distinct() here would add a full shuffle of the keys for nothing.
    """
    if n_hashes < 1 or n_bits < _WORD_BITS:
        raise ValueError(
            f"bloom_build: need n_hashes >= 1, n_bits >= {_WORD_BITS}, "
            f"got {n_hashes}, {n_bits}")
    key = _not_null(F.col(key_col), "bloom_build", key_col)
    pos = F.explode(F.array(
        [_bloom_pos(key, j, n_bits, seed) for j in range(n_hashes)]
    )).alias("pos")
    positions = df.select(pos)
    # mask = 2^bit as a double is exact (a power of two <= 2^61), so
    # the cast back to long is exact too — engine-portable, unlike
    # shiftleft whose Spark DSL form takes only literal shift amounts
    bit = F.pmod(F.col("pos"), F.lit(_WORD_BITS))
    mask = F.pow(F.lit(2.0), bit.cast("double")).cast("long")
    return (positions
            .select((F.col("pos") / _WORD_BITS).cast("long")
                    .alias("word_idx"),
                    mask.alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word")))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: str = "",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe ``df[key_col]`` against a :func:`bloom_build` filter:
    adds boolean ``out_col`` (true = possibly present; false =
    definitely absent).

    The probe is ``n_hashes`` broadcast hash joins on ``word_idx`` —
    the probed side NEVER shuffles and no per-row regrouping happens
    (the alternative explode-join-groupBy spelling would re-shuffle
    the big side on its row id, defeating the filter's purpose as a
    pre-shuffle reducer). Missing words read as 0 (= bit clear)."""
    key = _not_null(F.col(key_col), "bloom_probe", key_col)
    out = df
    cond = F.lit(True)
    for j in range(n_hashes):
        pos = _bloom_pos(key, j, n_bits, seed)
        widx = (pos / _WORD_BITS).cast("long")
        bit = F.pmod(pos, F.lit(_WORD_BITS))
        mask = F.pow(F.lit(2.0), bit.cast("double")).cast("long")
        side = bloom.select(F.col("word_idx").alias(f"__bw{j}"),
                            F.col("word").alias(f"__wv{j}"))
        out = out.join(F.broadcast(side),
                       widx == F.col(f"__bw{j}"), "left")
        cond = cond & (F.coalesce(F.col(f"__wv{j}"), F.lit(0))
                       .bitwiseAND(mask) != 0)
    return (out.withColumn(out_col, cond)
            .drop(*[c for j in range(n_hashes)
                    for c in (f"__bw{j}", f"__wv{j}")]))


# ---------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------

#: bias-correction constants from Flajolet et al. 2007 (§4, Fig. 3)
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _by_list(by) -> list:
    if by is None:
        return []
    if isinstance(by, str):
        return [by]
    return list(by)


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 6,
    bits: int = 32,
    by: "str | list | None" = None,
    seed: str = "",
) -> DataFrame:
    """HyperLogLog register frame for ``value_col``: one row per
    ``(by?, bucket)`` with ``reg`` = the max leading-run length
    observed in that bucket (Flajolet et al. 2007).

    The hash is the top ``bits`` of the repo's portable 60-bit md5
    (:func:`h60`); the top ``p`` of those pick the bucket and ``reg``
    is ``(bits-p) - floor(log2(low)) + 1`` spelled with the
    engine-portable ``length(bin(x))`` (identical in Spark and
    DuckDB, so the sketch — including its approximation error — is
    oracle-checkable bit-for-bit). Zero low bits read as the max run
    ``bits - p + 1``.

    Scale shape: one partial-combining max aggregation — the exchange
    carries at most ``2^p`` rows per group per map task no matter the
    input size, and the reduce state is ``2^p`` ints per group. The
    register frame is itself MERGEABLE (union + groupBy max), so
    daily partial sketches roll up without touching raw data; see
    :func:`hll_merge`.

    Reference scope: as with the other sketches, Beats has no
    approximate aggregation (libbeat/monitoring is exact in-process
    counters); this serves the 10^12-page profiling layer, where an
    exact COUNT(DISTINCT url) per language is a full shuffle of every
    distinct key.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll: p must be in [4,16], got {p}")
    if not p + 1 <= bits <= 60:
        raise ValueError(f"hll: bits must be in [p+1,60], got {bits}")
    w = bits - p
    key = _not_null(F.col(value_col), "hll_registers", value_col)
    h = F.shiftright(h60(key, seed), 60 - bits)
    bucket = F.shiftright(h, w)
    low = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = (F.when(low == F.lit(0), F.lit(w + 1))
           .otherwise(F.lit(w) - F.length(F.bin(low)) + 1)).cast("int")
    keys = _by_list(by)
    sel = df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
    return (sel.groupBy(*keys, "bucket")
            .agg(F.max("rho").alias("reg")))


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register frames from :func:`hll_registers` (same p/bits/
    seed): union + groupBy max — the HLL merge is exact, which is the
    whole point of keeping sketches instead of raw keys."""
    if not register_frames:
        raise ValueError("hll_merge: need at least one frame")
    out = register_frames[0]
    for nxt in register_frames[1:]:
        out = out.unionByName(nxt)
    keys = [c for c in out.columns if c != "reg"]
    return out.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame,
    p: int = 6,
    bits: int = 32,
    by: "str | list | None" = None,
) -> DataFrame:
    """Evaluate the HLL estimator over a register frame:
    ``(by?, est_distinct, nseen)``.

    The harmonic-mean denominator ``sum(2^-reg) + (m - nseen)`` is
    accumulated as the EXACT integer ``sum(2^(bits-reg)) +
    (m-nseen)*2^bits`` in decimal(38,0) — no float summation, so the
    result is independent of aggregation order (a float sum of
    2^-reg terms would differ between engines/partitionings in the
    last ulp). With the default ``bits=32`` the integer fits well
    under 2^53, so the single decimal→double cast and the one
    division are exact/deterministic and the ESTIMATE itself
    oracle-hashes across engines. Larger ``bits`` (needed beyond
    ~10^8 distinct; at the north_star's 10^12 use bits>=50) keeps
    the same exact integer accumulation and only the final cast may
    round — fine in production where no cross-engine hash is taken.
    """
    m = 1 << p
    alpha = _hll_alpha(m)
    term = (F.pow(F.lit(2.0), (F.lit(bits) - F.col("reg")).cast("double"))
            .cast("decimal(38,0)"))
    keys = _by_list(by)
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("nseen"),
        F.sum(term).alias("__s"))
    full = (F.col("__s")
            + (F.lit(m).cast("decimal(38,0)") - F.col("nseen"))
            * F.lit(1 << bits).cast("decimal(38,0)"))
    est = F.round(
        F.lit(alpha * m * m * float(1 << bits)) / full.cast("double"), 2)
    return agg.select(*keys, est.alias("est_distinct"), "nseen")


def hll_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 6,
    bits: int = 32,
    by: "str | list | None" = None,
    seed: str = "",
) -> DataFrame:
    """Distinct-count estimate of ``value_col`` (per ``by`` when
    given — a column name or a LIST of them, e.g. (key, time window)
    for the "distinct users per hour" production shape) via
    HyperLogLog: :func:`hll_registers` → :func:`hll_estimate`.
    Returns ``(by..., est_distinct, nseen)``."""
    return hll_estimate(
        hll_registers(df, value_col, p=p, bits=bits, by=by, seed=seed),
        p=p, bits=bits, by=by)


# ---------------------------------------------------------------------
# Power-of-two histogram (HDR-lite) for latency-style percentiles
# ---------------------------------------------------------------------

def hdr_histogram(
    df: DataFrame,
    value_col: str,
    by: "str | list | None" = None,
    unit_scale: int = 1000,
) -> DataFrame:
    """Power-of-two histogram over non-negative values:
    ``(by..., bucket, cnt)`` where bucket ``b`` covers the integer
    micro-unit range ``[2^(b-1), 2^b - 1]`` (bucket 0 = exactly 0).

    The mergeable percentile sketch with DETERMINISTIC answers —
    unlike ``approx_percentile``, whose sketch is engine- and
    merge-order-specific, the bucket of a value is a pure function of
    the value (``length(bin(v))``, the same portable trick as the HLL
    rho), so histograms from two engines or two days merge by plain
    SUM and agree bit-for-bit. Relative error is bounded by the
    bucket width: ≤ 2× (one binary order), the classic HDR-histogram
    trade. State is ≤ ~64 rows per group forever.

    Values are scaled by ``unit_scale`` and rounded to integers
    map-side; negatives fail loud (a latency histogram that silently
    buckets negatives is hiding a clock bug).
    """
    raw = _not_null(F.col(value_col), "hdr_histogram", value_col)
    v = F.round(raw * unit_scale).cast("long")
    guard = F.assert_true(
        v >= 0, F.lit(f"hdr_histogram: negative {value_col} "
                      "(fix the clock or filter first)"))
    v = F.when(guard.isNull(), v)
    bucket = (F.when(v == 0, F.lit(0))
              .otherwise(F.length(F.bin(v)))).cast("int")
    keys = _by_list(by)
    return (df.select(*keys, bucket.alias("bucket"))
            .groupBy(*keys, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def hdr_percentiles(
    hist: DataFrame,
    quantiles: "list[float]",
    by: "str | list | None" = None,
) -> DataFrame:
    """Percentile UPPER BOUNDS from an :func:`hdr_histogram` frame:
    ``(by..., q_micro, upper_micro, n)`` — for each quantile q
    (carried in integer micro-units, so q=0.999 and q=0.9991 stay
    distinct rows and sub-percent ranks stay exact), the smallest
    bucket whose cumulative count reaches ``ceil(q·N)``, reported as
    the bucket's inclusive upper edge ``2^b − 1`` in value
    micro-units (0 for bucket 0). Pure integer arithmetic end to
    end, so the readout is oracle-exact; the true percentile lies
    within one binary order below the bound.

    Shape: one window cumsum per group over ≤ ~64 bucket rows + a
    map-side quantile explode — the heavy data never participates;
    only the tiny histogram does.
    """
    from pyspark.sql import Window
    if not quantiles:
        raise ValueError("hdr_percentiles: need at least one quantile")
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"hdr_percentiles: q must be in (0,1], "
                             f"got {q}")
    keys = _by_list(by)
    w = (Window.partitionBy(*keys).orderBy("bucket")
         if keys else Window.orderBy("bucket"))
    cum = (hist.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(
               Window.partitionBy(*keys) if keys
               else Window.partitionBy()))
           .withColumn("q_micro", F.explode(F.array(
               *[F.lit(int(round(q * 1_000_000))) for q in quantiles]))))
    # rank = ceil(q*N) in integer arithmetic
    need = F.expr("(q_micro * n + 999999) DIV 1000000")
    hit = cum.filter(F.col("cum") >= need)
    upper = (F.when(F.col("bucket") == 0, F.lit(0))
             .otherwise(F.pow(F.lit(2.0), F.col("bucket")
                              .cast("double")).cast("long") - 1))
    agg_keys = keys + ["q_micro"]
    return (hit.groupBy(*agg_keys)
            .agg(F.min(upper).alias("upper_micro"),
                 F.min("n").alias("n")))


# ---------------------------------------------------------------------
# Misra-Gries heavy hitters (exact phi-frequent items in two passes)
# ---------------------------------------------------------------------

def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """EXACT phi-heavy hitters (phi = 1/k): every item whose count
    strictly exceeds ``n/k``, with its exact count — found without
    ever shuffling the full key set. ``(value_col, n, n_total,
    freq_micro)``.

    Two passes over the data, both bounded:

    1. **Candidate generation** — a zero-shuffle Arrow partial runs
       Misra-Gries summaries (Misra & Gries 1982; the batched prune is
       the SpaceSaving-style merge of Berinde et al., PODS 2009) with
       ``k`` counters per partition. Each batch's value counts merge
       into the summary; past ``k`` entries the (k+1)-th largest count
       ``m`` is subtracted from everything and non-positives drop.
       Every prune discards ≥ (k+1)·m weight, so per-partition
       decrements total ≤ n_p/(k+1) — any item with local count
       > n_p/(k+1) survives. If an item's GLOBAL count exceeds n/k,
       then by averaging some partition holds it with local count
       > n_p/k ≥ n_p/(k+1): the global candidate set has **no false
       negatives**. Output is ≤ partitions·k rows no matter the input.
    2. **Exact recount** — the candidate ids broadcast back as a LEFT
       SEMI join (the big side never shuffles); one partial-combining
       groupBy over the ≤ partitions·k surviving keys recounts them
       exactly, and ``count·k > n_total`` drops the false positives.

    The result is therefore NOT an approximation: it equals the exact
    ``GROUP BY HAVING count·k > n`` answer, at the cost of two scans
    instead of one full-key shuffle. Contrast with
    :func:`countmin_build`: count-min answers point queries with
    bounded overestimates; this enumerates the over-threshold set
    exactly. NULL values are rejected loudly (``_not_null``).

    Reference scope: Beats has no frequency sketches; this serves the
    hot-key / hot-domain diagnosis its monitoring counters motivate
    (``libbeat/monitoring/`` exposes only scalar totals).
    """
    if k < 2:
        raise ValueError(f"heavy_hitters: k must be >= 2, got {k}")
    import numpy as np
    import pandas as pd

    vtype = dict(df.dtypes)[value_col]
    base = df.select(
        _not_null(F.col(value_col), "heavy_hitters", value_col)
        .alias("v"))
    kk = int(k)

    def partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc = None
        for pdf in batches:
            vals, cnts = np.unique(pdf["v"].to_numpy(), return_counts=True)
            s = pd.Series(cnts.astype("int64"), index=vals)
            # aligned add promotes to float64 — exact below 2^53,
            # far above any per-partition row count
            acc = s if acc is None else acc.add(s, fill_value=0)
            if len(acc) > kk:
                a = acc.to_numpy()
                m = np.partition(a, -kk - 1)[-kk - 1]  # (k+1)-th largest
                acc = acc[acc > m] - m
        if acc is not None and len(acc):
            yield pd.DataFrame({"v": acc.index.to_numpy(),
                                "est": acc.to_numpy("int64")})

    cand = (_spread(base)
            .mapInPandas(partial, schema=f"v {vtype}, est long")
            .select("v").distinct())
    tot = base.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (base.join(F.broadcast(cand), "v", "left_semi")
             .groupBy("v")
             .agg(F.count(F.lit(1)).alias("n")))
    return (exact.join(F.broadcast(tot))
            .filter(F.col("n") * kk > F.col("n_total"))
            .select(F.col("v").alias(value_col), "n", "n_total",
                    F.expr("n * 1000000 DIV n_total")
                    .cast("long").alias("freq_micro")))
