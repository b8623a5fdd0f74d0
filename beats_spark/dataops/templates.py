"""Log template mining and counter anomaly flags — the two analytics
every log platform layers directly on the shipped event stream
(pattern grouping and spike detection on the pipeline's own
monitoring counters, reference counters: libbeat/monitoring).

Template mining is the Drain-style first approximation: mask the
variable tokens (uuids, hex ids, ips, numbers) with typed
placeholders, then group identical masked lines. One map-side
regexp_replace chain + one partial-aggregated groupBy — no Python,
no iteration; at 10^12 lines the shuffle carries one row per
(template) per map task.

Anomaly flags are deliberately INTEGER-EXACT: the trailing-window
z-score test ``|x - mean| > z * stddev`` is evaluated as the
cross-multiplied integer inequality

    (x*n - s)^2 * (n - 1)  >  z^2 * n * (n*q - s^2)

over the window's integer count sums (``n`` points, ``s = Σc``,
``q = Σc²``), which is algebraically identical to ``z² < ((x-s/n)² /
sample_var)`` but involves no float mean/variance at all — so Spark,
DuckDB, and any SQL engine agree bit-for-bit on every flag (float
stddev functions differ in summation order and estimator formula
across engines; integer cross-multiplication sidesteps both).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["TEMPLATE_MASKS", "count_anomalies", "log_templates",
           "mad_outliers", "template_col"]

# order matters: longer/more specific shapes first so '<num>' cannot
# eat the digits inside a uuid or hex literal first
TEMPLATE_MASKS: Tuple[Tuple[str, str], ...] = (
    (r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
     r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<uuid>"),
    (r"0x[0-9a-fA-F]+", "<hex>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<ip>"),
    (r"\d+", "<num>"),
)


def template_col(col, masks: Sequence[Tuple[str, str]] = TEMPLATE_MASKS):
    """The masked-template Column: chained ``regexp_replace`` over the
    (pattern, placeholder) table — pure JVM, codegen-friendly. The
    same table drives the SQL oracle (DuckDB needs the 'g' flag;
    Spark replaces globally by default)."""
    out = col
    for pat, rep in masks:
        out = F.regexp_replace(out, pat, rep)
    return out


def log_templates(
    df: DataFrame,
    text_col: str = "message",
    masks: Sequence[Tuple[str, str]] = TEMPLATE_MASKS,
    min_count: int = 1,
) -> DataFrame:
    """Group log lines by masked template:
    ``(template, n_lines, example)`` where example is the
    lexicographically smallest raw line of the template (min, not
    first — deterministic under any shuffle). ``min_count`` drops
    the long tail of one-off templates."""
    t = df.select(template_col(F.col(text_col), masks).alias("template"),
                  F.col(text_col).alias("__raw"))
    out = (t.groupBy("template")
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.min("__raw").alias("example")))
    return out.filter(F.col("n_lines") >= min_count)


def count_anomalies(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    count_col: str,
    trailing: int = 24,
    min_points: int = 6,
    z: int = 3,
) -> DataFrame:
    """Flag count buckets that sit more than ``z`` sample standard
    deviations from their trailing-window mean, per group — spike /
    drop detection on pipeline counters. Input is already bucketed
    (one row per (group, bucket) with an integer count); output adds
    ``n_prior`` (trailing points seen) and ``is_anomaly``
    (true/false, or NULL while fewer than ``min_points`` priors).

    The test is evaluated as the integer cross-multiplied inequality
    documented in the module docstring — no float mean/stddev, so
    every engine produces identical flags. A zero-variance window
    flags any deviation (the inequality degenerates to
    ``(x*n - s)² > 0``), which is the strictest consistent reading.

    One window over ``partitionBy(group) orderBy(bucket)`` — a single
    exchange; the frame carries integer sums only.
    """
    if min_points < 2:
        raise ValueError("count_anomalies: min_points must be >= 2 "
                         "(sample variance needs n-1 > 0)")
    # decimal(38,0) (≡ DuckDB HUGEINT in the oracle): the squared
    # terms overflow BIGINT once a bucket holds ~10^8+ events, and
    # this runs on the already-aggregated counter table (groups ×
    # buckets rows), so exact wide arithmetic costs nothing
    c = F.col(count_col).cast("decimal(38,0)")
    w = (Window.partitionBy(group_col).orderBy(bucket_col)
         .rowsBetween(-trailing, -1))
    x = c
    n = F.count(c).over(w)
    s = F.sum(c).over(w)
    q = F.sum(c * c).over(w)
    d = x * n - s
    lhs = d * d * (n - F.lit(1))
    rhs = F.lit(int(z) * int(z)) * n * (n * q - s * s)
    flag = F.when(n < F.lit(int(min_points)),
                  F.lit(None).cast("boolean")).otherwise(lhs > rhs)
    return (df.withColumn("n_prior", n.cast("int"))
              .withColumn("is_anomaly", flag))


def mad_outliers(
    df: DataFrame,
    key_col: str,
    x_col: str,
    z: int = 3,
    c_tenk: int = 14826,
) -> DataFrame:
    """Hampel filter: flag values more than ``z`` robust standard
    deviations from their group MEDIAN, where the robust sd is
    ``1.4826 × MAD`` (median absolute deviation) — the outlier test
    that, unlike the z-test (:func:`count_anomalies`), a few extreme
    values cannot mask by inflating the mean/stddev themselves.

    All-integer evaluation: ``x`` must be integral (pre-scale floats
    with ``round(v·k)``). With ``q = |2x − med2|`` (``med2 = 2·median``
    — doubling keeps even-count interpolated medians integral) and
    ``mad_q2 = 2·median(q) = 4·MAD``, the test
    ``|x−med| > z·1.4826·MAD`` cross-multiplies to
    ``2·q·10000 > z·c_tenk·mad_q2`` — BIGINTs end to end, so flags
    are engine-exact (the :func:`count_anomalies` discipline).
    ``mad_q2 = 0`` (over half the group identical) flags any
    deviation — the strictest consistent reading, same as the
    zero-variance z-test case.

    Plan: two aggregates and two joins, all keyed on ``key_col`` —
    one partitioning reused end to end; only (key, x) pairs move.
    """
    med = (df.groupBy(key_col)
           .agg((F.percentile(F.col(x_col), 0.5) * 2)
                .cast("long").alias("med2")))
    q = (df.join(med, key_col)
         .withColumn("__q", F.abs(2 * F.col(x_col) - F.col("med2"))))
    mad = (q.groupBy(key_col)
           .agg((F.percentile(F.col("__q"), 0.5) * 2)
                .cast("long").alias("mad_q2")))
    return (q.join(mad, key_col)
            .withColumn("is_outlier",
                        2 * F.col("__q") * F.lit(10000)
                        > F.lit(int(z)) * F.lit(int(c_tenk))
                        * F.col("mad_q2"))
            .drop("__q"))
