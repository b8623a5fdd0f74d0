"""Pipeline counters, mirroring the reference's monitoring names.

Beats increments ``events.total/filtered/published/failed/dropped``
per pipeline client (``libbeat/publisher/pipeline/monitoring.go:87-113``,
``pipeline/client.go:170-188``) and per-output ``events.acked/...``
(``libbeat/outputs/metrics.go:93-110``).

Here counters ride the single write action via ``DataFrame.observe`` —
zero extra scans at any scale. Per-sink acked counts are conditional
sums over the routed ``sink`` column.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import Observation

__all__ = ["attach_observation", "metrics_rows", "write_metrics"]


def attach_observation(
    df: DataFrame,
    sinks: List[str],
    sink_col: str = "sink",
    failed_flag: str = "dissect_parsing_error",
) -> Tuple[DataFrame, Observation]:
    """Attach Beats-named counters to the frame; read them after the
    write action completes."""
    obs = Observation("pipeline")
    flags = (F.col("log_flags") if "log_flags" in df.columns
             else F.array().cast("array<string>"))
    exprs = [
        F.count(F.lit(1)).alias("events.total"),
        F.sum(F.when(F.array_contains(flags, failed_flag), 1).otherwise(0))
         .alias("events.failed"),
    ]
    for s in sinks:
        exprs.append(
            F.sum(F.when(F.col(sink_col) == s, 1).otherwise(0))
             .alias(f"output.{s}.events.acked"))
    return df.observe(obs, *exprs), obs


def metrics_rows(obs: Observation, extra: Dict[str, int] | None = None
                 ) -> List[Tuple[str, int]]:
    got = dict(obs.get)
    # events.published = total - dropped-by-filter happens upstream;
    # within the routed frame everything observed was published to a sink
    got["events.published"] = got.get("events.total", 0)
    if extra:
        got.update(extra)
    # sum() over zero rows observes null — an empty input is 0 events
    return sorted((k, int(v or 0)) for k, v in got.items())


def write_metrics(spark: SparkSession, rows: List[Tuple[str, int]],
                  path: str, run_id: str) -> None:
    df = spark.createDataFrame(
        [(run_id, k, v) for k, v in rows],
        "run_id string, name string, value bigint")
    df.coalesce(1).write.mode("append").parquet(path)
