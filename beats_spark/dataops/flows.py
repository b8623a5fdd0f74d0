"""Bidirectional network-flow aggregation — packetbeat's flows table
as a DataFrame op.

Reference semantics (``packetbeat/flows/``): a flow is keyed by the
CANONICAL 5-tuple — endpoints sorted so both directions land in one
flow (``flowid.go:244`` ``sortAddrWrite`` orders (addr, port) pairs
and keeps a direction flag), expires after an idle ``timeout``
(``flows.go:35`` ``defaultTimeout = 30s``), and reports per-direction
packet/byte counters (``counters.go``). The engine spelling replaces
the in-memory flow table + timeout worker with gap sessionization:
an idle gap > timeout starts a new flow record, which is the same
boundary the reference's expiry produces for a finite capture.

Plan: one hash exchange on the canonical key feeds BOTH the gap
window and the flow aggregate (same partitioning — the sessionize
lesson); per-flow cost is linear in its own packets. Packet payloads
never enter — only the 5-tuple, timestamp, and size columns move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["flow_aggregate"]


def flow_aggregate(
    df: DataFrame,
    src_col: str = "src_ip",
    dst_col: str = "dst_ip",
    sport_col: str = "src_port",
    dport_col: str = "dst_port",
    proto_col: str = "proto",
    ts_col: str = "ts",
    bytes_col: str = "n_bytes",
    timeout_s: int = 30,
) -> DataFrame:
    """Aggregate packet records into bidirectional flows:
    ``(proto, a_ip, a_port, b_ip, b_port, flow_start_us, packets_fwd,
    packets_rev, bytes_fwd, bytes_rev, duration_us)`` where endpoint
    ``a`` is the lexicographically smaller (ip, port) pair —
    ``forward`` means src = a, matching the reference's sorted-write
    + direction-flag scheme. A packet more than ``timeout_s`` after
    its flow's previous packet opens a NEW flow record (idle expiry).

    String IPs compare lexicographically (use zero-padded or
    canonical textual form for true numeric order — same policy
    either side of the oracle, so parity holds regardless).
    """
    if timeout_s < 1:
        raise ValueError(f"flow_aggregate: timeout_s must be >= 1, "
                         f"got {timeout_s}")
    from .events import _epoch_us

    src, dst = F.col(src_col), F.col(dst_col)
    sp, dp = F.col(sport_col).cast("int"), F.col(dport_col).cast("int")
    fwd = (src < dst) | ((src == dst) & (sp <= dp))
    base = df.select(
        F.col(proto_col).alias("proto"),
        F.when(fwd, src).otherwise(dst).alias("a_ip"),
        F.when(fwd, sp).otherwise(dp).alias("a_port"),
        F.when(fwd, dst).otherwise(src).alias("b_ip"),
        F.when(fwd, dp).otherwise(sp).alias("b_port"),
        fwd.alias("__fwd"),
        _epoch_us(df, ts_col).alias("__us"),
        F.col(bytes_col).cast("long").alias("__b"))
    key = ["proto", "a_ip", "a_port", "b_ip", "b_port"]
    w = Window.partitionBy(*key).orderBy("__us")
    gap = F.col("__us") - F.lag("__us").over(w)
    new_flow = (gap.isNull()
                | (gap > F.lit(int(timeout_s) * 1_000_000))) \
        .cast("long")
    flowed = base.withColumn(
        "__flow",
        F.sum(new_flow).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (flowed.groupBy(*key, "__flow")
            .agg(F.min("__us").alias("flow_start_us"),
                 F.sum(F.col("__fwd").cast("long"))
                 .alias("packets_fwd"),
                 F.sum((~F.col("__fwd")).cast("long"))
                 .alias("packets_rev"),
                 F.sum(F.when(F.col("__fwd"), F.col("__b"))
                       .otherwise(0)).cast("long").alias("bytes_fwd"),
                 F.sum(F.when(~F.col("__fwd"), F.col("__b"))
                       .otherwise(0)).cast("long").alias("bytes_rev"),
                 (F.max("__us") - F.min("__us")).alias("duration_us"))
            .drop("__flow"))
