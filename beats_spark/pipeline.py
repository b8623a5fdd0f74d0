"""The flagship end-to-end pipeline: harvest → parse → processor-chain →
enrich → route → per-sink outputs, with Beats-named metrics, lineage
and snapshot-watermark resume (BASELINE.json ``north_star``).

Stage → reference mapping:

1. harvest: the pages table scan *is* the harvester
   (``filestream/input.go:178-247``); one input partition ≈ one file.
2. multiline: continuation lines join their event inside each page —
   per-row Arrow UDF, **no shuffle** (``multiline/pattern.go``).
3. dissect: one Arrow-batched tokenizer pass, typed key columns
   (``dissect/processor.go``); parse failures → dead-letter route.
4. timestamp: layout parse of the extracted ts
   (``timestamp/timestamp.go:87``).
5. enrich: broadcast joins on host and lang — add_fields/geoip/dns
   emulation (SURVEY.md §2.5).
6. route: outil first-match-wins selector → ``sink`` column
   (``outil/select.go:209``).
7. output: ONE pass, ``partitionBy(sink)`` — all sinks written in a
   single action with counters observed on it (vs. the reference's
   queue + per-output workers; Spark's shuffle-free dynamic partition
   write is the batch analog).

Scale notes: the only shuffle in the whole plan is none at all — parse
and enrich are map-side (broadcast), the routed write is
partition-local. Hot-host skew therefore costs nothing here; it matters
only for host-keyed aggregations (see mlops/bench), where AQE +
salting handle it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpoint import Watermarks, new_run_id, snapshot_id_of
from .parse import parse_pages
from .metrics import attach_observation, metrics_rows, write_metrics
from .processors.enrich import broadcast_enrich
from .routing import route

__all__ = ["build_events", "build_routed", "run_pipeline", "SINKS",
           "TOKENIZER"]

TOKENIZER = 'ts=%{ts} level=%{level} host=%{host} bytes=%{bytes|long} msg="%{msg}"'
SINKS = ["sink_es", "sink_ls", "sink_dropped", "sink_deadletter"]


def build_events(pages: DataFrame) -> DataFrame:
    """pages → one row per multiline-joined event, dissect-parsed.

    Single fused mapInPandas stage (see ``beats_spark.parse``) — one
    Arrow round-trip for multiline + dissect + explode."""
    events = parse_pages(pages, TOKENIZER, pattern=r"^\s", negate=False,
                         match="after")
    events = events.withColumn(
        "event_ts",
        F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
    return events.drop("ts")


def build_routed(pages: DataFrame, host_meta: DataFrame,
                 lang_meta: DataFrame) -> DataFrame:
    """Full parse → enrich → route plan (lazy)."""
    events = build_events(pages)

    # enrich: geo/dns-ish lookup on host (dns/dns.go:80 append semantics,
    # tag_on_failure), label lookup on lang
    events = broadcast_enrich(
        events, host_meta, on="host", lookup_key="host",
        fields={"geo_country": "geo_country", "geo_city": "geo_city",
                "asn": "asn", "resolved_ip": "resolved_ip",
                "registered_domain": "registered_domain"},
        action="append", tag_on_failure="host_meta_miss")
    events = broadcast_enrich(
        events, lang_meta, on="lang", lookup_key="lang",
        fields={"lang_label": "lang_label", "sink_hint": "sink_hint"},
        action="append")

    # deterministic event id (fingerprint/fingerprint.go:72)
    events = events.withColumn(
        "event_id",
        F.sha2(F.concat_ws("|", F.col("url"), F.col("msg_idx")), 256))

    failed = F.array_contains(F.col("log_flags"), "dissect_parsing_error")
    routed = route(events, [
        {"index": "sink_deadletter", "when": failed},
        {"index": "sink_dropped", "when": {"equals": {"lang": "zz"}}},
        {"index": "%{[sink_hint]}"},
    ], default="sink_es")
    return routed


@dataclass
class PipelineRun:
    run_id: str
    out_dir: str
    metrics: Dict[str, int] = field(default_factory=dict)
    skipped: bool = False
    snapshot_id: Optional[str] = None
    # per_snapshot incremental mode: one PipelineRun per snapshot
    sub_runs: Optional[list] = None


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    host_meta: DataFrame,
    lang_meta: DataFrame,
    out_dir: str,
    run_id: Optional[str] = None,
    snapshot_id: Optional[str] = None,
    resume: bool = True,
    lineage: bool = True,
) -> PipelineRun:
    """Execute end-to-end with watermark resume and lineage.

    Output layout::

        out_dir/runs/<run_id>/routed/sink=<name>/*.parquet
        out_dir/metrics/            (run_id, name, value)
        out_dir/lineage/            (run_id, sink, src partition, count)
        out_dir/_watermarks/<run_id>.json
    """
    run_id = run_id or new_run_id()
    if snapshot_id is None:
        try:
            snapshot_id = snapshot_id_of(pages)
        except Exception:
            snapshot_id = "adhoc-" + run_id

    wm = Watermarks(out_dir)
    result = PipelineRun(run_id=run_id, out_dir=out_dir,
                         snapshot_id=snapshot_id)
    if resume and snapshot_id and wm.is_processed(snapshot_id):
        result.skipped = True
        return result

    routed = build_routed(pages, host_meta, lang_meta)
    routed, obs = attach_observation(routed, SINKS)

    routed_path = os.path.join(out_dir, "runs", run_id, "routed")
    (routed.write.mode("overwrite")          # idempotent per-run prefix
           .partitionBy("sink")
           .parquet(routed_path))

    rows = metrics_rows(obs)
    write_metrics(spark, rows, os.path.join(out_dir, "metrics"), run_id)
    result.metrics = dict(rows)

    if lineage:
        # read back the written files: column-pruned count per output
        # partition — cheap parquet-footer work, no recompute of the plan
        written = spark.read.parquet(routed_path)
        lin = (written
               .groupBy("sink", F.input_file_name().alias("file"))
               .count()
               .withColumn("run_id", F.lit(run_id)))
        lin.coalesce(1).write.mode("append").parquet(
            os.path.join(out_dir, "lineage"))

    wm.record(snapshot_id, run_id, result.metrics.get("events.total", 0))
    return result


def run_pipeline_incremental(
    spark: SparkSession,
    pages_table,                      # beats_spark.catalog.Table
    host_meta: DataFrame,
    lang_meta: DataFrame,
    out_dir: str,
    per_snapshot: bool = False,
) -> PipelineRun:
    """Catalog-driven resume: process ONLY the pages-table snapshots
    not yet watermarked (the north_rule's "checkpointed per Iceberg
    snapshot, resumes without reprocessing").

    Default mode (``per_snapshot=False``): all unprocessed snapshots
    are read and written as ONE combined run; their watermarks are all
    recorded after that single routed write, so a crash mid-run
    re-processes the whole unacked batch (output lands under a fresh
    idempotent run prefix — no duplicate rows, coarser-than-per-snapshot
    crash granularity). The combined ``events.total`` is recorded
    against the FIRST snapshot id; trailing ids ack with count 0 so
    per-snapshot counts are never inflated.

    ``per_snapshot=True``: each unprocessed snapshot becomes its OWN
    run + watermark, acked individually right after its routed write —
    true per-snapshot crash granularity (a crash loses at most the one
    in-flight snapshot) and accurate per-snapshot event counts, at the
    cost of one write job per snapshot. Returns the last run, with the
    per-run list in ``.sub_runs``."""
    wm = Watermarks(out_dir)
    processed = set(wm.processed_snapshots())
    pages, todo_ids = pages_table.read_incremental(spark, processed)
    if pages is None:
        r = PipelineRun(run_id=new_run_id(), out_dir=out_dir, skipped=True)
        return r

    if per_snapshot:
        runs = []
        for sid in todo_ids:
            snap = spark.read.parquet(pages_table._snap_dir(sid))
            runs.append(run_pipeline(
                spark, snap, host_meta, lang_meta, out_dir,
                snapshot_id=sid, resume=False))
        result = runs[-1]
        result.sub_runs = runs
        return result

    result = run_pipeline(
        spark, pages, host_meta, lang_meta, out_dir,
        snapshot_id=todo_ids[0], resume=False)
    for sid in todo_ids[1:]:
        # count 0: the combined batch total is already recorded against
        # todo_ids[0]; repeating it per snapshot would inflate sums
        wm.record(sid, f"{result.run_id}-{sid[:6]}", 0)
    return result
