"""Outputs and codecs (SURVEY.md §2.8).

The reference's outputs are network clients with batching/retry; in
batch Spark those concerns collapse into the write action (task retry,
atomic commit). What remains meaningful — and is implemented here — is
each output's *data shaping*:

- codecs: ``json`` (``outputs/codec/json``) → ``to_json(struct(*))``;
  ``format`` (``outputs/codec/format``) → fmtstr-compiled line.
- ``fileout`` NDJSON with path format strings
  (``outputs/fileout/file.go``, ``pathformatstring.go``): the rotation
  knob becomes file sizing (``maxRecordsPerFile``); the path fmtstr
  becomes a partition column so one write fans out per rendered path.
- ``kafka`` partitioners ``random/round_robin/hash``
  (``outputs/kafka/partition.go:64-115``): become the repartitioning
  strategy + a ``key`` column.
- ``elasticsearch`` dead-letter policy (``elasticsearch/client.go:
  63-95``): rows failing a validity predicate route to a dead-letter
  table instead of failing the job.
- per-sink fan-out: ONE pass via ``partitionBy(sink)`` (the flagship
  default, beats_spark.pipeline) or N filtered writes when sinks need
  different shapes — ``write_sinks`` implements the latter.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .fmtstr import compile_fmtstr

__all__ = [
    "codec_json", "codec_format", "write_fileout", "kafka_shape",
    "es_bulk_shape", "lumberjack_frames", "LumberjackWindow",
    "split_dead_letter", "ttl_batch_split", "write_sinks",
    "write_console", "write_discard",
]


def ttl_batch_split(df: DataFrame, size_col: str,
                    batch_col: str = "batch",
                    order_col: str = "event_id",
                    max_batch_bytes: int = 1 << 20) -> DataFrame:
    """Batch-split-on-too-large, the publisher's ``ttlBatch.SplitRetry``
    (``libbeat/publisher/pipeline/ttl_batch.go:110-143``): a batch the
    output rejects as too large splits IN HALF by event index
    (``splitIndex = len(events)/2``), recursively, until each sub-batch
    fits ``max_batch_bytes`` — and a SINGLE event still over the cap
    cannot split (``len < 2`` → ``SplitRetry`` returns false), which the
    ES client turns into a drop + permanent error
    (``elasticsearch/client.go:330-341``). Here that event keeps its
    singleton sub-batch and is flagged ``too_large`` so the caller can
    route it through :func:`split_dead_letter`.

    Adds ``sub_batch`` (the sub-batch's first event index within its
    batch — stable under the halving tree) and ``too_large``. Every
    input row appears in exactly one sub-batch (the reference's
    outstandingEvents accounting = exactly-once delivery).

    Scale: one hash exchange on ``batch_col``; per-batch work is the
    linear halving recursion over an int array. Batches are queue
    flushes (bounded size), so group skew is bounded by design."""
    import numpy as np
    import pandas as pd

    out_schema = (", ".join(f"{c.name} {c.dataType.simpleString()}"
                            for c in df.schema)
                  + ", sub_batch bigint, too_large boolean")
    cap = int(max_batch_bytes)

    def split_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        sizes = pdf[size_col].to_numpy("int64")
        n = len(sizes)
        cum = np.concatenate([[0], np.cumsum(sizes)])
        lo_of = np.zeros(n, dtype="int64")
        too = np.zeros(n, dtype=bool)
        stack = [(0, n)]
        while stack:
            lo, hi = stack.pop()
            if cum[hi] - cum[lo] <= cap or hi - lo < 2:
                lo_of[lo:hi] = lo
                if hi - lo == 1 and sizes[lo] > cap:
                    too[lo] = True
            else:
                mid = lo + (hi - lo) // 2     # splitIndex = len/2
                stack.append((lo, mid))
                stack.append((mid, hi))
        pdf["sub_batch"] = lo_of
        pdf["too_large"] = too
        return pdf

    return df.groupBy(batch_col).applyInPandas(split_one, out_schema)


def codec_json(df: DataFrame, out_col: str = "value",
               columns: Optional[Sequence[str]] = None) -> DataFrame:
    """NDJSON codec: one JSON string per event
    (``codec/json/json.go``). Column subset preserves the reference's
    pruned-event encoding."""
    cols = list(columns) if columns else df.columns
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c)
                                                       for c in cols])))


def codec_format(df: DataFrame, template: str, out_col: str = "value",
                 timestamp_field: str = "@timestamp") -> DataFrame:
    """Plain-text codec driven by an event format string
    (``codec/format/format.go``)."""
    return df.withColumn(
        out_col, compile_fmtstr(template, timestamp_field=timestamp_field))


def write_fileout(df: DataFrame, base_dir: str, path_template: str = "",
                  codec: str = "json",
                  template: str = "",
                  max_records_per_file: int = 0,
                  timestamp_field: str = "@timestamp") -> None:
    """fileout: NDJSON (or format-codec) lines under
    ``base_dir/<rendered path>/``. The path format string renders to a
    partition column — one distributed write covers every distinct
    rendered path (``fileout/pathformatstring.go``); size-based
    rotation maps to ``maxRecordsPerFile``."""
    if codec == "json":
        shaped = codec_json(df)
    elif codec == "format":
        shaped = codec_format(df, template, timestamp_field=timestamp_field)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    writer = shaped.select(
        "value",
        (compile_fmtstr(path_template, timestamp_field)
         if path_template else F.lit("events")).alias("__path"))
    w = writer.write.mode("append").partitionBy("__path")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.format("text").save(base_dir)


def kafka_shape(df: DataFrame, topic_col: str = "sink",
                partitioner: str = "hash",
                key_fields: Optional[Sequence[str]] = None,
                num_partitions: int = 32,
                columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Shape a frame for a Kafka-like sink: (topic, key, value) with
    the reference's partitioner semantics (``kafka/partition.go``):
    ``hash`` co-locates by key fields, ``random``/``round_robin``
    spread uniformly. The Spark analog of the partitioner is the
    repartitioning applied before the write."""
    vcols = list(columns) if columns else [c for c in df.columns
                                           if c != topic_col]
    value = F.to_json(F.struct(*[F.col(c) for c in vcols])).alias("value")
    if partitioner == "hash" and key_fields:
        key = F.concat_ws("|", *[F.col(f).cast("string")
                                 for f in key_fields])
        out = df.select(F.col(topic_col).alias("topic"),
                        key.alias("key"), value)
        return out.repartition(num_partitions, F.col("topic"), F.col("key"))
    out = df.select(F.col(topic_col).alias("topic"),
                    F.lit(None).cast("string").alias("key"), value)
    return out.repartition(num_partitions)  # random/round_robin


def write_console(df: DataFrame, n: int = 20, codec: str = "json",
                  template: str = "") -> None:
    """console output (``outputs/console``): NDJSON (or format codec)
    to stdout — a debugging sink, driver-side by design."""
    shaped = (codec_json(df) if codec == "json"
              else codec_format(df, template))
    for row in shaped.select("value").take(n):
        print(row["value"])


def write_discard(df: DataFrame) -> int:
    """discard output (``outputs/discard``): consume and drop — the
    throughput-test sink; returns the consumed row count."""
    return df.count()


def split_dead_letter(df: DataFrame, valid: Column
                      ) -> Dict[str, DataFrame]:
    """ES-style dead-letter policy: rows failing the validity predicate
    go to the dead-letter frame with the failure reason attached
    instead of failing the batch (``elasticsearch/client.go:63-95``,
    ``dead_letter_index.go``)."""
    return {
        "ok": df.filter(valid),
        "dead_letter": df.filter(~F.coalesce(valid, F.lit(False))),
    }


def write_sinks(routed: DataFrame, out_dir: str,
                sink_col: str = "sink",
                shapes: Optional[Mapping[str, Any]] = None,
                sinks: Optional[Sequence[str]] = None,
                max_records_per_file: int = 0) -> None:
    """Per-sink filtered writes — used instead of ``partitionBy`` when
    sinks need different shapes (e.g. the ES-like sink keeps the full
    event, the LS-like sink applies the json codec, dropped keeps only
    counts). ``shapes`` maps sink name → transform(df) -> df.

    Pass ``sinks`` (the routing table's known sink names) on the hot
    path so no discovery job runs; when omitted, the names are
    discovered with a ``distinct()`` scan — fine for ad-hoc use, one
    extra full pass at scale.

    ``max_records_per_file`` is the batch-size ceiling at the file
    layer: no output file exceeds it (the write splits, never drops —
    the file-sink analog of :func:`ttl_batch_split`)."""
    shapes = shapes or {}
    names = (list(sinks) if sinks is not None else
             [r[0] for r in routed.select(sink_col).distinct().collect()])
    for name in names:
        part = routed.filter(F.col(sink_col) == name)
        shape = shapes.get(name)
        if shape is not None:
            part = shape(part)
        w = part.write.mode("overwrite")
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", int(max_records_per_file))
        w.parquet(os.path.join(out_dir, name))


def es_bulk_shape(df: DataFrame, index_col: str = "sink",
                  id_col: Optional[str] = None,
                  op_col: Optional[str] = None,
                  pipeline_col: Optional[str] = None,
                  columns: Optional[Sequence[str]] = None,
                  keep: Optional[Sequence[str]] = None) -> DataFrame:
    """Shape a routed frame into Elasticsearch ``_bulk`` request
    pairs — the output-side encoding of
    ``libbeat/outputs/elasticsearch/client.go:361-423``
    (bulkEncodePublishRequest / createEventBulkMeta): per event one
    ACTION line ``{"<op>":{"_index":…,"_id":…,"pipeline":…}}`` and
    one SOURCE line (the doc as JSON) — except ``delete``, which has
    no source and REQUIRES an id (``:409-414``; a delete without one
    is an encode error: here ``bulk_error`` is set and both lines are
    NULL, the row-level form of the reference dropping the event).

    Op semantics per the reference on modern ES (≥7.5): ``create`` is
    the default action, ``index`` when the event meta asks for it
    (``op_type: index``), ``delete`` for tombstones. Absent
    id/pipeline are OMITTED from the action JSON (``to_json`` drops
    NULL fields), matching the omitempty encoding.

    Output: ``(bulk_action, bulk_source, bulk_error)`` plus the
    index column — a ``foreachBatch`` sink concatenates
    action+"\\n"+source per row and POSTs per index group; the
    batch-size split for ``http.max_content_length`` is
    :func:`ttl_batch_split`. Pure codegen, zero shuffle."""
    vcols = list(columns) if columns else \
        [c for c in df.columns
         if c not in (index_col, id_col, op_col, pipeline_col)]
    idx = F.col(index_col)
    did = F.col(id_col) if id_col else F.lit(None).cast("string")
    pipe = (F.col(pipeline_col) if pipeline_col
            else F.lit(None).cast("string"))
    op = (F.lower(F.coalesce(F.col(op_col), F.lit("create")))
          if op_col else F.lit("create"))

    meta = F.struct(idx.alias("_index"), did.alias("_id"),
                    pipe.alias("pipeline"))
    action = F.when(op == "delete",
                    F.to_json(F.struct(meta.alias("delete")))) \
        .when(op == "index", F.to_json(F.struct(meta.alias("index")))) \
        .otherwise(F.to_json(F.struct(meta.alias("create"))))
    source = F.when(op != "delete",
                    F.to_json(F.struct(*[F.col(c) for c in vcols])))
    bad_delete = (op == "delete") & (did.isNull() | (did == ""))
    return df.select(
        *[F.col(c) for c in (keep or [])],
        idx.alias("_index"),
        F.when(~bad_delete, action).alias("bulk_action"),
        F.when(~bad_delete, source).alias("bulk_source"),
        F.when(bad_delete,
               F.lit("delete requires _id")).alias("bulk_error"))


class LumberjackWindow:
    """The logstash output's sliding window-size policy, ported
    exactly (``outputs/logstash/window.go:37-91``): grow by ×1.5
    toward the smaller of the current batch size and the max —
    but only past ``max_ok`` once the current size has actually
    succeeded — and halve on failure with a floor of 1
    (``logstash.go:30`` minWindowSize). This is the per-connection
    batch sizing a foreachBatch lumberjack sink consults before
    calling :func:`lumberjack_frames`; vectors from window_test.go
    are ported in tests/test_sinks.py."""

    MIN = 1
    DEFAULT_START = 10

    def __init__(self, start: int = DEFAULT_START,
                 max_window: int = 2048):
        self.window_size = int(start)
        self.max_ok_window_size = 0
        self.max_window_size = int(max_window)

    def get(self) -> int:
        return self.window_size

    def try_grow(self, batch_size: int) -> None:
        import math
        ws = self.window_size
        if ws <= batch_size:
            if self.max_ok_window_size < ws:
                self.max_ok_window_size = ws
                new = int(math.ceil(1.5 * ws))
                if ws <= batch_size < new:
                    new = batch_size
                if new > self.max_window_size:
                    new = self.max_window_size
                ws = new
            elif ws < self.max_ok_window_size:
                ws = int(math.ceil(1.5 * ws))
                if ws > self.max_ok_window_size:
                    ws = self.max_ok_window_size
            self.window_size = ws

    def shrink(self) -> None:
        ws = self.window_size // 2
        if ws < self.MIN:
            ws = self.MIN
        self.window_size = ws


def lumberjack_frames(df: DataFrame, batch_col: str, seq_col: str,
                      columns: Optional[Sequence[str]] = None
                      ) -> DataFrame:
    """Lumberjack v2 wire frames, engine-side (the logstash output's
    encoding; protocol per the public go-lumber client the reference
    links from ``outputs/logstash/sync.go:28``): per event one JSON
    data frame ``'2' 'J' seq(uint32 BE) len(uint32 BE) payload`` with
    1-based sequence numbers the ACK protocol ranges over, plus one
    window frame ``'2' 'W' count(uint32 BE)`` per batch announcing
    how many data frames follow. Output: ``(batch, kind, seq,
    frame binary)`` — the window row (kind='W', seq NULL) and the
    batch's data rows; a foreachBatch sink writes them in (batch,
    W-first, seq) order onto the socket. Optional zlib compression
    ('2C' frames) wraps the concatenated data frames transport-side.

    Frame bytes assemble JVM-side (the hex-pack spelling shared with
    community_id): data frames are a pure projection; the window
    frames are one partial-combining count per batch — the only
    exchange, carrying 12-byte rows."""
    from .processors.misc import be_bytes

    vcols = list(columns) if columns else \
        [c for c in df.columns if c not in (batch_col, seq_col)]
    payload = F.to_json(F.struct(*[F.col(c) for c in vcols]))

    def be4(col: Column) -> Column:
        return be_bytes(col, 8)

    data = df.select(
        F.col(batch_col).alias("batch"),
        F.lit("J").alias("kind"),
        F.col(seq_col).cast("long").alias("seq"),
        F.concat(F.lit(b"2J"), be4(F.col(seq_col)),
                 be4(F.octet_length(payload)),
                 F.encode(payload, "utf-8")).alias("frame"))
    window = (df.groupBy(F.col(batch_col).alias("batch"))
              .agg(F.count(F.lit(1)).alias("__n"))
              .select("batch", F.lit("W").alias("kind"),
                      F.lit(None).cast("long").alias("seq"),
                      F.concat(F.lit(b"2W"), be4(F.col("__n")))
                      .alias("frame")))
    return window.unionByName(data)
