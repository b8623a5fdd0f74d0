"""Network stream inputs — the tcp/unix listener family as a
Structured Streaming source (SURVEY.md §2.1; VERDICT r3 next-round
item 4).

Reference mapping:

- event shape — ``filebeat/input/net/manager.go:222-235``: one event
  per frame with ``message`` (the frame text), ``log.source.address``
  and the receive timestamp;
- framing — ``filebeat/inputsource/common/streaming/scan.go``:
  ``delimiter`` (custom delimiters stripped, a doubled trailing
  delimiter dropped defensively) and ``rfc6587`` (octet-counted or
  non-transparent syslog framing, auto-detected per frame by the
  leading digit);
- truncation — ``inputsource/tcp/config.go:36``
  (``max_message_size``): oversized frames are cut and flagged, like
  the splitHandler's ``metadata.Truncated``.

Direction inversion: the reference LISTENS for connections; Spark's
socket source CONNECTS to ``host:port`` and consumes newline-split
text. The pipeline semantics downstream (parser chain → processor
chain → router) are identical, and they are the point — this module
exists so a syslog/tcp feed drops into the SAME compiled chain as
files. Because the Spark source pre-splits on ``\\n`` (Java
``readLine`` also strips a trailing ``\\r`` — byte-compatible with the
reference's ``bufio.ScanLines``), non-newline framings are re-derived
per received line with one Arrow kernel porting the reference
splitter: an octet-counted stream legitimately carries several frames
per line.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, List, Mapping, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parsers import compile_parsers
from ..processors import compile_processors
from ..routing import route

__all__ = ["datagram_events", "split_frames", "frames_arrow",
           "truncate_frames", "socket_lines", "socket_pipeline",
           "kafka_source", "kafka_events", "expand_event_list",
           "redis_slowlog_events"]


def split_frames(data: "str | None", framing: str = "delimiter",
                 delimiter: str = "\n") -> List[str]:
    """Split one received chunk into frames — a Python port of the
    reference split functions (``scan.go:28-48`` FactoryDelimiter,
    ``scan.go:52-99`` FactoryRFC6587Framing), evaluated at EOF over a
    complete chunk.

    rfc6587: a frame starting with a digit is octet-counted
    (``<len> <len BYTES>``); otherwise non-transparent (delimiter-
    terminated). An incomplete octet-counted tail is dropped, exactly
    as ``bufio.Scanner`` drops a non-advancing remainder at EOF.
    Arithmetic runs over utf-8 BYTES (octet counts count bytes, not
    chars), then each frame decodes back — byte-identical to the Go
    splitters on any utf-8 feed whose frames are themselves valid
    utf-8 (an rfc6587 count landing mid-rune means they are not; that
    raises the loud ValueError below where Go would pass raw bytes
    through). A trailing delimiter terminates the last frame without
    emitting an empty one (bufio stops at eof+empty); empty frames
    BETWEEN delimiters are kept, as in Go.

    Vectors: ``scan_test.go:28-175`` (ported in
    tests/test_socket_source.py)."""
    if not data:
        return []
    b = data.encode("utf-8")
    delim = delimiter.encode("utf-8")

    def drop_delim(tok: bytes) -> str:
        # dropDelimiter (scan.go:43-48): strip ONE trailing delimiter
        # if the token is longer than it (doubled-delimiter defense)
        if len(tok) > len(delim) and tok.endswith(delim):
            tok = tok[:-len(delim)]
        return tok.decode("utf-8")

    out: List[str] = []
    n = len(b)
    if framing == "delimiter":
        i = 0
        while i < n:
            j = b.find(delim, i)
            if j >= 0:
                out.append(drop_delim(b[i:j]))
                i = j + len(delim)
                continue
            out.append(drop_delim(b[i:]))
            break
        return out
    if framing != "rfc6587":
        raise ValueError(f"unknown framing {framing!r}; "
                         "supported: delimiter, rfc6587")
    i = 0
    while i < n:
        if b[i:i + 1].isdigit():
            j = b.find(b" ", i)
            if j > i:
                if not b[i:j].isdigit():
                    # strconv.Atoi failure → the reference errors the
                    # CONNECTION (scan.go:67-70); a silent drop here
                    # would misframe everything after, invisibly
                    raise ValueError(
                        "rfc6587: malformed octet count "
                        f"{b[i:j]!r} at byte {i}")
                length = int(b[i:j])
                end = j + 1 + length
                if end <= n:
                    try:
                        out.append(b[j + 1:end].decode("utf-8"))
                    except UnicodeDecodeError as e:
                        # the count landed mid-rune: the frame is not
                        # utf-8 text (count computed in chars, or a
                        # binary feed). Go would emit the raw byte
                        # slice; a JVM string can't, so fail with the
                        # same loud contract as a malformed count
                        # instead of a raw codec error
                        raise ValueError(
                            f"rfc6587: octet count {length} at byte "
                            f"{i} cuts a utf-8 rune "
                            f"({e.reason})") from e
                    i = end
                    continue
            break  # incomplete octet frame at EOF: dropped
        j = b.find(delim, i)
        if j >= 0:
            out.append(drop_delim(b[i:j]))
            i = j + len(delim)
        else:
            out.append(drop_delim(b[i:]))
            break
    return out


def frames_arrow(col, framing: str = "delimiter",
                 delimiter: str = "\n"):
    """Arrow-batched frame splitter: chunk → ``array<string>`` of
    frames (then ``explode`` JVM-side). One vectorized Python node —
    the same fused-kernel shape as the parse stage."""
    @F.pandas_udf("array<string>")
    def _f(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in it:
            yield ser.map(lambda d: split_frames(d, framing, delimiter))
    return _f(col)


def truncate_frames(df: DataFrame, max_message_size: int,
                    col: str = "message") -> DataFrame:
    """``max_message_size`` truncation + ``truncated`` flag. The
    reference's limit is a BYTE limit (``inputsource/tcp/config.go:
    36``), not characters: cut on the utf-8 encoding. A cut landing
    mid-rune retreats to the previous rune boundary (a JVM string
    cannot carry the invalid bytes a Go byte-slice cut keeps), so the
    result is always ≤ the cap and always valid utf-8 — pure codegen,
    no Python stage on the default path."""
    m = int(max_message_size)
    bin_ = F.encode(F.col(col), "utf-8")
    # NULL message → truncated=false (not NULL), so boolean filters on
    # either polarity see the row exactly once
    over = F.coalesce(F.octet_length(col) > m, F.lit(False))

    def cont(pos: int):
        # the byte AT pos is a utf-8 continuation byte (0x80..0xBF) —
        # binary comparison is unsigned lexicographic
        b = F.substring(bin_, pos, 1)
        return (b >= F.lit(bytes([0x80]))) & (b <= F.lit(bytes([0xBF])))

    # cutting after byte k is safe iff byte k+1 starts a rune; runes
    # are ≤4 bytes so at most 3 retreat steps are ever needed
    safe_cut = (F.when(~cont(m + 1), m)
                 .when(~cont(m), m - 1)
                 .when(~cont(m - 1), m - 2)
                 .otherwise(m - 3))
    cut = F.decode(F.substring(bin_, 1, safe_cut), "utf-8")
    return (df.withColumn("truncated", over)
              .withColumn(col, F.when(over, cut).otherwise(F.col(col))))


def socket_lines(
    spark: SparkSession,
    host: str = "localhost",
    port: int = 9999,
    framing: str = "delimiter",
    line_delimiter: str = "\n",
    max_message_size: Optional[int] = None,
) -> DataFrame:
    """Streaming frame source: ``(message, truncated?, @timestamp,
    log_source_address)`` rows from a TCP text feed — the event shape
    of ``input/net/manager.go:222-235``.

    With the default newline framing the source's own line split IS
    the reference's ``bufio.ScanLines``; any other (framing,
    delimiter) pair re-splits each received line through the ported
    splitter kernel. ``max_message_size`` truncates frames BY BYTES
    and flags them (``truncated`` column), mirroring the listener
    metadata.

    CONSTRAINT — Spark's socket source pre-splits the wire on ``\\n``
    before this kernel ever runs, so non-newline framings are correct
    only for feeds whose frames are ALSO newline-terminated and never
    embed ``\\n`` (the common device behavior for octet-counted
    syslog). An rfc6587 frame that legitimately embeds the delimiter
    needs an intact-chunk source: feed whole chunks through
    :func:`frames_arrow` on a batch/file path instead. Malformed
    octet counts fail the query loudly (the reference errors the
    connection) rather than silently misframing the remainder."""
    raw = (spark.readStream.format("socket")
           .option("host", host).option("port", port).load())
    if framing == "delimiter" and line_delimiter == "\n":
        msgs = raw.select(F.col("value").alias("message"))
    else:
        msgs = raw.select(
            F.explode(frames_arrow(F.col("value"), framing,
                                   line_delimiter)).alias("message"))
    if max_message_size is not None:
        msgs = truncate_frames(msgs, int(max_message_size))
    # NOTE no receive-order column: Spark bans
    # monotonically_increasing_id() on streaming frames — and it bans
    # window functions there too, so an order-sensitive parser
    # (multiline) over a LIVE socket must use the stateful form
    # (streaming.stateful_multiline), which orders within the state
    # handler. Batch REPLAY frames (socket captures) should carry a
    # log_offset column: socket_pipeline orders by it when present.
    return (msgs
            .withColumn("@timestamp", F.current_timestamp())
            .withColumn("log_source_address", F.lit(f"{host}:{port}")))


def datagram_events(
    df: DataFrame,
    value_col: str = "value",
    source_col: Optional[str] = None,
    max_message_size: int = 10240,
    ts_col: Optional[str] = None,
) -> DataFrame:
    """UDP datagram input shape (``filebeat/input/net/udp/input.go``;
    event shape ``input/net/manager.go:222-235``): one datagram = one
    event — NO framing, because UDP preserves message boundaries (the
    tcp/unix splitters never run on this path in the reference
    either). ``max_message_size`` mirrors
    ``inputsource/udp/config.go:31``: the reference reads each packet
    into a ``MaxMessageSize`` buffer, so an oversized datagram arrives
    CUT at the byte limit — same byte-budget truncation (+ flag) as
    the stream path, via :func:`truncate_frames`.

    Spark has no UDP streaming source (and UDP's lossiness makes a
    replayable capture table the honest representation anyway), so
    this shapes ANY DataFrame of datagrams — a packet-capture table, a
    Kafka topic of datagrams, a rate-source test feed — into the
    reference's event schema, after which :func:`socket_pipeline`
    applies the identical parser → processor → router chain as tcp and
    files. ``ts_col`` carries the capture timestamp through (a replay
    must not stamp wall-clock); live feeds default to
    ``current_timestamp``. Pure codegen projection, zero shuffle."""
    src = (F.col(source_col) if source_col
           else F.lit("udp")).alias("log_source_address")
    ts = (F.col(ts_col) if ts_col
          else F.current_timestamp()).alias("@timestamp")
    # pass lineage columns through (a replay table's packet/capture
    # ids); only the consumed columns are renamed away
    keep = [c for c in df.columns
            if c not in (value_col, source_col, ts_col)]
    out = df.select(*keep, F.col(value_col).alias("message"), src, ts)
    return truncate_frames(out, int(max_message_size))


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: "str | Sequence[str]",
    include_headers: bool = True,
    streaming: bool = True,
    **options: Any,
) -> DataFrame:
    """Kafka input front door (``filebeat/input/kafka/input.go``;
    SURVEY §2.1 "other inputs"): a thin, config-pass-through wrapper
    over Spark's own Kafka connector — ``readStream.format("kafka")``
    (or ``read`` for a bounded replay) with the subscription and any
    extra connector options applied verbatim. Returns the RAW wire
    frame (``key/value binary, topic, partition, offset, timestamp,
    headers``) so :func:`kafka_events` can shape it; keeping the two
    steps separate is what makes the shaping testable in-sandbox
    (no broker here — tests inject wire-shaped rows through the same
    :func:`kafka_events`, exactly as ``datagram_events`` replays
    capture tables).

    The reference's consumer-group options (group_id, initial_offset,
    rebalance, isolation_level — ``input/kafka/config.go``) map to
    connector options (``kafka.group.id``, ``startingOffsets``,
    ``kafka.isolation.level``); pass them through ``options``.
    """
    topic_list = ([topics] if isinstance(topics, str) else list(topics))
    reader = (spark.readStream if streaming else spark.read)
    r = (reader.format("kafka")
         .option("kafka.bootstrap.servers", bootstrap_servers)
         .option("subscribe", ",".join(topic_list))
         .option("includeHeaders", "true" if include_headers
                 else "false"))
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def expand_event_list(col, field: str):
    """``expand_event_list_from_field`` (``input/kafka/input.go:416``
    ``parseMultipleMessages``): the payload is one JSON object whose
    ``field`` holds an array of events; each element re-serializes to
    its own compact JSON message. Un-parseable payloads yield an
    EMPTY list (the reference logs and returns nothing — the row
    disappears rather than poisoning the chain). One Arrow kernel:
    arbitrary JSON elements can't re-serialize JVM-side, and the
    per-element ``json.Marshal`` is exactly a fused map step.

    Engine note: Go marshals map keys sorted; ``json.dumps(...,
    sort_keys=True)`` with compact separators reproduces that byte
    layout for string-keyed objects (the only kind JSON has).
    """
    import json

    @F.pandas_udf("array<string>")
    def _f(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(v):
            if v is None:
                return []
            if isinstance(v, (bytes, bytearray)):
                v = bytes(v).decode("utf-8", errors="replace")
            try:
                obj = json.loads(v)
                items = obj[field]
                if not isinstance(items, list):
                    return []
            except (ValueError, KeyError, TypeError):
                return []
            return [json.dumps(m, sort_keys=True,
                               separators=(",", ":")) for m in items]
        for ser in it:
            yield ser.map(one)
    return _f(col)


def kafka_events(
    df: DataFrame,
    expand_event_list_from_field: Optional[str] = None,
    include_headers: bool = True,
) -> DataFrame:
    """Shape Kafka wire frames into the reference's kafka-input event
    (``input/kafka/input.go:436-470`` composeEventMetadata /
    composeMessage): ``message`` = the value bytes as text,
    ``@timestamp`` = the broker message timestamp, and the ``kafka``
    field group flattened to ``kafka_topic / kafka_partition /
    kafka_offset / kafka_key`` plus ``kafka_headers`` — each header
    serialized ``"<key>: <value>"`` with ``:`` in the key masked to
    ``_`` (``arrayForKafkaHeaders``, ``input.go:226-241``).

    ``expand_event_list_from_field`` splits a JSON-array payload into
    one event per element (all elements share the frame's metadata,
    as the reference's ``listFromFieldReader`` does).

    Chain reuse: attaches ``log_source_address = topic/partition``
    and ``log_offset = offset`` so :func:`socket_pipeline` orders an
    order-sensitive parser (multiline) per Kafka partition by offset —
    Kafka's own ordering guarantee, the shape the reference consumes
    under. Everything except the optional expand kernel is a codegen
    projection: zero shuffle, zero Python on the default path."""
    cols = set(df.columns)

    def maybe(name, expr, typ):
        return (expr if name in cols
                else F.lit(None).cast(typ))

    key = maybe("key", F.col("key").cast("string"), "string")
    ts = maybe("timestamp", F.col("timestamp"), "timestamp")
    headers = None
    if include_headers and "headers" in cols:
        h = F.col("headers")
        headers = F.transform(
            h, lambda s: F.concat(
                F.regexp_replace(s["key"], ":", "_"),
                F.lit(": "),
                F.coalesce(s["value"].cast("string"), F.lit(""))))
    if headers is None:
        headers = F.lit(None).cast("array<string>")

    base = df.select(
        F.col("value").cast("string").alias("__payload"),
        maybe("topic", F.col("topic"), "string").alias("kafka_topic"),
        maybe("partition", F.col("partition").cast("int"), "int")
        .alias("kafka_partition"),
        maybe("offset", F.col("offset").cast("long"), "bigint")
        .alias("kafka_offset"),
        key.alias("kafka_key"),
        headers.alias("kafka_headers"),
        F.coalesce(ts, F.current_timestamp()).alias("@timestamp"))
    if expand_event_list_from_field:
        msg = F.explode(expand_event_list(
            F.col("__payload"), expand_event_list_from_field))
    else:
        msg = F.col("__payload")
    return (base.select(msg.alias("message"), "kafka_topic",
                        "kafka_partition", "kafka_offset", "kafka_key",
                        "kafka_headers", "@timestamp")
            .withColumn("log_source_address",
                        F.concat(F.col("kafka_topic"), F.lit("/"),
                                 F.col("kafka_partition")
                                 .cast("string")))
            .withColumn("log_offset", F.col("kafka_offset")))


def socket_pipeline(
    source: DataFrame,
    parsers: Sequence[Mapping[str, Any]] = (),
    processors: Sequence[Mapping[str, Any]] = (),
    rules: Sequence[Any] = (),
    default_sink: Optional[str] = "sink_default",
    sink_col: str = "sink",
) -> DataFrame:
    """Compose the full shipper chain over a (streaming or batch)
    frame source: config-ordered parsers → processor chain → routing
    selector — the exact compilers the file path uses, so a tcp feed
    and a log file with the same config produce identical events
    (asserted by tests/test_streaming.py::test_socket_*)."""
    out = source
    if parsers:
        order = ("log_offset" if "log_offset" in source.columns
                 else "@timestamp")
        out = compile_parsers(
            parsers, field="message",
            partition_cols=["log_source_address"],
            order_col=order)(out)
    if processors:
        out = compile_processors(processors)(out)
    if rules or default_sink is not None:
        out = route(out, list(rules), default=default_sink,
                    sink_col=sink_col)
    return out


def redis_slowlog_events(
    df: DataFrame,
    id_col: str = "slow_id",
    ts_col: str = "ts_epoch",
    duration_col: str = "duration_us",
    args_col: str = "args",
    client_addr_col: Optional[str] = "client_addr",
    client_name_col: Optional[str] = "client_name",
    role: str = "master",
) -> DataFrame:
    """Redis slowlog input (``filebeat/input/redis/harvester.go:
    160-240``): each SLOWLOG GET entry becomes one event — ``message``
    is the args joined with spaces, ``args[0]`` the command,
    ``args[1]`` the key, the remainder the (possibly confidential)
    argument tail which a drop_fields processor can remove, duration
    in µs, ``@timestamp`` the entry's epoch-second timestamp
    (``time.Unix(log.timestamp, 0)``), and the Redis 6.0+ client
    address/name attached only when non-empty (``:205-210``). The
    live SLOWLOG GET/RESET polling loop is connection plumbing (the
    same deployment-side stance as the tcp listener direction); this
    shapes a replay/capture table of entries — or a Kafka topic of
    them — into the reference's event, after which
    :func:`socket_pipeline` applies the shared chain. Pure codegen
    projection: zero Python, zero shuffle."""
    a = F.col(args_col)
    n = F.size(a)
    out = df.select(
        F.array_join(a, " ").alias("message"),
        F.col(id_col).cast("long").alias("redis_slowlog_id"),
        F.when(n > 0, a.getItem(0)).alias("redis_slowlog_cmd"),
        F.when(n > 1, a.getItem(1)).alias("redis_slowlog_key"),
        F.when(n > 2, F.slice(a, 3, F.greatest(n - 2, F.lit(0))))
        .alias("redis_slowlog_args"),
        F.col(duration_col).cast("long")
        .alias("redis_slowlog_duration_us"),
        F.lit(role).alias("redis_slowlog_role"),
        F.timestamp_seconds(F.col(ts_col).cast("long"))
        .alias("@timestamp"),
        *([F.when((F.col(client_addr_col) != "")
                  & F.col(client_addr_col).isNotNull(),
                  F.col(client_addr_col))
           .alias("redis_slowlog_client_addr")]
          if client_addr_col and client_addr_col in df.columns
          else []),
        *([F.when((F.col(client_name_col) != "")
                  & F.col(client_name_col).isNotNull(),
                  F.col(client_name_col))
           .alias("redis_slowlog_client_name")]
          if client_name_col and client_name_col in df.columns
          else []))
    return out
