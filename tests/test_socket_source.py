"""Network stream input (beats_spark.streaming.sources): the frame
splitter ported from the reference's scan.go (vectors from
filebeat/inputsource/common/streaming/scan_test.go:28-175), parser-
chain parity between a tcp feed and a log file on identical lines,
and a live end-to-end run against a real TCP listener."""

import socket
import threading
import time

import pytest
from pyspark.sql import Row, functions as F

from beats_spark.streaming import (
    split_frames, frames_arrow, socket_lines, socket_pipeline,
)


# ---- ported reference vectors -------------------------------------

# TestCustomDelimiter (scan_test.go:28-104)
DELIM_CASES = [
    ("hello<END>bonjour<END>hola<END>hey", "<END>",
     ["hello", "bonjour", "hola", "hey"]),
    # half starting delimiter stays in the frame
    ("hello<END>bonjour<ENDhola<END>hey", "<END>",
     ["hello", "bonjour<ENDhola", "hey"]),
    # half ending delimiter stays in the frame
    ("hello<END>END>hola<END>hey", "<END>",
     ["hello", "END>hola", "hey"]),
    # trailing delimiter terminates the last frame, no empty event
    ("hello<END>bonjour<END>hola<END>hey<END>", "<END>",
     ["hello", "bonjour", "hola", "hey"]),
    ("hello;bonjour;hola;hey", ";",
     ["hello", "bonjour", "hola", "hey"]),
    ("", ";", []),
]

# TestOctetCounting (scan_test.go:106-175)
RFC6587_CASES = [
    ("<9> message 0\n<6> msg 1\n<3> message 2",
     ["<9> message 0", "<6> msg 1", "<3> message 2"]),
    ("13 <9> message 09 <6> msg 113 <3> message 2",
     ["<9> message 0", "<6> msg 1", "<3> message 2"]),
    # octet-counted frames may embed the delimiter
    ("14 <9> message \n010 <6> msg \n114 <3> message \n2",
     ["<9> message \n0", "<6> msg \n1", "<3> message \n2"]),
    ("14 <9> message \n0<6> msg 1\n14 <3> message \n2",
     ["<9> message \n0", "<6> msg 1", "<3> message \n2"]),
    ("<9> message 0\n10 <6> msg \n1<3> message 2",
     ["<9> message 0", "<6> msg \n1", "<3> message 2"]),
]


@pytest.mark.parametrize("text,delim,expected", DELIM_CASES)
def test_split_frames_delimiter_reference_vectors(text, delim, expected):
    assert split_frames(text, "delimiter", delim) == expected


@pytest.mark.parametrize("text,expected", RFC6587_CASES)
def test_split_frames_rfc6587_reference_vectors(text, expected):
    assert split_frames(text, "rfc6587") == expected


def test_split_frames_rfc6587_incomplete_tail_dropped():
    # bufio drops a non-advancing remainder at EOF
    assert split_frames("5 hello99 trunc", "rfc6587") == ["hello"]
    # octet counts are BYTES: two-byte utf-8 char counts as 2
    assert split_frames("3 éa2 ok", "rfc6587") == ["éa", "ok"]


def test_split_frames_empty_between_delimiters_kept():
    assert split_frames("a;;b", "delimiter", ";") == ["a", "", "b"]
    assert split_frames(None, "delimiter", ";") == []


def test_frames_arrow_matches_python_splitter(spark):
    chunks = ["a<END>b<END>", "one<END>two<ENDx<END>three", "", "solo"]
    df = spark.createDataFrame([Row(chunk=c) for c in chunks])
    got = (df.select(F.posexplode(
               frames_arrow(F.col("chunk"), "delimiter", "<END>"))
               .alias("pos", "frame"))
             .orderBy("frame").collect())
    expect = sorted(f for c in chunks
                    for f in split_frames(c, "delimiter", "<END>"))
    assert [r["frame"] for r in got] == expect


# ---- parser-chain parity: tcp feed == log file --------------------

LINES = [
    '{"level":"info","msg":"started","port":8080}',
    '{"level":"error","msg":"boom","port":8080}',
    'not json at all',
    '{"level":"info","msg":"done"}',
]
PARSERS = [{"ndjson": {"schema": "level string, msg string, port int",
                       "add_error_key": True}}]
PROCESSORS = [
    {"add_fields": {"target": "agent", "fields": {"kind": "tcp"}}},
    {"uppercase": {"fields": ["level"]}},
]
RULES = [{"index": "sink_err", "when": {"equals": {"level": "ERROR"}}}]


def _batch_socket_frame(spark):
    """The event shape socket_lines emits, built as a batch frame so
    the identical pipeline composition is comparable row-for-row."""
    rows = [Row(message=m, log_source_address="10.0.0.1:9000",
                log_offset=i) for i, m in enumerate(LINES)]
    return (spark.createDataFrame(rows)
            .withColumn("@timestamp",
                        F.timestamp_micros(F.lit(1_700_000_000_000_000))))


def _batch_file_frame(spark):
    rows = [Row(message=m, path="/var/log/app.log", line_no=i)
            for i, m in enumerate(LINES)]
    return spark.createDataFrame(rows)


def test_socket_pipeline_matches_file_pipeline(spark):
    """The point of the module: a tcp feed and a log file with the
    same parsers/processors/rules produce identical events."""
    from beats_spark.functions.parsers import compile_parsers
    from beats_spark.processors import compile_processors
    from beats_spark.routing import route

    via_socket = socket_pipeline(
        _batch_socket_frame(spark), parsers=PARSERS,
        processors=PROCESSORS, rules=RULES, default_sink="sink_ok")

    file_df = compile_parsers(PARSERS, field="message")(
        _batch_file_frame(spark))
    file_df = compile_processors(PROCESSORS)(file_df)
    file_df = route(file_df, list(RULES), default="sink_ok")

    cols = ["message", "level", "msg", "sink"]
    got = [tuple(r) for r in
           via_socket.select(*cols).orderBy("message").collect()]
    expect = [tuple(r) for r in
              file_df.select(*cols).orderBy("message").collect()]
    assert got == expect
    sinks = {r["sink"] for r in via_socket.select("sink").collect()}
    assert sinks == {"sink_ok", "sink_err"}


def test_socket_pipeline_batch_source_keeps_listener_columns(spark):
    out = socket_pipeline(_batch_socket_frame(spark), parsers=PARSERS)
    row = out.filter(F.col("msg") == "boom").collect()[0]
    assert row["log_source_address"] == "10.0.0.1:9000"
    assert row["@timestamp"] is not None


# ---- live end-to-end: real TCP listener → streaming query ---------

def _serve(payload: bytes, hold: threading.Event, port_box: list):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port_box.append(srv.getsockname()[1])
    conn, _ = srv.accept()
    conn.sendall(payload)
    hold.wait(30)  # keep the connection up until the query stops
    conn.close()
    srv.close()


def test_socket_lines_live_stream(spark, tmp_path):
    """End-to-end over a real socket: listener thread feeds ndjson
    lines; the streaming query runs the SAME compiled chain and lands
    routed rows in a memory sink."""
    hold = threading.Event()
    port_box: list = []
    payload = ("\n".join(LINES) + "\n").encode()
    t = threading.Thread(target=_serve, args=(payload, hold, port_box),
                         daemon=True)
    t.start()
    deadline = time.time() + 10
    while not port_box and time.time() < deadline:
        time.sleep(0.05)
    assert port_box, "listener did not come up"

    src = socket_lines(spark, "127.0.0.1", port_box[0],
                       max_message_size=200)
    assert src.isStreaming
    out = socket_pipeline(src, parsers=PARSERS, processors=PROCESSORS,
                          rules=RULES, default_sink="sink_ok")
    q = (out.writeStream.format("memory").queryName("sock_rows")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.table("sock_rows").count()
            if n >= len(LINES):
                break
            time.sleep(0.25)
        assert n == len(LINES)
        got = (spark.table("sock_rows")
               .select("message", "level", "sink",
                       "log_source_address")
               .orderBy("message").collect())
        assert [r["message"] for r in got] == sorted(LINES)
        by_msg = {r["message"]: r for r in got}
        err = by_msg['{"level":"error","msg":"boom","port":8080}']
        assert err["level"] == "ERROR" and err["sink"] == "sink_err"
        assert by_msg["not json at all"]["sink"] == "sink_ok"
        assert all(r["log_source_address"].endswith(str(port_box[0]))
                   for r in got)
    finally:
        hold.set()
        q.stop()


def test_truncate_frames_is_byte_based(spark):
    """max_message_size is a BYTE limit (inputsource/tcp/config.go:36):
    a message of multibyte chars truncates on encoded size; a cut that
    would land mid-rune retreats to the previous rune boundary, so the
    result is always valid utf-8 and ≤ the cap in BYTES."""
    from beats_spark.streaming import truncate_frames
    rows = [Row(message="a" * 30),     # 30 bytes → cut at 21
            Row(message="é" * 12),     # 24 bytes; 21 is mid-rune → 20
            Row(message="日" * 10),    # 30 bytes; 21 lands on a rune
            Row(message="short")]      # 5 bytes → untouched
    out = truncate_frames(spark.createDataFrame(rows), 21)
    got = {r["message"][:1]: r for r in out.collect()}
    a = got["a"]
    assert a["truncated"] and a["message"] == "a" * 21
    e = got["é"]
    assert e["truncated"] and e["message"] == "é" * 10
    assert len(e["message"].encode()) == 20 <= 21
    j = got["日"]
    assert j["truncated"] and j["message"] == "日" * 7
    assert len(j["message"].encode()) == 21
    s = got["s"]
    assert not s["truncated"] and s["message"] == "short"


def test_split_frames_malformed_octet_count_raises():
    """A non-numeric octet count errors LOUDLY (the reference errors
    the connection, scan.go:67-70) — silent misframing is data loss."""
    with pytest.raises(ValueError, match="malformed octet count"):
        split_frames("1x3 rest", "rfc6587")
    with pytest.raises(ValueError, match="malformed octet count"):
        split_frames("1_3 underscore int", "rfc6587")


def test_socket_pipeline_orders_by_receive_sequence(spark):
    """Order-sensitive parsers use log_offset (receive order), not the
    per-batch-constant @timestamp: a multiline join over a tcp feed
    must group continuation lines deterministically."""
    lines = ["hdr one", "  c1", "  c2", "hdr two", "  c3"]
    rows = [Row(message=m, log_source_address="10.0.0.1:9",
                log_offset=i) for i, m in enumerate(lines)]
    src = (spark.createDataFrame(rows)
           .withColumn("@timestamp",
                       F.timestamp_micros(F.lit(1_700_000_000_000_000))))
    out = socket_pipeline(
        src, parsers=[{"multiline": {"pattern": r"^\s", "negate": False,
                                     "match": "after"}}],
        default_sink=None)
    msgs = sorted(r["message"] for r in out.collect())
    assert msgs == ["hdr one\n  c1\n  c2", "hdr two\n  c3"]


def test_socket_frames_plan_is_one_kernel_no_exchange(spark, sf_dir):
    """The framing splitter is ONE Arrow kernel feeding a JVM
    posexplode — zero exchanges (PLANS.md invariant)."""
    from beats_spark.queries import QUERIES
    df = QUERIES["socket_frames"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
