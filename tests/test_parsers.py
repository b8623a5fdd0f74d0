"""Parser chain compiler (reader/parser/parser.go): multiline →
ndjson → container → syslog → include_message composition."""

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.parsers import (
    compile_parsers, parse_container, parse_ndjson,
)


def test_parse_ndjson_schema_and_message_key(spark):
    df = spark.createDataFrame(
        [('{"msg":"hello","level":"info","n":3}',),
         ("not json",), (None,)],
        "message string")
    out = parse_ndjson(df, schema="msg string, level string, n int",
                       message_key="msg")
    rows = out.collect()
    assert rows[0]["message"] == "hello"
    assert rows[0]["level"] == "info" and rows[0]["n"] == 3
    assert "json_parsing_error" in rows[1]["log_flags"]
    assert rows[1]["message"] == "not json"      # fallback keeps raw
    assert rows[2]["log_flags"] == []


def test_parse_container_streams(spark):
    df = spark.createDataFrame(
        [('{"log":"docker line\\n","stream":"stdout","time":"2024-01-02T03:04:05Z"}',),
         ("2024-01-02T03:04:06Z stderr F cri line",)],
        "message string")
    out = parse_container(df)
    rows = {r["container_stream"]: r for r in out.collect()}
    assert rows["stdout"]["message"] == "docker line"
    assert rows["stderr"]["message"] == "cri line"
    assert rows["stdout"]["container_time"] is not None
    only = parse_container(df, stream="stderr").collect()
    assert len(only) == 1 and only[0]["message"] == "cri line"


def test_compile_parsers_multiline_then_filter(spark):
    # lines of one "file": multiline joins the traceback into its
    # event, include_message keeps the error event only — byte-exact
    lines = [
        ("f1", 0, "ok request served"),
        ("f1", 1, "boom: handler panicked"),
        ("f1", 2, "  at deep.stack(frame.go:1)"),
        ("f1", 3, "fine again"),
    ]
    df = spark.createDataFrame(lines,
                               "path string, line_no int, message string")
    chain = compile_parsers([
        {"multiline": {"pattern": r"^\s", "match": "after"}},
        {"include_message": {"patterns": ["boom"]}},
    ], partition_cols=["path"])
    rows = chain(df).collect()
    assert len(rows) == 1
    assert rows[0]["message"] == \
        "boom: handler panicked\n  at deep.stack(frame.go:1)"


def test_compile_parsers_ndjson_then_filter(spark):
    lines = [
        ("f1", 0, '{"msg":"ok request","level":"info"}'),
        ("f1", 1, '{"msg":"boom","level":"error"}'),
    ]
    df = spark.createDataFrame(lines,
                               "path string, line_no int, message string")
    chain = compile_parsers([
        {"ndjson": {"schema": "msg string, level string",
                    "message_key": "msg"}},
        {"include_message": {"patterns": ["^boom$"]}},
    ], partition_cols=["path"])
    rows = chain(df).collect()
    assert len(rows) == 1
    assert rows[0]["level"] == "error" and rows[0]["message"] == "boom"


def test_compile_parsers_syslog(spark):
    df = spark.createDataFrame(
        [("f1", 0, "<13>Feb  5 17:32:18 host01 app: hello")],
        "path string, line_no int, message string")
    chain = compile_parsers([{"syslog": {"format": "rfc3164"}}],
                            partition_cols=["path"])
    row = chain(df).collect()[0]
    assert row["log_syslog_severity_code"] == 5
    assert row["syslog_hostname"] == "host01"


def test_compile_parsers_rejects_unknown(spark):
    with pytest.raises(ValueError):
        compile_parsers([{"nope": {}}])


def test_container_joins_partial_lines(spark):
    # docker_json.go Next loop: CRI 'P' lines and docker logs without a
    # trailing newline join with following lines through the first
    # final one; the joined event keeps the first part's ts/stream
    rows = [
        ("a", 1, "2024-01-02T03:04:05 stdout P par"),
        ("a", 2, "2024-01-02T03:04:06 stdout P tial "),
        ("a", 3, "2024-01-02T03:04:07 stdout F line"),
        ("a", 4, "2024-01-02T03:04:08 stderr F whole"),
        ("b", 1, '{"log":"no newline","stream":"stdout","time":"2024-01-02T03:04:09Z"}'),
        ("b", 2, '{"log":" continues\\n","stream":"stdout","time":"2024-01-02T03:04:10Z"}'),
    ]
    df = spark.createDataFrame(rows, "path string, line_no int, message string")
    from beats_spark.functions.parsers import parse_container
    out = {(r["path"], r["line_no"]): (r["message"], r["container_stream"],
                                       str(r["container_time"]))
           for r in parse_container(df).collect()}
    assert out[("a", 1)] == ("partial line", "stdout", "2024-01-02 03:04:05")
    assert out[("a", 4)] == ("whole", "stderr", "2024-01-02 03:04:08")
    assert out[("b", 1)] == ("no newline continues", "stdout",
                             "2024-01-02 03:04:09")
    assert len(out) == 3

    # partial: false turns joining off (the reference option)
    from beats_spark.functions.parsers import compile_parsers
    chain = compile_parsers([{"container": {"partial": False}}])
    assert chain(df).count() == 6


def test_container_partial_join_keeps_extra_columns(spark):
    # non-parser columns (offsets, host metadata, ...) survive the
    # partial join with the FIRST part's values
    rows = [
        ("a", 1, 100, "h1", "2024-01-02T03:04:05 stdout P par"),
        ("a", 2, 200, "h2", "2024-01-02T03:04:06 stdout F tial"),
        ("a", 3, 300, "h3", "2024-01-02T03:04:07 stderr F solo"),
    ]
    df = spark.createDataFrame(
        rows, "path string, line_no int, offset long, host string, "
              "message string")
    from beats_spark.functions.parsers import parse_container
    out = parse_container(df)
    assert out.columns == ["path", "line_no", "offset", "host",
                           "message", "container_stream",
                           "container_time"]
    got = {r["line_no"]: (r["message"], r["offset"], r["host"])
           for r in out.collect()}
    assert got == {1: ("partial", 100, "h1"), 3: ("solo", 300, "h3")}


def test_container_drops_unparsed_lines(spark):
    # docker_json.go Next: a line that fails to unmarshal is logged
    # and skipped; drop_unparsed=False keeps it with null parse cols
    rows = [
        ("a", 1, '{"log":"ok\\n","stream":"stdout","time":"2024-01-02T03:04:05Z"}'),
        ("a", 2, '{"log": broken json'),
        ("a", 3, "not a container line at all"),
        ("a", 4, "2024-01-02T03:04:07 stdout F cri ok"),
    ]
    df = spark.createDataFrame(rows, "path string, line_no int, message string")
    from beats_spark.functions.parsers import parse_container
    kept = sorted(r["line_no"] for r in parse_container(df).collect())
    assert kept == [1, 4]
    lax = parse_container(df, drop_unparsed=False)
    assert lax.count() == 4
