"""WARC record parsing (functions/warc.py): spec semantics (byte-exact
Content-Length, folded headers, case-insensitive names), loud-failure
contracts, HTTP payload split, and the one-Python-node plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.warc import parse_warc, split_warc_records

BODY = "hello wörld — 多字节 body <html>&amp;</html>"
HTTP = ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
        "X-Cache: HIT\r\n\r\n" + BODY)


def _blob() -> str:
    return (
        "WARC/1.0\r\nwarc-type: response\r\n"          # case-insensitive
        "WARC-Target-URI: https://x.example/1\r\n"
        "WARC-Date: 2024-01-01T00:00:05Z\r\n"
        "WARC-Record-ID: <urn:uuid:1>\r\n"
        "Content-Type: application/http;\r\n"
        " msgtype=response\r\n"                        # folded header
        f"Content-Length: {len(HTTP.encode())}\r\n\r\n{HTTP}\r\n\r\n"
        "WARC/1.0\r\nWARC-Type: metadata\r\n"
        "WARC-Target-URI: https://x.example/1\r\n"
        "Content-Length: 11\r\n\r\nvia=crawler\r\n\r\n")


def test_warc_walk_byte_exact_and_http_split(spark):
    df = spark.createDataFrame([(7, _blob())], "blob_id int, warc string")
    rows = parse_warc(df, "warc", keep_source=True) \
        .orderBy("record_idx").collect()
    a, b = rows
    assert a["warc_type"] == "response"                # lowercased name
    assert a["content_type"] == "application/http; msgtype=response"
    assert a["content_length"] == len(HTTP.encode())   # BYTES, not chars
    assert a["body"] == BODY                           # byte-identical
    assert a["http_status"] == 404
    assert "X-Cache: HIT" in a["http_headers"]
    assert a["warc_date"].second == 5
    assert b["warc_type"] == "metadata"
    assert b["payload"] == "via=crawler"
    assert b["http_status"] is None and b["body"] is None
    assert [r["blob_id"] for r in rows] == [7, 7]


def test_warc_loud_failures_and_empty(spark):
    assert split_warc_records(None) == []
    assert split_warc_records("") == []
    with pytest.raises(ValueError, match="version line"):
        split_warc_records("GARBAGE")
    with pytest.raises(ValueError, match="separator"):
        split_warc_records(
            "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        split_warc_records(
            "WARC/1.0\r\nWARC-Type: x\r\n\r\npayload\r\n\r\n")
    with pytest.raises(ValueError, match="malformed header"):
        split_warc_records(
            "WARC/1.0\r\nNOCOLONHERE\r\nContent-Length: 1\r\n\r\nx\r\n\r\n")
    # a Content-Length that cuts a rune: from a str input (always
    # valid utf-8) the byte after the cut is a continuation byte,
    # never CR, so the separator check catches it first — the decode
    # guard in the module is defensive for future bytes-typed blobs
    with pytest.raises(ValueError, match="separator"):
        split_warc_records(
            "WARC/1.0\r\nContent-Length: 1\r\n\r\nö\r\n\r\n")


def test_warc_plan_one_python_node(spark):
    df = spark.createDataFrame([(1, _blob())], "i int, warc string")
    plan = (parse_warc(df, "warc")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1   # the record walk only
    assert "Exchange" not in plan               # pure projection
