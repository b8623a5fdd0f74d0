"""Tests for processors/misc.py: community_id, network direction,
move_fields, decode_xml, timeseries, data_stream, script hook."""

import base64
import hashlib
import socket
import struct

from pyspark.sql import functions as F

from beats_spark.processors import compile_processors


def _ref_community_id(seed, sip, sp, dip, dp, proto_num):
    """Independent reference implementation mirroring the packing of
    community_id_col (hex-char widths → big-endian bytes)."""
    a = (int.from_bytes(socket.inet_aton(sip), "big"), sp)
    b = (int.from_bytes(socket.inet_aton(dip), "big"), dp)
    if a > b:
        a, b = b, a

    def be(v, width_hex):
        return bytes.fromhex(format(v, f"0{width_hex}x"))

    payload = (be(seed, 4) + be(a[0], 8) + be(b[0], 8)
               + be(proto_num, 2) + be(0, 2) + be(a[1], 4) + be(b[1], 4))
    return "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()


def test_community_id_matches_reference(spark):
    rows = [
        ("192.168.1.10", 5555, "10.0.0.2", 80, "tcp"),
        ("10.0.0.2", 80, "192.168.1.10", 5555, "tcp"),   # reversed flow
        ("1.2.3.4", 1, "4.3.2.1", 2, "udp"),
    ]
    df = spark.createDataFrame(
        rows, "source_ip string, source_port int, destination_ip string, "
              "destination_port int, network_transport string")
    chain = compile_processors([{"community_id": {}}])
    out = {(r["source_ip"], r["source_port"]): r["network_community_id"]
           for r in chain(df).collect()}
    proto = {"tcp": 6, "udp": 17}
    for sip, sp, dip, dp, p in rows:
        assert out[(sip, sp)] == _ref_community_id(0, sip, sp, dip, dp,
                                                   proto[p])
    # direction independence
    assert out[("192.168.1.10", 5555)] == out[("10.0.0.2", 80)]


def test_add_network_direction(spark):
    df = spark.createDataFrame(
        [("10.1.2.3", "8.8.8.8"), ("8.8.8.8", "10.1.2.3"),
         ("10.1.2.3", "10.9.9.9"), ("1.1.1.1", "8.8.8.8")],
        "source_ip string, destination_ip string")
    chain = compile_processors([{"add_network_direction": {
        "internal_networks": ["10.0.0.0/8"]}}])
    got = [r["network_direction"] for r in chain(df).collect()]
    assert got == ["outbound", "inbound", "internal", "external"]


def test_move_fields(spark):
    df = spark.createDataFrame([(1, "a", "b")],
                               "id bigint, tmp_x string, tmp_y string")
    chain = compile_processors([{"move_fields": {"from": "tmp_", "to": "f_"}}])
    out = chain(df)
    assert set(out.columns) == {"id", "f_x", "f_y"}


def test_decode_xml(spark):
    xml = '<a p="1"><b>hi</b><c><d>deep</d></c></a>'
    df = spark.createDataFrame([(xml,), (None,), ("<broken",)],
                               "payload string")
    chain = compile_processors([
        {"decode_xml": {"field": "payload", "target_field": "xml"}}])
    rows = chain(df).collect()
    assert rows[0]["xml"] == {"a.p": "1", "a.b": "hi", "a.c.d": "deep"}
    assert rows[1]["xml"] is None
    assert rows[2]["xml"] is None


def test_timeseries_and_data_stream(spark):
    df = spark.createDataFrame([("h1", "cpu"), ("h1", "cpu"), ("h2", "cpu")],
                               "host string, metricset string")
    chain = compile_processors([
        {"timeseries": {"fields": ["host", "metricset"]}},
        {"add_data_stream": {"type": "metrics", "dataset": "system.cpu"}},
    ])
    rows = chain(df).collect()
    assert rows[0]["timeseries_instance"] == rows[1]["timeseries_instance"]
    assert rows[0]["timeseries_instance"] != rows[2]["timeseries_instance"]
    assert rows[0]["meta_raw_index"] == "metrics-system.cpu-default"


def test_script_columns_hook(spark):
    df = spark.createDataFrame([(2,)], "x bigint")
    chain = compile_processors([
        {"script": {"columns": {"y": F.col("x") * 10}}}])
    assert chain(df).collect()[0]["y"] == 20


def test_script_batch_fn_hook(spark):
    df = spark.createDataFrame([(1,), (2,)], "x bigint")

    def fn(batches):
        for pdf in batches:
            pdf["x"] = pdf["x"] + 100
            yield pdf

    chain = compile_processors([
        {"script": {"batch_fn": fn, "schema": "x bigint"}}])
    assert sorted(r["x"] for r in chain(df).collect()) == [101, 102]


def test_syslog_processor_form(spark):
    df = spark.createDataFrame(
        [("<13>Feb  5 17:32:18 host01 app[42]: something happened",)],
        "message string")
    chain = compile_processors([{"syslog": {"format": "rfc3164"}}])
    row = chain(df).collect()[0]
    assert row["log_syslog_severity_code"] == 5
    assert row["log_syslog_facility_code"] == 1
    assert row["syslog_hostname"] == "host01"
