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


# ------------------------------------------------- detect_mime_type

def _mime_of(spark, payloads):
    """payloads: list of bytes — returns the detected mime per row."""
    df = spark.createDataFrame([(p,) for p in payloads], "blob binary")
    chain = compile_processors([
        {"detect_mime_type": {"field": "blob", "target": "mime"}}])
    return [r["mime"] for r in chain(df).collect()]


def test_mime_reference_vectors(spark):
    """The reference's own table tests (libbeat/mime/mime_test.go),
    byte for byte — including the charset-suffixed text types its
    http.DetectContentType stage produces."""
    vectors = [
        (b"<html>Test</html>", "text/html; charset=utf-8"),
        (bytes.fromhex("4d5a90000300000004000000ffff"),
         "application/vnd.microsoft.portable-executable"),
        (bytes.fromhex(
            "7f454c460101010000000000000000000300030001000000f0dc0100"
            "3400000080a318000000000034002000080028001e001d0001"),
         "application/x-executable"),
        (bytes.fromhex(
            "cffaedfe070000010300000002000000100000005805000085002000"
            "0000000019000000480000005f5f504147455a45524f"),
         "application/x-mach-binary"),
        (b"{}", "application/json"),
        (b"<test></test>", "text/xml"),
        (b"Hello world!", "text/plain; charset=utf-8"),
        (bytes.fromhex(
            "89504e470d0a1a0a0000000d494844520000025800000258080200"
            "000031040f8b0000000467414d410000b18f0bfc610500"),
         "image/png"),
    ]
    got = _mime_of(spark, [v[0] for v in vectors])
    assert got == [v[1] for v in vectors]


def test_mime_broadened_magic_table(spark):
    vectors = [
        (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
        (b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/x-wav"),
        (b"RIFF\x00\x00\x00\x00AVI LIST", "video/x-msvideo"),
        (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
        (b"\x00\x00\x00\x14ftypqt  ", "video/quicktime"),
        (b"\x1a\x45\xdf\xa3\x00\x00webm\x00", "video/webm"),
        (b"\x1a\x45\xdf\xa3\x00matroska", "video/x-matroska"),
        (b"ID3\x04\x00\x00\x00", "audio/mpeg"),
        (b"OggS\x00\x02", "audio/ogg"),
        (b"fLaC\x00\x00\x00\x22", "audio/x-flac"),
        (b"MThd\x00\x00\x00\x06", "audio/midi"),
        (b"%PDF-1.7", "application/pdf"),
        (b"PK\x03\x04\x14\x00", "application/zip"),
        (b"\x1f\x8b\x08\x00", "application/gzip"),
        (b"BZh91AY", "application/x-bzip2"),
        (bytes.fromhex("fd377a585a0000"), "application/x-xz"),
        (bytes.fromhex("28b52ffd240000"), "application/zstd"),
        (bytes.fromhex("377abcaf271c0004"),
         "application/x-7z-compressed"),
        (b"\x00asm\x01\x00\x00\x00", "application/wasm"),
        (b"wOFFOTTO", "application/font-woff"),
        (b"wOF2OTTO", "application/font-woff2"),
        (b"SQLite format 3\x00", "application/x-sqlite3"),
        (b"{\\rtf1\\ansi", "application/rtf"),
        (b"%!PS-Adobe-3.0", "application/postscript"),
        (b"BM\x9a\x01\x00\x00", "image/bmp"),
        (b"\x00\x00\x01\x00\x02\x00", "image/x-icon"),
        (b"II*\x00\x10\x00", "image/tiff"),
        (b"MM\x00*\x00\x00", "image/tiff"),
        (b"GIF89a\x00", "image/gif"),
        (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
        # tar: ustar at offset 257
        (b"x" * 257 + b"ustar\x00" + b"y" * 10, "application/x-tar"),
    ]
    got = _mime_of(spark, [v[0] for v in vectors])
    assert got == [v[1] for v in vectors]


def test_mime_text_and_unknown_semantics(spark):
    vectors = [
        (b"  <!DOCTYPE html><html>", "text/html; charset=utf-8"),
        (b'<?xml version="1.0"?><a/>', "text/xml; charset=utf-8"),
        (b"\xfe\xff\x00H\x00i", "text/plain; charset=utf-16be"),
        (b"\xff\xfeH\x00i\x00", "text/plain; charset=utf-16le"),
        (b"[1, 2, 3]", "application/json"),
        (b"true", "application/json"),     # Go json.Valid scalars
        (b"<note><to>x</to></note>", "text/xml"),
        (b"plain prose, nothing else", "text/plain; charset=utf-8"),
        # unknown binary -> NULL (the reference leaves target unset)
        (bytes([0x01, 0x02, 0x03, 0x9c, 0x80, 0x00]), None),
        (b"", None),                       # empty short-circuits
    ]
    got = _mime_of(spark, [v[0] for v in vectors])
    assert got == [v[1] for v in vectors]


def test_mime_byte_offsets_survive_multibyte_leads(spark):
    """Container markers are read at BYTE offsets: a RIFF size byte in
    the UTF-8 lead-byte range (0xC2-0xF4) must not shift the WEBP tag,
    and a non-ASCII byte inside a tar header must not shift 'ustar'."""
    webp = b"RIFF" + bytes([0xC3, 0x00, 0x00, 0x00]) + b"WEBPVP8 "
    wave = b"RIFF" + bytes([0xF0, 0x9F, 0x98, 0x80]) + b"WAVEfmt "
    mp4 = bytes([0x00, 0x00, 0x00, 0xE2]) + b"ftypisom"
    tar = bytes([0xC3, 0xA9]) + b"x" * 255 + b"ustar\x00rest"
    got = _mime_of(spark, [webp, wave, mp4, tar])
    assert got == ["image/webp", "audio/x-wav", "video/mp4",
                   "application/x-tar"]


def test_mime_whatwg_skips_all_leading_whitespace(spark):
    """WHATWG sniffing skips tab/LF/FF/CR/space, not just spaces."""
    got = _mime_of(spark, [b"\n<html>Test</html>",
                           b"\r\n\t<?xml version='1.0'?><a/>",
                           b" <html>Test</html>"])
    assert got == ["text/html; charset=utf-8",
                   "text/xml; charset=utf-8",
                   "text/html; charset=utf-8"]


# ------------------------------------------------------------ user_agent

def test_user_agent_precedence_and_fields(spark):
    from beats_spark.processors import compile_processors
    rows = [
        # Edge UAs carry Chrome/ AND Safari/ — Edg/ must win
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.5.0",
         ("Edge", "120.0.5.0", "Windows", "desktop")),
        # Chrome UAs carry Safari/ — Chrome/ must win over Safari
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
         ("Chrome", "121.0.0.0", "Linux", "desktop")),
        # real Safari: Version/ + Safari/
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.3 "
         "Safari/605.1.15",
         ("Safari", "17.3", "macOS", "desktop")),
        # iPhone says "like Mac OS X" — iOS must win over macOS
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 "
         "Mobile/15E148 Safari/604.1",
         ("Safari", "17.0", "iOS", "mobile")),
        # Android before Linux; Mobile -> mobile
        ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/121.0.0.0 Mobile Safari/537.36",
         ("Chrome", "121.0.0.0", "Android", "mobile")),
        # bots: bot classification beats Mobile
        ("Mozilla/5.0 (compatible; Googlebot/2.1; "
         "+http://www.google.com/bot.html)",
         ("Googlebot", "2.1", "Other", "bot")),
        ("some-crawler/1.0", ("Other", None, "Other", "bot")),
        # tools
        ("curl/8.6.0", ("curl", "8.6.0", "Other", "desktop")),
        # unknown: Other/NULL, never an error
        ("totally unknown agent", ("Other", None, "Other", "desktop")),
    ]
    df = spark.createDataFrame([(ua,) for ua, _ in rows], "agent string")
    out = compile_processors([{"user_agent": {"field": "agent"}}])(df)
    got = {r["agent"]: (r["ua_name"], r["ua_version"], r["ua_os_name"],
                        r["ua_device"]) for r in out.collect()}
    for ua, want in rows:
        assert got[ua] == want, (ua, got[ua], want)


def test_user_agent_null_and_codegen(spark):
    from beats_spark.processors import compile_processors
    df = spark.createDataFrame([(None,), ("",)], "agent string")
    out = compile_processors([{"user_agent": {"field": "agent"}}])(df)
    rows = {r["agent"]: r for r in out.collect()}
    assert rows[None]["ua_name"] is None
    assert rows[""]["ua_name"] == "Other"
    # zero Python in the plan: a pure codegen expression chain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cidr_enrich_longest_match_and_nulls(spark):
    import pytest
    from pyspark.sql import functions as F
    from beats_spark.processors.enrich import cidr_enrich
    prefixes = spark.createDataFrame([
        ("10.0.0.0/8", "wide"),
        ("10.1.0.0/16", "mid"),
        ("10.1.1.0/24", "narrow"),
        ("0.0.0.0/0", "default"),
    ], "cidr string, label string")
    src = spark.createDataFrame(
        [("10.1.1.7",),   # matches /8, /16, /24 -> narrow wins
         ("10.1.9.7",),   # /8 and /16 -> mid
         ("10.9.9.9",),   # /8 -> wide
         ("11.0.0.1",),   # only /0 -> default
         ("not-an-ip",),  # invalid -> NULL attrs
         (None,)],
        "ip string")
    out = {r["ip"]: r["label"]
           for r in cidr_enrich(src, prefixes, "ip").collect()}
    assert out == {"10.1.1.7": "narrow", "10.1.9.7": "mid",
                   "10.9.9.9": "wide", "11.0.0.1": "default",
                   "not-an-ip": None, None: None}
    bad = spark.createDataFrame([("1.2.3.0/33", "x")],
                                "cidr string, label string")
    with pytest.raises(ValueError, match="bad masklen"):
        cidr_enrich(src, bad, "ip")
    # plan: broadcast-only joins, big side never shuffles
    plan = cidr_enrich(src, prefixes, "ip") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
