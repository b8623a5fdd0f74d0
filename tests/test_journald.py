"""journald export parsing (functions/journald.py) and the UDP
datagram input shape (streaming/sources.py::datagram_events):
reference field-table semantics, include_matches, loud-failure
contracts, plan shape, and chain parity with the tcp/file paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.journald import (
    JOURNALD_FIELDS, include_matches, parse_journal_export,
)
from beats_spark.streaming.sources import datagram_events, socket_pipeline

EXPORT = (
    "__REALTIME_TIMESTAMP=1700000000123456\n"
    "PRIORITY=6\nSYSLOG_IDENTIFIER=sshd\nSYSLOG_PID=4242,bob\n"
    "_PID=4242\n_HOSTNAME=web1\n_SYSTEMD_UNIT=ssh.service\n"
    "_UID=1000\nCUSTOM_FIELD=hello\n_BOOT_ID=abc\n"
    "MESSAGE=first\nMESSAGE=last wins\n"
    "CODE_LINE=not-an-int\n"
    "__CURSOR=s=deadbeef\n"
    "\n"
    "__REALTIME_TIMESTAMP=1700000001000000\n"
    "PRIORITY=3\nMESSAGE=second record\n_SYSTEMD_UNIT=cron.service\n")


def _parsed(spark):
    df = spark.createDataFrame([(1, EXPORT)], "blob_id int, export string")
    return parse_journal_export(df, "export", keep_source=True)


def test_journald_field_table_and_conversions(spark):
    rows = {r["record_idx"]: r for r in _parsed(spark).collect()}
    a, b = rows[0], rows[1]
    # promoted typed columns (default.go mapping)
    assert a["message"] == "last wins"          # repeated field: last wins
    assert a["log_syslog_priority"] == 6        # integer conversion
    assert a["log_syslog_procid"] == 4242       # "pid,username" fallback
    assert a["log_syslog_appname"] == "sshd"
    assert a["journald_pid"] == 4242
    assert a["host_hostname"] == "web1"
    assert a["systemd_unit"] == "ssh.service"
    # __REALTIME_TIMESTAMP microseconds -> @timestamp
    assert a["@timestamp"].microsecond == 123456
    assert (b["@timestamp"] - a["@timestamp"]).total_seconds() == \
        pytest.approx(0.876544)
    # residual map: mapped names for known fields, raw for custom,
    # dropped for registry fields; unparseable CODE_LINE keeps the
    # STRING in the residual (the reference keeps value + error)
    f = a["journald_fields"]
    assert f["journald.uid"] == "1000"
    assert f["journald.host.boot_id"] == "abc"
    assert f["CUSTOM_FIELD"] == "hello"
    assert f["journald.code.line"] == "not-an-int"
    assert "__CURSOR" not in f and "MESSAGE" not in f
    assert b["journald_fields"] == {}
    assert b["log_syslog_procid"] is None and b["host_hostname"] is None


def test_journald_include_matches_or_and(spark):
    out = _parsed(spark)
    # same field ORs: both units match -> both records
    both = include_matches(out, ["systemd_unit=ssh.service",
                                 "systemd_unit=cron.service"])
    assert both.count() == 2
    # different fields AND: unit OR-pair AND priority=3 -> record B only
    one = include_matches(out, ["systemd_unit=ssh.service",
                                "systemd_unit=cron.service",
                                "log_syslog_priority=3"])
    assert [r["message"] for r in one.collect()] == ["second record"]
    # map-resident field lookup
    uid = include_matches(out, ["journald.uid=1000"])
    assert uid.count() == 1
    with pytest.raises(ValueError, match="bad match"):
        include_matches(out, ["nonsense"])


def test_journald_keyless_line_fails_loudly_and_plan(spark):
    bad = spark.createDataFrame([("MESSAGE=x\nBINARYFIELD\nK=1",)],
                                "export string")
    with pytest.raises(Exception, match="keyless"):
        parse_journal_export(bad).collect()
    # pure projection: no Exchange anywhere in the parse plan
    plan = (_parsed(spark)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_journald_mapping_table_is_complete(spark):
    # every reference field family present (spot keys from
    # journalfield/default.go), dropped fields map to None
    assert JOURNALD_FIELDS["MESSAGE"] == "message"
    assert JOURNALD_FIELDS["_MACHINE_ID"] == "host.id"
    assert JOURNALD_FIELDS["CONTAINER_NAME"] == "container.name"
    assert JOURNALD_FIELDS["__CURSOR"] is None
    assert len([k for k, v in JOURNALD_FIELDS.items() if v]) >= 50


def test_datagram_events_shape_and_chain_parity(spark):
    cap = spark.createDataFrame(
        [(1, "a" * 10, "10.0.0.1:9"), (2, "b" * 30, "10.0.0.2:9")],
        "pkt_id int, value string, src string")
    out = datagram_events(cap, "value", source_col="src",
                          max_message_size=16)
    rows = {r["pkt_id"]: r for r in out.collect()}
    assert rows[1]["message"] == "a" * 10 and rows[1]["truncated"] is False
    assert rows[2]["message"] == "b" * 16 and rows[2]["truncated"] is True
    assert rows[2]["log_source_address"] == "10.0.0.2:9"
    assert set(out.columns) == {"pkt_id", "message", "truncated",
                                "log_source_address", "@timestamp"}
    # the SAME pipeline compiler the tcp/file paths use applies
    # unchanged: a datagram feed routes identically to a file of the
    # same lines (no framing difference exists for matching messages)
    dg = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": 2}',), ("plain",)], "value string")
    shaped = datagram_events(dg, "value", max_message_size=1024)
    routed = socket_pipeline(
        shaped,
        parsers=[{"ndjson": {"target": "", "add_error_key": True}}],
        rules=[],
        default_sink="sink_udp")
    got = routed.select("sink").distinct().collect()
    assert [r["sink"] for r in got] == ["sink_udp"]
    assert routed.count() == 3


def test_journald_extra_blank_lines_no_phantom_record(spark):
    """Extra blank lines between/after records (journalctl trailing
    newlines) must not produce phantom all-NULL record rows."""
    blob = "MESSAGE=a\n\n\nMESSAGE=b\n\n\n\n"
    df = spark.createDataFrame([(blob,)], "export string")
    rows = parse_journal_export(df).orderBy("record_idx").collect()
    assert [r["message"] for r in rows] == ["a", "b"]
    assert [r["record_idx"] for r in rows] == [0, 1]


def test_journald_engines_identical(spark):
    """The arrow (default) and jvm engines produce byte-identical
    rows, including the phantom-record and keyless contracts."""
    blob = EXPORT + "\n\n\nPRIORITY=1\nMESSAGE=tail\n\n"
    df = spark.createDataFrame([(1, blob)], "blob_id int, export string")
    cols = ["blob_id", "record_idx", "@timestamp", "message",
            "log_syslog_priority", "log_syslog_procid",
            "log_syslog_appname", "journald_pid", "host_hostname",
            "systemd_unit", "journald_fields"]
    a = sorted(map(str, parse_journal_export(
        df, "export", keep_source=True, engine="arrow")
        .select(cols).collect()))
    b = sorted(map(str, parse_journal_export(
        df, "export", keep_source=True, engine="jvm")
        .select(cols).collect()))
    assert a == b and len(a) == 3
    bad = spark.createDataFrame([("MESSAGE=x\nNOKEY",)], "export string")
    for eng in ("arrow", "jvm"):
        with pytest.raises(Exception, match="keyless"):
            parse_journal_export(bad, engine=eng).collect()
    with pytest.raises(ValueError, match="unknown engine"):
        parse_journal_export(bad, engine="nope")
