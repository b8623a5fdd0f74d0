"""Windows Event Log record→event mapping
(functions/winlog.py) — the reference's own WinRM operational-log
sample (``winlogbeat/sys/winevent/event_test.go:34-80``) asserted
field-for-field, plus the winmeta fallback tables, the keyword-bit
audit outcome, and the misaligned-EventData guard."""

import datetime as dt

from pyspark.sql import functions as F

from beats_spark.functions.winlog import winlog_events

SAMPLE = """<Event xmlns="http://schemas.microsoft.com/win/2004/08/events/event">
  <System>
    <Provider Name="Microsoft-Windows-WinRM" Guid="{a7975c8f-ac13-49f1-87da-5a984a4ab417}" EventSourceName="Service Control Manager"/>
    <EventID>91</EventID>
    <Version>1</Version>
    <Level>4</Level>
    <Task>9</Task>
    <Opcode>0</Opcode>
    <Keywords>0x8020000000000000</Keywords>
    <TimeCreated SystemTime="2016-01-28T20:33:27.990735300Z"/>
    <EventRecordID>100</EventRecordID>
    <Correlation ActivityID="{A066CCF1-8AB3-459B-B62F-F79F957A5036}" RelatedActivityID="{85FC0930-9C49-42DA-804B-A7368104BD1B}" />
    <Execution ProcessID="920" ThreadID="1152"/>
    <Channel>Microsoft-Windows-WinRM/Operational</Channel>
    <Computer>vagrant-2012-r2</Computer>
    <Security UserID="S-1-5-21-3541430928-2051711210-1391384369-1001"/>
  </System>
  <EventData>
    <Data Name="param1">winlogbeat</Data>
    <Data Name="param2">running</Data>
  </EventData>
  <RenderingInfo Culture="en-US">
    <Message>Creating WSMan shell on server with ResourceUri: %1</Message>
    <Level>Information</Level>
    <Task>Request handling</Task>
    <Opcode>Info</Opcode>
  </RenderingInfo>
</Event>"""


def _one(spark, xml):
    df = spark.createDataFrame([(xml,)], "xml string")
    return winlog_events(df).collect()[0]


def test_reference_winrm_sample(spark):
    r = _one(spark, SAMPLE)
    assert r["winlog_channel"] == "Microsoft-Windows-WinRM/Operational"
    assert r["winlog_event_id"] == "91"
    assert r["winlog_provider_name"] == "Microsoft-Windows-WinRM"
    assert r["winlog_provider_guid"] == \
        "{a7975c8f-ac13-49f1-87da-5a984a4ab417}"
    assert r["winlog_record_id"] == 100
    assert r["winlog_computer_name"] == "vagrant-2012-r2"
    assert r["winlog_version"] == 1
    assert r["winlog_time_created"] == \
        dt.datetime(2016, 1, 28, 20, 33, 27, 990735)
    assert r["winlog_activity_id"] == \
        "{A066CCF1-8AB3-459B-B62F-F79F957A5036}"
    assert r["winlog_process_pid"] == 920
    assert r["winlog_process_thread_id"] == 1152
    assert r["winlog_user_identifier"] == \
        "S-1-5-21-3541430928-2051711210-1391384369-1001"
    # rendered strings win; level lowercases (Fields() event.go:113)
    assert r["winlog_level"] == "information"
    assert r["winlog_task"] == "Request handling"
    assert r["winlog_opcode"] == "Info"
    assert r["winlog_message"] == \
        "Creating WSMan shell on server with ResourceUri: %1"
    # 0x8020000000000000 = Classic | Audit Success
    assert r["winlog_outcome"] == "success"
    assert r["winlog_event_data"] == {"param1": "winlogbeat",
                                      "param2": "running"}


def test_winmeta_fallback_tables(spark):
    xml = ("<Event><System><EventID>1</EventID><Level>2</Level>"
           "<Opcode>3</Opcode><Task>0</Task>"
           "<Keywords>0x10000000000000</Keywords>"
           "</System></Event>")
    r = _one(spark, xml)
    assert r["winlog_level"] == "error"
    assert r["winlog_opcode"] == "DCStart"
    assert r["winlog_task"] == "None"
    assert r["winlog_outcome"] == "failure"      # Audit Failure bit
    assert r["winlog_keywords"] == ["Audit Failure"]
    assert r["winlog_message"] is None


def test_crlf_message_normalized(spark):
    xml = ("<Event><System><EventID>7</EventID></System>"
           "<RenderingInfo><Message>line one&#13;&#10;line two"
           "</Message></RenderingInfo></Event>")
    r = _one(spark, xml)
    assert r["winlog_message"] == "line one\nline two"


def test_empty_data_element_pairs_structurally(spark):
    xml = ("<Event><System><EventID>7</EventID></System><EventData>"
           '<Data Name="a">1</Data><Data Name="b"/>'
           "</EventData></Event>")
    r = _one(spark, xml)
    # from_xml pairs names with values structurally, so an empty
    # <Data/> carries a NULL value (the old per-field xpath spelling
    # could only guard against positional misalignment with a NULL
    # map; the single-parse rewrite makes the correct answer cheap)
    assert r["winlog_event_data"] == {"a": "1", "b": None}


def test_plan_is_pure_codegen(spark):
    from beats_spark.planlint import lint_plan
    df = spark.createDataFrame([(SAMPLE,)], "xml string")
    out = winlog_events(df)
    assert all(f["rule"] != "python_row_udf" for f in lint_plan(out))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
