"""Golden-file module parity (SURVEY.md §5): run the reference's OWN
module test logs (``filebeat/module/<m>/<fs>/test/*.log``) through our
reader + multi-pattern grok and compare field-by-field against the
shipped ``*-expected.json`` — the module-test pattern of the
reference, with its data loaded read-only at test time (nothing copied
into this repo).

Pipeline subset reproduced per module: exclude ``^#`` comment lines →
the ordered grok pattern list from the module's
``ingest/pipeline.yml`` (first match wins) → simple scalar gsubs.
ECS enrichments needing external plugins (geoip, user_agent parsing)
stay out of scope, exactly as the modules delegate them to ES
plugins.
"""

import json
import os

import pytest
import yaml

from pyspark.sql import functions as F

from beats_spark.functions.grok import grok_extract_multi
from beats_spark.functions.readers import exclude_lines

REF = "/root/reference/filebeat/module"

CASES = [
    {
        "id": "iis-access",
        "dir": f"{REF}/iis/access",
        "log": "test/test.log",
        "fields": {
            "http.request.method": "http_request_method",
            "http.response.status_code": "http_response_status_code",
            "source.address": "source_address",
            "destination.port": "destination_port",
            "user_agent.original": "user_agent_original",
            "iis.access.sub_status": "iis_access_sub_status",
        },
        # pipeline.yml's user_agent gsub: '+' → ' '
        "post": lambda df: df.withColumn(
            "user_agent_original",
            F.regexp_replace("user_agent_original", r"\+", " ")),
        "min_checked": 20,
    },
    {
        "id": "apache-access",
        "dir": f"{REF}/apache/access",
        "log": "test/test.log",
        "fields": {
            "http.request.method": "http_request_method",
            "http.response.status_code": "http_response_status_code",
            "http.response.body.bytes": "http_response_body_bytes",
            "source.address": "source_address",
            "user_agent.original": "user_agent_original",
        },
        "post": None,
        "min_checked": 15,
    },
]


def _grok_procs(pipeline_yml):
    """All grok processors from the module pipeline, in order:
    [(field, patterns, pattern_definitions), ...]."""
    with open(pipeline_yml) as f:
        doc = yaml.safe_load(f)
    out = []
    for proc in doc["processors"]:
        if "grok" in proc:
            g = proc["grok"]
            out.append((g["field"], g["patterns"],
                        g.get("pattern_definitions") or {}))
    if not out:
        raise AssertionError("no grok processor in module pipeline")
    return out


def _grok_patterns(pipeline_yml):
    return _grok_procs(pipeline_yml)[0][1]


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference module data not mounted")
@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_module_golden(spark, case):
    log = os.path.join(case["dir"], case["log"])
    expected_path = log + "-expected.json"
    with open(expected_path) as f:
        expected = json.load(f)
    patterns = _grok_patterns(os.path.join(case["dir"],
                                           "ingest", "pipeline.yml"))

    df = spark.read.text(log).withColumnRenamed("value", "message")
    df = exclude_lines(df, "message", [r"^#"])
    df = grok_extract_multi(df, "message", patterns)
    if case["post"] is not None:
        df = case["post"](df)
    rows = {r["message"]: r for r in df.collect()}

    assert len(rows) == len(expected)
    checked = 0
    for exp in expected:
        got = rows[exp["event.original"]]
        assert got["log_flags"] == [], exp["event.original"][:60]
        for ecs_field, col in case["fields"].items():
            if ecs_field not in exp:
                continue
            assert got[col] == exp[ecs_field], \
                (ecs_field, exp["event.original"][:60])
            checked += 1
    assert checked >= case["min_checked"]


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference module data not mounted")
def test_nginx_access_golden_two_stage(spark):
    """nginx access: TWO chained grok stages (the pipeline greps
    nginx.access.info out of the combined-log line, then parses
    method/url/version from it) with module pattern_definitions."""
    d = f"{REF}/nginx/access"
    log = os.path.join(d, "test", "access.log")
    with open(log + "-expected.json") as f:
        expected = json.load(f)
    procs = _grok_procs(os.path.join(d, "ingest", "pipeline.yml"))
    (f1, pats1, defs1), (f2, pats2, defs2) = procs[0], procs[1]
    assert f1 == "event.original" and f2 == "nginx.access.info"

    df = spark.read.text(log).withColumnRenamed("value", "message")
    df = grok_extract_multi(df, "message", pats1, extra_patterns=defs1)
    df = grok_extract_multi(
        df, "nginx_access_info",
        [p for p in pats2 if p], extra_patterns=defs2,
        mark_failures=False)
    rows = {r["message"]: r for r in df.collect()}

    fields = {
        "http.response.status_code": "http_response_status_code",
        "http.response.body.bytes": "http_response_body_bytes",
        "user_agent.original": "user_agent_original",
        "http.request.method": "http_request_method",
    }
    assert len(rows) == len(expected)
    checked = 0
    for exp in expected:
        got = rows[exp["event.original"]]
        for ecs_field, col in fields.items():
            if ecs_field not in exp:
                continue
            assert got[col] == exp[ecs_field], \
                (ecs_field, exp["event.original"][:60], got[col])
            checked += 1
    assert checked >= 8


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference module data not mounted")
def test_system_syslog_golden(spark):
    """system/syslog files pipeline: SYSLOGTIMESTAMP/SYSLOGHOST grok
    with a module pattern_definitions entry (GREEDYMULTILINE)."""
    d = f"{REF}/system/syslog"
    log = os.path.join(d, "test", "suse-syslog.log")
    with open(log + "-expected.json") as f:
        expected = json.load(f)
    procs = _grok_procs(os.path.join(d, "ingest", "files.yml"))
    field, pats, defs = procs[0]

    df = spark.read.text(log).withColumnRenamed("value", "message")
    df = grok_extract_multi(df, "message", pats, extra_patterns=defs)
    rows = df.collect()
    assert len(rows) == len(expected)
    checked = 0
    for got, exp in zip(rows, expected):
        assert got["log_flags"] == []
        for ecs_field, col in (("process.name", "process_name"),
                               ("process.pid", "process_pid"),
                               ("host.hostname", "host_hostname"),
                               ("message", "system_syslog_message")):
            if ecs_field not in exp:
                continue
            assert got[col] == exp[ecs_field], (ecs_field, got[col])
            checked += 1
    assert checked >= 6
