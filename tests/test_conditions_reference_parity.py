"""Condition compiler parity with the reference's own test events and
cases (re-expressed from ``libbeat/conditions/*_test.go``): the `secd`
process event and the HTTP response event, evaluated against the same
condition configs with the same expected outcomes."""

import pytest
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition


@pytest.fixture(scope="module")
def secd(spark):
    # conditions_test.go:53-76 — nested proc.*, tags array, final bool
    return spark.createDataFrame([(
        ("/usr/libexec/secd", (0.08, 1988, 6029), "secd", 305, "running",
         "monica", ["foo", "bar"]),
        ["auditbeat", "prod", "security"], "process", False,
    )], """proc struct<cmdline:string,
                      cpu:struct<total_p:double,system:bigint,total:bigint>,
                      name:string, pid:bigint, state:string,
                      username:string, keywords:array<string>>,
           tags array<string>, type string, final boolean""")


@pytest.fixture(scope="module")
def http_event(spark):
    # conditions_test.go:78-105
    return spark.createDataFrame(
        [("mar.local", (200, 76985, "OK"), 200, "http", "GET",
          "apache2/error.log", "[client 1.2.3.4] mod_mime ...")],
        """client_server string,
           http struct<code:bigint,content_length:bigint,phrase:string>,
           status bigint, type string, method string,
           source string, message string""")


def check(df, cfg, expected):
    got = df.filter(compile_condition(cfg, schema=df.schema)).count()
    assert (got == 1) is expected, cfg


# equals_test.go:41 / :49 / :57
def test_equals_cases(secd):
    check(secd, {"equals": {"type": "process"}}, True)
    check(secd, {"equals": {"final": True}}, False)
    check(secd, {"equals": {"type": "process", "proc.pid": 305}}, True)


# matcher_test.go:41-88
def test_contains_cases(secd):
    check(secd, {"contains": {"proc.name": "sec",
                              "proc.username": "monica"}}, True)
    check(secd, {"contains": {"type": "process",
                              "proc.name": "secddd"}}, False)
    check(secd, {"contains": {"proc.keywords": "bar"}}, True)
    check(secd, {"contains": {"tags": "prod"}}, True)
    check(secd, {"contains": {"tags": "nope"}}, False)


# matcher_test.go:75+ TestRegexpCondition
def test_regexp_cases(http_event):
    check(http_event, {"regexp": {"source": "apache2/error.*"}}, True)
    check(http_event, {"regexp": {"source": "apache2/access.*"}}, False)
    check(http_event, {"regexp": {"source": "apache2/error.*",
                                  "message": r"\[client 1\.2\.3\.4\]"}},
          True)


# and_test.go:26 TestANDCondition
def test_and_condition(http_event):
    check(http_event, {"and": [
        {"equals": {"client_server": "mar.local"}},
        {"range": {"http.code": {"gte": 200, "lt": 300}}},
    ]}, True)


# conditions_test.go:139 TestCombinedCondition (OR of range / AND equals)
def test_combined_condition(http_event):
    check(http_event, {"or": [
        {"range": {"http.code": {"gte": 100, "lt": 300}}},
        {"and": [{"equals": {"status": 200}},
                 {"equals": {"type": "http"}}]},
    ]}, True)


# has_fields_test.go:22-39
def test_has_fields_cases(secd):
    check(secd, {"has_fields": ["type", "proc.name"]}, True)
    check(secd, {"has_fields": ["nope_missing"]}, False)


# range over nested numeric (conditions_test.go secd proc.cpu.total_p)
def test_range_nested(secd):
    check(secd, {"range": {"proc.cpu.total_p": {"gte": 0.05}}}, True)
    check(secd, {"range": {"proc.cpu.total_p": {"lt": 0.05}}}, False)
