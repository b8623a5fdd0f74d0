"""AWS VPC Flow Log parser parity — the reference's own v5 sample and
expected event (``x-pack/filebeat/processors/aws_vpcflow/
parse_aws_vpc_flow_log_test.go:30-140``) re-asserted field-for-field
against the Spark compiler, plus the failure/mode/multi-format
contracts from parse_aws_vpc_flow_log.go and config.go."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.vpcflow import (
    V5_FORMAT, parse_vpc_format, vpc_flow_columns)
from beats_spark.processors import compile_processors

FORMAT_V5_FULL = (
    "version account-id interface-id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log-status vpc-id "
    "subnet-id instance-id tcp-flags type pkt-srcaddr pkt-dstaddr "
    "region az-id sublocation-type sublocation-id pkt-src-aws-service "
    "pkt-dst-aws-service flow-direction traffic-path")
SAMPLE_V5 = (
    "5 64111117617 eni-069xxxxxb7a490 89.160.20.156 10.200.0.0 50041 "
    "33004 17 52 1 1616729292 1616729349 REJECT OK "
    "vpc-09676f97xxxxxb8a7 subnet-02d645xxxxxxxdbc0 i-0axxxxxx1ad77 "
    "1 IPv4 89.160.20.156 10.200.0.80 us-east-1 use1-az5 wavelength "
    "fake-id AMAZON CLOUDFRONT ingress 1")


def _parse(spark, mode, formats=None):
    df = spark.createDataFrame([(SAMPLE_V5,)], "message string")
    cols = vpc_flow_columns(F.col("message"),
                            formats or FORMAT_V5_FULL, mode=mode)
    return df.select(*[v.alias(k) for k, v in cols.items()]) \
        .collect()[0].asDict()


def test_reference_v5_vector_ecs_and_original(spark):
    r = _parse(spark, "ecs_and_original",
               formats=["version account-id", FORMAT_V5_FULL])
    start = dt.datetime(2021, 3, 26, 3, 28, 12)
    end = dt.datetime(2021, 3, 26, 3, 29, 9)
    # original namespace (aws.vpcflow.* flattened)
    assert r["aws_vpcflow_account_id"] == "64111117617"
    assert r["aws_vpcflow_action"] == "REJECT"
    assert r["aws_vpcflow_bytes"] == 1
    assert r["aws_vpcflow_dstport"] == 33004
    assert r["aws_vpcflow_end"] == end
    assert r["aws_vpcflow_packets"] == 52
    assert r["aws_vpcflow_protocol"] == 17
    assert r["aws_vpcflow_srcaddr"] == "89.160.20.156"
    assert r["aws_vpcflow_start"] == start
    assert r["aws_vpcflow_tcp_flags"] == 1
    assert r["aws_vpcflow_tcp_flags_array"] == ["fin"]
    assert r["aws_vpcflow_traffic_path"] == 1
    assert r["aws_vpcflow_version"] == 5
    # ECS targets
    assert r["cloud_account_id"] == "64111117617"
    assert r["cloud_availability_zone"] == "use1-az5"
    assert r["cloud_instance_id"] == "i-0axxxxxx1ad77"
    assert r["cloud_region"] == "us-east-1"
    assert r["destination_address"] == "10.200.0.0"
    assert r["destination_ip"] == "10.200.0.0"
    assert r["destination_port"] == 33004
    assert r["event_action"] == "reject"
    assert r["event_outcome"] == "failure"
    assert r["event_start"] == start and r["event_end"] == end
    assert r["@timestamp"] == end
    assert r["event_type"] == ["connection", "denied"]
    assert r["network_bytes"] == 1 and r["network_packets"] == 52
    assert r["network_direction"] == "ingress"
    assert r["network_iana_number"] == "17"
    assert r["network_transport"] == "udp"
    assert r["network_type"] == "ipv4"
    # related.ip: first-occurrence order, deduped
    assert r["related_ip"] == ["89.160.20.156", "10.200.0.0",
                               "10.200.0.80"]
    assert r["source_address"] == "89.160.20.156"
    assert r["source_bytes"] == 1 and r["source_packets"] == 52
    assert r["source_port"] == 50041
    assert r["error_message"] is None


def test_ecs_mode_drops_mapped_originals(spark):
    r = _parse(spark, "ecs")
    # mapped originals absent; unmapped (tcp_flags, vpc_id) retained
    assert "aws_vpcflow_srcaddr" not in r
    assert "aws_vpcflow_action" not in r
    assert r["aws_vpcflow_tcp_flags"] == 1
    assert r["aws_vpcflow_vpc_id"] == "vpc-09676f97xxxxxb8a7"
    assert r["source_ip"] == "89.160.20.156"


def test_original_mode_has_no_ecs(spark):
    r = _parse(spark, "original")
    assert r["aws_vpcflow_srcaddr"] == "89.160.20.156"
    assert "source_ip" not in r and "related_ip" not in r


def test_dash_token_is_null_and_no_match_errors(spark):
    fmt = "version srcaddr srcport"
    df = spark.createDataFrame(
        [("2 - 80",), ("2 10.0.0.1 80",), ("junk",),
         ("2 notanip 80",)], "message string")
    cols = vpc_flow_columns(F.col("message"), fmt,
                            mode="ecs_and_original")
    rows = df.select("message",
                     *[v.alias(k) for k, v in cols.items()]).collect()
    by = {r["message"]: r for r in rows}
    assert by["2 - 80"]["aws_vpcflow_srcaddr"] is None
    assert by["2 - 80"]["error_message"] is None
    assert by["2 10.0.0.1 80"]["source_ip"] == "10.0.0.1"
    # wrong token count and bad IP both fail the row, message intact
    for bad in ("junk", "2 notanip 80"):
        assert by[bad]["error_message"] == \
            "log did not match the specified format"
        assert by[bad]["aws_vpcflow_version"] is None


def test_multi_format_matches_by_count(spark):
    fmts = ["version srcaddr", "version srcaddr srcport"]
    df = spark.createDataFrame(
        [("2 10.0.0.1",), ("2 10.0.0.2 443",)], "message string")
    cols = vpc_flow_columns(F.col("message"), fmts, mode="ecs")
    rows = {r["source_ip"]: r for r in df.select(
        *[v.alias(k) for k, v in cols.items()]).collect()}
    assert rows["10.0.0.1"]["source_port"] is None
    assert rows["10.0.0.2"]["source_port"] == 443


def test_duplicate_field_counts_rejected():
    with pytest.raises(ValueError, match="unique number"):
        parse_vpc_format("version srcaddr") and \
            vpc_flow_columns(F.lit("x"),
                             ["version srcaddr", "srcport dstport"])


def test_unknown_field_rejected():
    with pytest.raises(ValueError, match="unknown field"):
        parse_vpc_format("version bogus-field")


def test_processor_chain_form(spark):
    df = spark.createDataFrame([(SAMPLE_V5,)], "message string")
    chain = compile_processors([
        {"parse_aws_vpc_flow_log": {"format": FORMAT_V5_FULL}}])
    row = chain(df).collect()[0]
    assert row["source_ip"] == "89.160.20.156"
    assert row["network_transport"] == "udp"
    assert row["message"] == SAMPLE_V5   # original untouched
