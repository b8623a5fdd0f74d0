"""Syslog parsing — RFC 3164 and RFC 5424, pure Catalyst.

The reference uses ragel-generated state machines
(``libbeat/reader/syslog/rfc3164_gen.go:35``, ``rfc5424_gen.go``) and
maps priority → severity/facility (``syslog/message.go:102``). Here each
format is one anchored Java regex evaluated JVM-side; priority math is
``pri % 8`` / ``pri / 8``. RFC3164 year inference: messages carry no
year, the reference assumes the current year — we take it from a
reference timestamp column so results stay deterministic.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["parse_syslog_rfc3164", "parse_syslog_rfc5424", "parse_syslog",
           "SEVERITY_LABELS", "FACILITY_LABELS"]

_RFC3164 = (
    r"^(?:<(\d{1,3})>)?"                                  # 1 pri
    r"([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2})"          # 2 timestamp
    r" (\S+)"                                             # 3 hostname
    r" (?:([^\s:\[]+)(?:\[(\d+)\])?:?)?"                  # 4 tag, 5 pid
    r" ?(.*)$"                                            # 6 content
)

_RFC5424 = (
    r"^<(\d{1,3})>(\d+)"                                  # 1 pri, 2 version
    r" (\S+)"                                             # 3 timestamp
    r" (\S+)"                                             # 4 hostname
    r" (\S+)"                                             # 5 app-name
    r" (\S+)"                                             # 6 procid
    r" (\S+)"                                             # 7 msgid
    r" (-|(?:\[.*?\])+)"                                  # 8 structured data
    r"(?: (.*))?$"                                        # 9 message
)

SEVERITY_LABELS = [
    "Emergency", "Alert", "Critical", "Error", "Warning", "Notice",
    "Informational", "Debug",
]
FACILITY_LABELS = [
    "kernel", "user-level", "mail", "system", "security/authorization",
    "syslogd", "line printer", "network news", "UUCP", "clock",
    "security/authorization", "FTP", "NTP", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
]


def _pri_cols(pri: Column) -> Dict[str, Column]:
    sev = (pri % 8).cast("int")
    fac = (pri / 8).cast("int")
    sev_label = F.element_at(F.array(*[F.lit(s) for s in SEVERITY_LABELS]),
                             sev + 1)
    fac_label = F.element_at(F.array(*[F.lit(s) for s in FACILITY_LABELS]),
                             F.when(fac < 24, fac + 1))
    return {
        "log_syslog_priority": pri.cast("int"),
        "log_syslog_severity_code": sev,
        "log_syslog_severity_name": sev_label,
        "log_syslog_facility_code": fac,
        "log_syslog_facility_name": fac_label,
    }


def _rfc3164_assigns(src: Column, year: Column) -> Dict[str, Column]:
    x = lambda i: F.regexp_extract(src, _RFC3164, i)  # noqa: E731
    pri = F.nullif(x(1), F.lit("")).try_cast("long")
    ts = F.try_to_timestamp(
        F.concat_ws(" ", year, F.regexp_replace(x(2), "  ", " ")),
        F.lit("yyyy MMM d HH:mm:ss"))
    matched = src.rlike(_RFC3164) & (x(2) != "")
    assigns = {
        "syslog_ts": ts,
        "syslog_hostname": F.nullif(x(3), F.lit("")),
        "syslog_program": F.nullif(x(4), F.lit("")),
        "syslog_pid": F.nullif(x(5), F.lit("")).try_cast("long"),
        "syslog_message": x(6),
        "syslog_version": F.lit(None).cast("int"),
        "syslog_msgid": F.lit(None).cast("string"),
        "syslog_sd": F.lit(None).cast("string"),
    }
    assigns.update(_pri_cols(pri))
    return {k: F.when(matched, v) for k, v in assigns.items()}


def _rfc5424_assigns(src: Column) -> Dict[str, Column]:
    x = lambda i: F.regexp_extract(src, _RFC5424, i)  # noqa: E731
    matched = src.rlike(_RFC5424)
    nil = lambda c: F.nullif(c, F.lit("-"))  # noqa: E731
    pri = F.nullif(x(1), F.lit("")).try_cast("long")
    assigns = {
        "syslog_version": x(2).try_cast("int"),
        "syslog_ts": F.try_to_timestamp(nil(x(3))),
        "syslog_hostname": nil(x(4)),
        "syslog_program": nil(x(5)),
        "syslog_pid": nil(x(6)).try_cast("long"),
        "syslog_msgid": nil(x(7)),
        "syslog_sd": nil(x(8)),
        "syslog_message": x(9),
    }
    assigns.update(_pri_cols(pri))
    return {k: F.when(matched, v) for k, v in assigns.items()}


def _year_col(year_from: Optional[str]) -> Column:
    return (F.year(F.col(year_from)).cast("string") if year_from
            else F.lit("2000"))


def parse_syslog_rfc3164(df: DataFrame, field: str = "message",
                         year_from: Optional[str] = None) -> DataFrame:
    """BSD syslog. ``year_from`` names a timestamp column supplying the
    inferred year (``rfc3164.go`` year heuristic)."""
    return df.withColumns(_rfc3164_assigns(F.col(field), _year_col(year_from)))


def parse_syslog_rfc5424(df: DataFrame, field: str = "message") -> DataFrame:
    return df.withColumns(_rfc5424_assigns(F.col(field)))


def parse_syslog(df: DataFrame, field: str = "message",
                 year_from: Optional[str] = None) -> DataFrame:
    """Auto-detect: RFC5424 when ``<pri>version `` prefix present, else
    RFC3164 (the reference's format auto mode,
    ``reader/syslog/parser.go``).

    Implemented as two filtered branches unioned back together rather
    than a per-field ``when(is_5424, a).otherwise(b)`` merge: the
    merged form doubles every expression tree (both formats' regex +
    timestamp parse under each of the 13 output columns), which pushed
    the projection past whole-stage-codegen limits into interpreted
    evaluation — measured 3× slower than the union at sf0.1. The
    union keeps each branch on the proven single-format fast path;
    the extra pass over the source is a pushed-filter line scan."""
    src = F.col(field)
    is_5424 = src.rlike(r"^<\d{1,3}>\d+ ")
    a = parse_syslog_rfc5424(df.filter(is_5424), field=field)
    b = parse_syslog_rfc3164(df.filter(~F.coalesce(is_5424, F.lit(False))),
                             field=field, year_from=year_from)
    return a.unionByName(b.select(*a.columns))
