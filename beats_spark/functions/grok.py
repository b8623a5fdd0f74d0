"""Grok pattern engine, compiled to JVM-side ``regexp_extract``.

Beats core has no grok — Filebeat modules delegate it to Elasticsearch
ingest pipelines (e.g. ``filebeat/module/iis/access/ingest/pipeline.yml
:10-43``). To run module-style patterns inside the engine we expand
``%{NAME:field:type}`` references into one Java regex whose capturing
groups are exactly the named fields (the pattern dictionary below uses
only non-capturing groups), then read each field with
``F.regexp_extract(col, rx, group_index)`` — whole-stage codegen, no
Python in the hot path.

The dictionary is the de-facto-standard grok base set (public logstash
pattern names, re-written here against Java regex).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["GROK_PATTERNS", "Grok", "grok_extract", "grok_extract_multi"]

GROK_PATTERNS: Dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "BOOLEAN": r"(?:true|false|TRUE|FALSE|True|False)",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?))",
    "IP": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4})|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)))|(?:(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?))|(?:\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)",
    "SYSLOGHOST": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)))|(?:(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?))|(?:\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[/-](?:\d\d){1,2}",
    "DATE_EU": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))",
    "TIMESTAMP_ISO8601": r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[T ](?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])(?::?(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))?",
    "SYSLOGTIMESTAMP": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b +(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9]) (?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?",
    "HTTPDATE": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])/\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b/(?:\d\d){1,2}:(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))? (?:[+-][0-9]{4})",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "QS": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+\-.]+)+",
    "URIHOST": r"(?:(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?))|(?:\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)(?::[0-9]+)?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+(?:\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*)?",
}

_REF_RE = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")


class Grok:
    """Compiled grok pattern.

    >>> g = Grok("%{IP:client} %{WORD:method} %{NUMBER:bytes:int}")
    >>> g.fields
    [('client', 'string'), ('method', 'string'), ('bytes', 'int')]
    """

    def __init__(self, pattern: str,
                 extra_patterns: Optional[Dict[str, str]] = None,
                 anchored: bool = False):
        self.raw = pattern
        self._dict = dict(GROK_PATTERNS)
        if extra_patterns:
            self._dict.update(extra_patterns)
        self.fields: List[Tuple[str, str]] = []  # (name, type)
        self.regex = self._expand(pattern, depth=0, capture=True)
        if anchored:
            self.regex = "^" + self.regex + "$"
        # map field name -> capturing group index (groups appear in
        # field order because the dictionary is capture-free)
        self.group_index = {name: i + 1
                            for i, (name, _) in enumerate(self.fields)}
        re.compile(self.regex)  # fail fast on malformed output

    @staticmethod
    def _decap(text: str) -> str:
        """Literal ``(`` groups in user patterns become non-capturing —
        field group indexes must count ONLY named captures (ES grok
        patterns freely use ``( … )?`` for optional segments)."""
        return re.sub(r"(?<!\\)\((?!\?)", "(?:", text)

    def _expand(self, pattern: str, depth: int, capture: bool) -> str:
        if depth > 10:
            raise ValueError("grok pattern recursion too deep")
        out = []
        pos = 0
        for m in _REF_RE.finditer(pattern):
            out.append(self._decap(pattern[pos:m.start()]))
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name not in self._dict:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if field and capture:
                # capture BEFORE expanding so the group order matches
                # the left-to-right group numbering of the final regex
                self.fields.append((field, typ or "string"))
                sub = self._expand(self._dict[name], depth + 1,
                                   capture=capture)
                out.append(f"({sub})")
            else:
                # ES grok still captures named refs nested inside
                # pattern_definitions (e.g. nginx's NGINX_HOST), so
                # expansion keeps capturing
                sub = self._expand(self._dict[name], depth + 1,
                                   capture=capture)
                out.append(f"(?:{sub})")
            pos = m.end()
        out.append(self._decap(pattern[pos:]))
        return "".join(out)


_TYPE_MAP = {"int": "bigint", "long": "bigint", "float": "double",
             "double": "double", "string": "string", "boolean": "boolean"}


def grok_extract(
    df: DataFrame,
    field: str,
    pattern: str,
    prefix: str = "",
    extra_patterns: Optional[Dict[str, str]] = None,
    mark_failures: bool = True,
) -> DataFrame:
    """Add one typed column per grok field; optionally tag non-matching
    rows in ``log_flags`` (mirroring the ES ingest grok ``on_failure``
    convention the modules rely on)."""
    g = Grok(pattern, extra_patterns=extra_patterns)
    src = F.col(field)
    matched = src.rlike(g.regex)
    assigns = {}
    for name, typ in g.fields:
        col = F.regexp_extract(src, g.regex, g.group_index[name])
        col = F.when(matched, col)
        spark_t = _TYPE_MAP.get(typ, "string")
        if spark_t != "string":
            col = col.try_cast(spark_t)
        assigns[f"{prefix}{name}"] = col
    if mark_failures:
        prev = (F.coalesce(F.col("log_flags"), F.array().cast("array<string>"))
                if "log_flags" in df.columns
                else F.array().cast("array<string>"))
        assigns["log_flags"] = F.when(
            ~F.coalesce(matched, F.lit(False)),
            F.array_union(prev, F.array(F.lit("grok_parsing_error")))
        ).otherwise(prev)
    return df.withColumns(assigns)


def grok_extract_multi(
    df: DataFrame,
    field: str,
    patterns: list,
    prefix: str = "",
    extra_patterns: Optional[Dict[str, str]] = None,
    sanitize: bool = True,
    mark_failures: bool = True,
) -> DataFrame:
    """Ordered pattern list, first match wins — the ES-ingest grok
    shape Filebeat modules use (e.g.
    ``filebeat/module/iis/access/ingest/pipeline.yml:10-43`` lists five
    alternative layouts). Output column = coalesce over patterns in
    order, taken from the FIRST pattern whose whole regex matches.
    ``sanitize`` maps dotted ES field names to underscore columns."""
    groks = [Grok(p, extra_patterns=extra_patterns) for p in patterns]
    src = F.col(field)
    matches = [src.rlike(g.regex) for g in groks]

    def out_name(name: str) -> str:
        n = name.replace(".", "_") if sanitize else name
        return f"{prefix}{n}"

    # ordered union of fields across patterns, keeping first-seen type
    fields: Dict[str, str] = {}
    for g in groks:
        for name, typ in g.fields:
            fields.setdefault(name, typ)

    # gate i = "pattern i matches AND no earlier pattern matches":
    # ES-ingest first-match-wins takes ALL fields from the first
    # matching pattern — a field the winner doesn't define stays null
    # even if a later pattern both matches and defines it
    gates = []
    seen = None
    for m in matches:
        gates.append(m if seen is None else (m & ~seen))
        seen = m if seen is None else (seen | m)

    assigns = {}
    for name, typ in fields.items():
        col = None
        for g, gate in zip(groks, gates):
            if name not in g.group_index:
                continue
            val = F.regexp_extract(src, g.regex, g.group_index[name])
            piece = F.when(gate, val)
            col = piece if col is None else col.when(gate, val)
        # when-chain over the gated patterns that define the field
        col = col.otherwise(F.lit(None)) if col is not None else F.lit(None)
        spark_t = _TYPE_MAP.get(typ, "string")
        col = F.nullif(col, F.lit(""))
        if spark_t != "string":
            col = col.try_cast(spark_t)
        assigns[out_name(name)] = col

    if mark_failures:
        any_match = matches[0]
        for m in matches[1:]:
            any_match = any_match | m
        prev = (F.coalesce(F.col("log_flags"), F.array().cast("array<string>"))
                if "log_flags" in df.columns
                else F.array().cast("array<string>"))
        assigns["log_flags"] = F.when(
            ~F.coalesce(any_match, F.lit(False)),
            F.array_union(prev, F.array(F.lit("grok_parsing_error")))
        ).otherwise(prev)
    return df.withColumns(assigns)
