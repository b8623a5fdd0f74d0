"""Condition compiler: Beats condition configs → Catalyst ``Column``
boolean expressions.

The reference has one shared condition AST used by ``when:`` wrappers,
``if/then/else`` and output selectors (grammar
``libbeat/conditions/conditions.go:30-40``, dispatch ``:55-99``). Each
condition becomes a boolean ``Column`` here — fully JVM-side, so
Catalyst folds, pushes down and short-circuits them for free (which is
the reference's own hand-rolled optimization set, SURVEY.md §4).

Semantics parity:

- ``equals`` — typed equality over string/int/bool; multiple fields are
  conjunctive (``conditions/equals.go:30-94``).
- ``contains`` — substring; string-array fields match if *any* element
  contains (``conditions/matcher.go:56-88``).
- ``regexp`` — RE2 match, unanchored (``matcher.go:75``). Spark rlike
  uses Java regex — a superset of RE2 for the patterns we accept.
- ``range`` — ``gte/gt/lte/lt`` numeric comparisons, conjunctive per and
  across fields (``conditions/range.go:28-110``).
- ``has_fields`` — all listed keys exist (``has_fields.go:31``); with a
  declared schema this is plan-time truth + per-row ``isNotNull``.
- ``network`` — IP-in-CIDR / named networks; values are OR'd within a
  field, fields are AND'd (``conditions/network.go:44-139``).
- ``and`` / ``or`` / ``not`` — composition (``and.go``, ``or.go``,
  ``not.go``).
"""

from __future__ import annotations

import ipaddress
from typing import Any, Dict, List, Mapping, Sequence

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

__all__ = ["compile_condition", "ip_to_long", "cidr_match"]


# ---------------------------------------------------------------- network

def ip_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 string → int64, JVM-side (no UDF)."""
    p = F.split(col, r"\.")
    return (
        p.getItem(0).try_cast("long") * F.lit(16777216)
        + p.getItem(1).try_cast("long") * F.lit(65536)
        + p.getItem(2).try_cast("long") * F.lit(256)
        + p.getItem(3).try_cast("long")
    )


_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(25[0-5]|2[0-4]\d|1?\d?\d)$"

# named networks (conditions/network.go:44-55), IPv4 ranges expressed as
# CIDR lists; IPv6 support is limited to what string prefixes can say.
_NAMED_V4 = {
    "loopback": ["127.0.0.0/8"],
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"],
    "multicast": ["224.0.0.0/4"],
    "interface_local_multicast": ["224.0.0.0/24"],
    "link_local_unicast": ["169.254.0.0/16"],
    "link_local_multicast": ["224.0.0.0/24"],
    "unspecified": ["0.0.0.0/32"],
}


def cidr_match(col: Column, cidr: str) -> Column:
    """True when the IPv4 string in ``col`` is inside ``cidr``. The mask
    arithmetic happens at compile time; per row it is one AND + EQ."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version != 4:
        raise ValueError(f"only IPv4 CIDRs compile to columns: {cidr}")
    mask = int(net.netmask)
    base = int(net.network_address)
    valid = col.rlike(_IPV4_RE)
    return valid & (ip_to_long(col).bitwiseAND(F.lit(mask)) == F.lit(base))


def _network_one(col: Column, spec: str) -> Column:
    if spec in ("private", "loopback", "multicast", "unspecified",
                "interface_local_multicast", "link_local_unicast",
                "link_local_multicast"):
        m = None
        for c in _NAMED_V4[spec]:
            mm = cidr_match(col, c)
            m = mm if m is None else (m | mm)
        return m
    if spec in ("unicast", "global_unicast"):
        # global unicast = not (unspecified|loopback|multicast|link-local)
        bad = None
        for name in ("unspecified", "loopback", "multicast",
                     "link_local_unicast", "link_local_multicast"):
            for c in _NAMED_V4[name]:
                mm = cidr_match(col, c)
                bad = mm if bad is None else (bad | mm)
        return col.rlike(_IPV4_RE) & ~bad
    if spec == "public":
        # !isLocalOrPrivate (network.go:54): not private, loopback, ll
        bad = None
        for name in ("private", "loopback", "link_local_unicast",
                     "link_local_multicast", "unspecified"):
            for c in _NAMED_V4[name]:
                mm = cidr_match(col, c)
                bad = mm if bad is None else (bad | mm)
        return col.rlike(_IPV4_RE) & ~bad
    return cidr_match(col, spec)


# ---------------------------------------------------------------- helpers

def _as_list(v) -> List:
    return list(v) if isinstance(v, (list, tuple)) else [v]


def _all(cols: Sequence[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _any(cols: Sequence[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


# ---------------------------------------------------------------- compiler

def compile_condition(cfg: Mapping[str, Any],
                      schema: "T.StructType | None" = None) -> Column:
    """One condition dict → boolean Column (conditions.go:55-99).

    ``schema`` (optional) enables type-aware compilation: ``contains``
    on an array<string> field matches when ANY element contains the
    substring (``conditions/matcher.go:56-88``); without a schema the
    string form is emitted."""
    if not isinstance(cfg, Mapping) or len(cfg) != 1:
        raise ValueError(f"condition must have exactly one key: {cfg!r}")
    (kind, body), = cfg.items()

    if kind == "and":
        return _all([compile_condition(c, schema) for c in body])
    if kind == "or":
        return _any([compile_condition(c, schema) for c in body])
    if kind == "not":
        return ~compile_condition(body, schema)

    if kind == "equals":
        # typed equality; null field ≠ anything (Go: missing key → false)
        return _all([
            F.col(f).eqNullSafe(F.lit(v)) & F.col(f).isNotNull()
            for f, v in body.items()
        ])

    if kind == "contains":
        from .fieldpath import field_type
        cols = []
        for f, v in body.items():
            c = F.col(f)
            ft = field_type(schema, f) if schema is not None else None
            if isinstance(ft, T.ArrayType):
                # any element contains the substring (matcher.go:56-88);
                # closure factory keeps the lambda unary for Catalyst
                def _elem_contains(needle):
                    return lambda x: x.contains(needle)
                cols.append(F.exists(c, _elem_contains(str(v))))
            else:
                cols.append(c.contains(str(v)))
        return _all(cols)

    if kind == "regexp":
        return _all([F.col(f).rlike(str(p)) for f, p in body.items()])

    if kind == "range":
        ops = {"gte": "__ge__", "gt": "__gt__", "lte": "__le__", "lt": "__lt__"}
        cols = []
        for f, spec in body.items():
            for op, v in spec.items():
                if op not in ops:
                    raise ValueError(f"unknown range op {op!r}")
                cols.append(getattr(F.col(f), ops[op])(F.lit(float(v))))
        return _all(cols)

    if kind == "has_fields":
        from .fieldpath import field_type
        cols = []
        for f in _as_list(body):
            if schema is not None and field_type(schema, f) is None:
                # missing key → condition is false (has_fields.go:31),
                # resolved at plan time instead of an analysis error
                cols.append(F.lit(False))
            else:
                cols.append(F.col(f).isNotNull())
        return _all(cols)

    if kind == "network":
        cols = []
        for f, specs in body.items():
            cols.append(_any([_network_one(F.col(f), s) for s in _as_list(specs)]))
        return _all(cols)

    raise ValueError(f"unknown condition kind {kind!r}")
