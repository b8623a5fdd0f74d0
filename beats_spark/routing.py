"""Output routing: the reference's ``outil.Selector`` compiled to one
deterministic ``when``-chain producing a ``sink`` column.

Reference semantics (``libbeat/outputs/outil/select.go``):

- a selector is an ordered rule list; **first non-empty string wins**
  (``select.go:209-213``, eval ``:341-354``)
- rule kinds: constant (``:185-190``), event format string with
  optional default (``:194-207``), conditional ``when:`` guard
  (``:217-222``), mapping table value→replacement with fallback
  (``:226-250``)
- built from ``index``/``indices`` (ES, ``idxmgmt/index_support.go:194``)
  or ``topic``/``topics`` (Kafka, ``outputs/kafka/kafka.go:93-101``)
- per-event ``@metadata`` overrides take precedence
  (``idxmgmt/index_support.go:330-347``)

Here: each rule compiles to ``(guard, value)`` Columns; empty strings
become null so ``F.coalesce`` over guarded values reproduces
first-non-empty-wins. Constant-only selectors fold to literals in
Catalyst, matching the reference's ``IsConst`` pre-resolution.
"""

from __future__ import annotations

from typing import Any, List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .conditions import compile_condition
from .fmtstr import compile_fmtstr

__all__ = ["compile_selector", "consistent_route", "route", "Rule"]


def _non_empty(col: Column) -> Column:
    return F.when(col == "", F.lit(None)).otherwise(col)


def _compile_rule(rule: Mapping[str, Any], key: str,
                  timestamp_field: str,
                  columns: "Optional[list]" = None) -> Column:
    """One selector rule → nullable string Column (null = no match)."""
    template = rule[key]
    value = compile_fmtstr(str(template), timestamp_field=timestamp_field,
                           columns=columns)

    mappings = rule.get("mappings")
    if mappings:
        pairs = []
        for k, v in mappings.items():
            pairs.extend([F.lit(str(k)), F.lit(str(v))])
        value = F.element_at(F.create_map(*pairs), value)

    # the reference treats an EMPTY mapping/format result like a miss
    # BEFORE falling back to the rule's default (select.go:226-250:
    # ``if v == "" { v = default }``) — so emptiness must null out
    # before the default coalesces, and again after (a default of ""
    # also yields nothing, letting the next rule win)
    value = _non_empty(value)

    default = rule.get("default")
    if default is not None:
        value = F.coalesce(value, F.lit(str(default)))

    value = _non_empty(value)

    when = rule.get("when")
    if when is not None:
        guard = when if isinstance(when, Column) else compile_condition(when)
        value = F.when(guard, value)
    return value


Rule = Mapping[str, Any]


def compile_selector(
    rules: Sequence[Rule],
    key: str = "index",
    default: Optional[str] = None,
    lowercase: bool = False,
    timestamp_field: str = "@timestamp",
    columns: "Optional[list]" = None,
) -> Column:
    """Ordered rules → the selected sink name per row.

    ``rules`` mirror the ``indices:``/``topics:`` config: each item has
    the value under ``key`` plus optional ``when``, ``default``,
    ``mappings``. A plain string rule is shorthand for a constant.
    """
    compiled: List[Column] = []
    for rule in rules:
        if isinstance(rule, str):
            compiled.append(_non_empty(
                compile_fmtstr(rule, timestamp_field, columns=columns)))
        else:
            compiled.append(_compile_rule(rule, key, timestamp_field,
                                          columns=columns))
    if default is not None:
        compiled.append(F.lit(default))
    out = compiled[0] if len(compiled) == 1 else F.coalesce(*compiled)
    if lowercase:
        out = F.lower(out)
    return out


def route(
    df: DataFrame,
    rules: Sequence[Rule],
    key: str = "index",
    default: Optional[str] = None,
    sink_col: str = "sink",
    meta_override: Optional[str] = None,
    lowercase: bool = False,
    timestamp_field: str = "@timestamp",
) -> DataFrame:
    """Attach the routed sink name. ``meta_override`` names a column
    (e.g. ``meta_raw_index`` written by add_formatted_index) that wins
    over the selector when non-null (``index_support.go:330-347``)."""
    sel = compile_selector(rules, key=key, default=default,
                           lowercase=lowercase,
                           timestamp_field=timestamp_field,
                           columns=df.columns)
    if meta_override and meta_override in df.columns:
        sel = F.coalesce(
            F.lower(F.col(meta_override)) if lowercase else F.col(meta_override),
            sel,
        )
    return df.withColumn(sink_col, sel)


def consistent_route(
    df: DataFrame,
    hosts: "list[str]",
    key_col: str,
    out_col: str = "host",
    vnodes: int = 64,
    seed: str = "",
) -> DataFrame:
    """Consistent-hash output load balancing — the semantics of
    beats' multi-host output balancing (`libbeat/outputs/
    loadbalance.go`, `outputs/logstash/config.go` `hosts:` lists)
    with the property round-robin lacks: when a host leaves, ONLY
    the keys that mapped to it move (≈1/N of traffic), everything
    else keeps its host — which is what preserves downstream
    affinity (per-host bulk queues, server-side caches) through a
    topology change.

    Classic Karger ring: each host projects ``vnodes`` virtual
    points onto a 60-bit circle (md5, the repo's portable-hex
    trick — any engine reproduces it); a key routes to the first
    point clockwise from its own hash, wrapping to the ring's first
    point. Ring points are computed driver-side with hashlib (one
    md5 per vnode — bit-identical to engine md5) and burned into the
    plan as a SORTED literal array, so the per-row work is one
    hash + one ordered array probe: ZERO shuffle, zero join, legal
    in a streaming projection.

    ``vnodes`` trades assignment smoothness for literal size (64 ×
    |hosts| structs in the plan; the classic variance bound is
    ~sqrt(1/vnodes)). NULL keys fail the job loudly (same contract
    as the deterministic samplers).
    """
    import hashlib
    if not hosts:
        raise ValueError("consistent_route: empty host list")
    if len(set(hosts)) != len(hosts):
        raise ValueError("consistent_route: duplicate hosts")
    if vnodes < 1:
        raise ValueError(f"consistent_route: vnodes must be >= 1, "
                         f"got {vnodes}")
    ring = sorted(
        (int(hashlib.md5(f"{h}#{i}#{seed}".encode()).hexdigest()[:15],
             16), h)
        for h in hosts for i in range(vnodes))
    arr = F.array(*[F.struct(F.lit(p).alias("p"), F.lit(h).alias("h"))
                    for p, h in ring])
    key = F.col(key_col)
    guard = F.assert_true(
        key.isNotNull(),
        F.lit(f"consistent_route: null {key_col} "
              "(filter or fill nulls first)"))
    salted = F.concat(key.cast("string"), F.lit("#"), F.lit(seed))
    kh = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10) \
        .cast("long")
    nxt = F.filter(arr, lambda s: s["p"] >= kh)
    chosen = F.when(F.size(nxt) > 0, F.element_at(nxt, 1)["h"]) \
        .otherwise(F.lit(ring[0][1]))
    return df.withColumn(out_col, F.when(guard.isNull(), chosen))
