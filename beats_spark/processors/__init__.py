"""Processor registry and chain compiler.

The reference interprets a flat processor list per event
(``libbeat/processors/processor.go:34-37``, Run ``:170-183``), with
``when:`` wrappers (``processors/conditionals.go:108-127``) and
``if/then/else`` (``:129-183``). Registration is by config key
(``processors/registry.go``, one action key per entry
``processor.go:86-91``).

Here a processor compiles to a :class:`ProcResult` — column
assignments, column drops, an optional row-keep predicate, or (rarely)
a whole-frame reshape — and the chain is a left fold of DataFrame
transforms. ``when:`` merges per column with ``F.when(cond, new)
.otherwise(old)`` so a guarded processor costs zero extra scans
(the reference pays an event clone + branch per event instead).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..conditions import compile_condition

__all__ = [
    "ProcResult", "register", "build_processor", "compile_processors",
    "registry",
]


@dataclass
class ProcResult:
    """What one processor does to the frame, declaratively."""
    assigns: Dict[str, Column] = field(default_factory=dict)
    drops: List[str] = field(default_factory=list)
    keep: Optional[Column] = None            # row filter (drop_event)
    reshape: Optional[Callable[[DataFrame], DataFrame]] = None  # select-style


# builder(cfg) -> (df -> ProcResult)
Builder = Callable[[Mapping[str, Any]], Callable[[DataFrame], ProcResult]]

registry: Dict[str, Builder] = {}

_IF_SEQ = 0  # unique marker-column suffix per if/then/else level


def register(name: str) -> Callable[[Builder], Builder]:
    def deco(b: Builder) -> Builder:
        registry[name] = b
        return b
    return deco


def _apply(df: DataFrame, r: ProcResult) -> DataFrame:
    if r.reshape is not None:
        df = r.reshape(df)
    if r.assigns:
        df = df.withColumns(r.assigns)
    if r.drops:
        df = df.drop(*[c for c in r.drops if c in df.columns])
    if r.keep is not None:
        df = df.filter(r.keep)
    return df


def _apply_when(df: DataFrame, r: ProcResult, cond: Column) -> DataFrame:
    """conditionals.go:74-79 — wrapped processor runs only where cond
    holds; merged per column, no branch-and-union."""
    if r.reshape is not None:
        raise ValueError("select-style processors cannot take `when:`")
    assigns = {}
    for name, col in r.assigns.items():
        if name in df.columns:
            assigns[name] = F.when(cond, col).otherwise(F.col(name))
        else:
            assigns[name] = F.when(cond, col)     # else null, keeps col type
    for name in r.drops:
        if name in df.columns:
            assigns[name] = F.when(cond, F.lit(None)).otherwise(F.col(name))
    if assigns:
        df = df.withColumns(assigns)
    if r.keep is not None:
        df = df.filter(~cond | r.keep)
    return df


def build_processor(cfg: Mapping[str, Any]) -> Callable[[DataFrame], DataFrame]:
    """One config entry → DataFrame transform.

    Accepts ``{name: {...}}`` with optional sibling ``when:``, or the
    ``if/then/else`` form (processor.go:69-123).
    """
    cfg = dict(cfg)
    if "if" in cfg:
        cond_cfg = cfg.pop("if")
        then_cfg = cfg.pop("then")
        else_cfg = cfg.pop("else", None)
        when_cfg = cfg.pop("when", None)
        # snapshot the condition before either branch mutates its inputs
        # (the reference evaluates Check(event) once per event,
        # conditionals.go:186-200). The marker column gets a UNIQUE name
        # per if-level so nested if/then/else keeps the outer guard
        # intact, and a sibling `when:` folds into the condition.
        global _IF_SEQ
        _IF_SEQ += 1
        col_name = f"__if_cond_{_IF_SEQ}"
        marker = {"equals": {col_name: True}}
        # a sibling/propagated `when:` (e.g. the enclosing if's marker)
        # must gate BOTH branches — the reference skips the whole
        # if/then/else when the wrapper condition is false
        then_guard = (marker if when_cfg is None
                      else {"and": [when_cfg, marker]})
        else_guard = ({"not": marker} if when_cfg is None
                      else {"and": [when_cfg, {"not": marker}]})
        then_t = compile_processors(
            then_cfg if isinstance(then_cfg, list) else [then_cfg],
            _guard=then_guard)
        else_t = None
        if else_cfg is not None:
            else_t = compile_processors(
                else_cfg if isinstance(else_cfg, list) else [else_cfg],
                _guard=else_guard)

        def both(df: DataFrame) -> DataFrame:
            cond = F.coalesce(compile_condition(cond_cfg), F.lit(False))
            df = df.withColumn(col_name, cond)
            df = then_t(df)
            if else_t is not None:
                df = else_t(df)
            return df.drop(col_name)
        return both

    when_cfg = cfg.pop("when", None)
    if len(cfg) != 1:
        raise ValueError(f"exactly one action per processor entry: {cfg}")
    (name, body), = cfg.items()
    if name not in registry:
        raise ValueError(f"unknown processor {name!r}")
    make = registry[name](body or {})

    def transform(df: DataFrame) -> DataFrame:
        r = make(df)
        if when_cfg is None:
            return _apply(df, r)
        return _apply_when(df, r, compile_condition(when_cfg,
                                                    schema=df.schema))

    return transform


def compile_processors(
    configs: Sequence[Mapping[str, Any]],
    _guard: Optional[Mapping[str, Any]] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Processor list → one composed DataFrame transform (the IR is the
    DataFrame plan itself; Catalyst is the optimizer — SURVEY.md §3.1)."""
    transforms = []
    for c in configs:
        c = dict(c)
        if _guard is not None:
            if "when" in c:
                c["when"] = {"and": [_guard, c["when"]]}
            else:
                c["when"] = _guard
        transforms.append(build_processor(c))

    def chained(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return chained


# populate the registry
from . import core as _core          # noqa: E402,F401
from . import decode as _decode      # noqa: E402,F401
from . import enrich as _enrich      # noqa: E402,F401
from . import misc as _misc          # noqa: E402,F401
