"""YAML config front door — the reference's user surface.

A Beats deployment is driven by ``filebeat.yml``: a ``processors:``
list plus an ``output.*`` section whose ``index``/``indices`` (ES) or
``topic``/``topics`` (Kafka) build the outil selector
(``libbeat/outputs/outil/select.go``; ES wiring
``idxmgmt/index_support.go:194``, Kafka ``outputs/kafka/kafka.go:
93-101``). This module accepts that YAML (or the equivalent dict) and
compiles it to the engine's transforms, so a reference user can carry
their config over:

>>> pipe = load_pipeline(open("filebeat.yml").read())
>>> routed = pipe(df)            # processors applied + `sink` column

Supported surface: ``filebeat.inputs:`` (per-input path globs,
``parsers:`` — multiline/ndjson/container/syslog —
``include_lines``/``exclude_lines``, ``message_max_bytes`` (or the
log-input ``max_bytes``/``multiline:``/``json:`` spellings),
``encoding``, ``tags``/``fields``/``fields_under_root``, per-input
``processors``; ``filestream/config.go`` readerConfig +
``reader/parser/parser.go:86-160``), ``processors:`` (full registry
incl. ``when:`` and ``if/then/else``), ``output.elasticsearch``
(``index``, ``indices`` rules with when/mappings/default — selector
lowercased like ES), ``output.kafka`` (``topic``/``topics``, case
preserved), and ``output.file``/``console``/``discard`` (constant
sink). Dotted keys (``output.elasticsearch.index: x``) and nested maps
are both accepted, like libbeat's config unpacking.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, List, Mapping, Optional, Union

from pyspark.sql import DataFrame, functions as F

from .processors import compile_processors
from .routing import route

__all__ = ["load_pipeline", "compile_input", "CompiledPipeline"]


def _deep_merge(a: Dict[str, Any], b: Mapping[str, Any]) -> Dict[str, Any]:
    for k, v in b.items():
        if isinstance(v, Mapping) and isinstance(a.get(k), dict):
            _deep_merge(a[k], v)
        else:
            a[k] = v
    return a


def _unflatten(cfg: Mapping[str, Any]) -> Dict[str, Any]:
    """Dotted keys → nested dicts, recursively and deep-merged
    (libbeat configs mix ``output.elasticsearch.index: x`` with nested
    maps freely). Descends into LISTS too — the canonical docs
    spelling puts dotted keys inside list entries
    (``indices: [{index: …, when.contains: {…}}]``,
    ``processors: [{drop_event.when.equals: {…}}]``)."""
    out: Dict[str, Any] = {}
    for k, v in cfg.items():
        if isinstance(v, Mapping):
            v = _unflatten(v)
        elif isinstance(v, list):
            v = [_unflatten(x) if isinstance(x, Mapping) else x
                 for x in v]
        parts = str(k).split(".")
        cur = out
        for p in parts[:-1]:
            nxt = cur.setdefault(p, {})
            if not isinstance(nxt, dict):
                nxt = cur[p] = {}
            cur = nxt
        leaf = parts[-1]
        if isinstance(v, dict) and isinstance(cur.get(leaf), dict):
            _deep_merge(cur[leaf], v)
        else:
            cur[leaf] = v
    return out


def _lift_when(entry: Mapping[str, Any]) -> Dict[str, Any]:
    """Beats YAML nests ``when:`` UNDER the action key
    (``processors: [{drop_event: {when: …}}]``); the engine's chain
    compiler takes it as a sibling. Lift it; a nested and a sibling
    ``when`` combine conjunctively like stacked guards."""
    e = dict(entry)
    if "if" in e:
        return e
    action_keys = [k for k in e if k != "when"]
    if len(action_keys) != 1:
        return e
    body = e[action_keys[0]]
    if isinstance(body, Mapping) and "when" in body:
        body = dict(body)
        nested = body.pop("when")
        e[action_keys[0]] = body or None
        sibling = e.get("when")
        e["when"] = ({"and": [sibling, nested]} if sibling is not None
                     else nested)
    return e


def _glob_to_regex(pattern: str) -> str:
    """A Beats path glob → Java regex, with Go ``filepath.Match``
    semantics (``filestream/prospector_creator.go`` globs): ``*`` and
    ``?`` do NOT cross ``/`` (unlike Python fnmatch); ``**`` (the
    recursive spelling filebeat docs use) does."""
    out, i = [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            if pattern[i:i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            if j < len(pattern) and pattern[j] in "!^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 1
            if j < len(pattern):          # well-formed class
                cls = pattern[i + 1:j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append("[" + cls + "]")
                i = j + 1
                continue
            out.append(re.escape(c))      # dangling '[' → literal
        else:
            out.append(re.escape(c))
        i += 1
    return "^(?:" + "".join(out) + ")$"


def compile_input(cfg: Mapping[str, Any],
                  field: str = "message",
                  path_col: str = "path",
                  order_col: str = "line_no"
                  ) -> Optional[Callable[[DataFrame], DataFrame]]:
    """One ``filebeat.inputs:`` entry → DataFrame transform, in the
    reference's reader-stack order (``filestream/input.go:479-500``
    then ``:770-784``): path select → decode (``encoding``) →
    parser chain (``parsers:``) → limit (``message_max_bytes``) →
    ``include_lines`` → ``exclude_lines`` → input-common options
    (``tags``, ``fields``/``fields_under_root``, per-input
    ``processors``).

    Accepts the ``filestream`` surface (``filestream/config.go``
    readerConfig) plus the classic ``log``-input spellings
    (``max_bytes``, input-level ``multiline:``/``json:`` — compiled
    as the head of the parser chain). Returns None for
    ``enabled: false`` entries. Path globs match the ``path_col``
    column with Go ``filepath.Match`` semantics (``*`` stays inside
    one path segment; ``**`` recurses)."""
    cfg = _unflatten(cfg)
    if cfg.get("enabled", True) is False:
        return None
    itype = cfg.get("type", "filestream")
    if itype not in ("filestream", "log", "journald", "container"):
        raise ValueError(f"unsupported input type {itype!r}")

    paths = [str(p) for p in (cfg.get("paths") or [])]
    excl_files = [str(p) for p in
                  (cfg.get("prospector", {}).get("scanner", {})
                      .get("exclude_files") or [])]
    encoding = cfg.get("encoding")
    # filestream spells it message_max_bytes; log input max_bytes
    max_bytes = cfg.get("message_max_bytes", cfg.get("max_bytes"))
    include = [str(p) for p in (cfg.get("include_lines") or [])]
    exclude = [str(p) for p in (cfg.get("exclude_lines") or [])]

    parser_cfgs = list(cfg.get("parsers") or [])
    # classic log-input spellings compile to the head of the chain
    if "multiline" in cfg:
        parser_cfgs.insert(0, {"multiline": cfg["multiline"]})
    if "json" in cfg:
        parser_cfgs.insert(0, {"ndjson": cfg["json"]})
    if itype == "container" and not any("container" in p
                                        for p in parser_cfgs):
        parser_cfgs.insert(0, {"container": cfg.get("container") or {}})

    from .functions.parsers import compile_parsers
    parse_chain = compile_parsers(
        parser_cfgs, field=field,
        partition_cols=(path_col,), order_col=order_col) \
        if parser_cfgs else None

    extra_procs: List[Mapping[str, Any]] = []
    if cfg.get("tags"):
        extra_procs.append({"add_tags": {"tags": list(cfg["tags"])}})
    if cfg.get("fields"):
        target = "" if cfg.get("fields_under_root") else "fields"
        extra_procs.append({"add_fields": {"target": target,
                                           "fields": dict(cfg["fields"])}})
    extra_procs.extend(_lift_when(p)
                       for p in (cfg.get("processors") or []))
    input_procs = compile_processors(extra_procs) if extra_procs else None

    def transform(df: DataFrame) -> DataFrame:
        from .functions.readers import (exclude_lines as _ex,
                                        include_lines as _inc,
                                        limit_message)
        if paths:
            # a configured per-input path filter over a frame with no
            # such column must be an ERROR: silently skipping it would
            # run every input over every row and the input union
            # would multiply the whole dataset
            if path_col not in df.columns:
                raise ValueError(
                    f"input has paths: {list(paths)} but the frame "
                    f"has no {path_col!r} column — pass path_col= to "
                    "name the file-path column")
            cond = None
            for g in paths:
                c = F.col(path_col).rlike(_glob_to_regex(g))
                cond = c if cond is None else (cond | c)
            df = df.filter(cond)
        if excl_files and path_col in df.columns:
            for rx in excl_files:
                df = df.filter(~F.coalesce(
                    F.col(path_col).rlike(rx), F.lit(False)))
        if encoding:
            from pyspark.sql.types import BinaryType
            if isinstance(df.schema[field].dataType, BinaryType):
                from .functions.encoding import decode_text_field
                df = decode_text_field(df, field, encoding)
        if parse_chain is not None:
            df = parse_chain(df)
        if max_bytes is not None:
            df = limit_message(df, field, max_bytes=int(max_bytes))
        if include:
            df = _inc(df, field, include)
        if exclude:
            df = _ex(df, field, exclude)
        if input_procs is not None:
            df = input_procs(df)
        return df

    return transform


@dataclass
class CompiledPipeline:
    """The compiled config: ``inputs`` (zero or more per-input reader
    stacks from ``filebeat.inputs:`` — each selects its rows by path
    glob, parses, filters; their outputs union by name), ``transform``
    applies the global processor chain, ``router`` attaches the
    ``sink`` column; calling the object does all three (the shape of
    one Beats publish pipeline)."""
    transform: Callable[[DataFrame], DataFrame]
    router: Callable[[DataFrame], DataFrame]
    output_kind: str
    inputs: List[Callable[[DataFrame], DataFrame]] = dc_field(
        default_factory=list)

    def harvest(self, df: DataFrame) -> DataFrame:
        """Apply the ``filebeat.inputs:`` section: each input handles
        the rows its globs select; results union by column name
        (missing columns null-filled — inputs produce different parse
        columns). A row matching two inputs' globs is processed by
        both, exactly like two filebeat inputs harvesting the same
        file (a documented reference misconfiguration that duplicates
        events). No inputs configured → pass-through."""
        if not self.inputs:
            return df
        parts = [t(df) for t in self.inputs]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.router(self.transform(self.harvest(df)))


def _build_router(output: Mapping[str, Any],
                  timestamp_field: str) -> (str, Callable):
    """output.* section → router callable (outil selector wiring)."""
    if "elasticsearch" in output:
        es = output["elasticsearch"] or {}
        rules: List[Any] = list(es.get("indices", []))
        default = None
        index = es.get("index")
        if index is not None:
            # the plain `index` fmtstr is the selector's final
            # fallback rule (index_support.go:194-213)
            rules.append(str(index))
        if not rules:
            raise ValueError("output.elasticsearch needs index/indices")

        def router(df: DataFrame) -> DataFrame:
            return route(df, rules, key="index", default=default,
                         meta_override="meta_raw_index",
                         lowercase=True,       # ES index names
                         timestamp_field=timestamp_field)
        return "elasticsearch", router

    if "kafka" in output:
        kf = output["kafka"] or {}
        rules = list(kf.get("topics", []))
        topic = kf.get("topic")
        if topic is not None:
            rules.append(str(topic))
        if not rules:
            raise ValueError("output.kafka needs topic/topics")

        def router(df: DataFrame) -> DataFrame:
            return route(df, rules, key="topic",
                         meta_override="meta_raw_index",
                         lowercase=False,
                         timestamp_field=timestamp_field)
        return "kafka", router

    for kind in ("file", "console", "discard"):
        if kind in output:
            sink = (output[kind] or {}).get("sink", kind)

            def router(df: DataFrame, _s=str(sink)) -> DataFrame:
                return route(df, [_s], timestamp_field=timestamp_field)
            return kind, router

    raise ValueError(
        f"unsupported output section: {sorted(output)} "
        "(elasticsearch, kafka, file, console, discard)")


def load_pipeline(config: Union[str, Mapping[str, Any]],
                  timestamp_field: str = "@timestamp",
                  message_field: str = "message",
                  path_col: str = "path",
                  order_col: str = "line_no") -> CompiledPipeline:
    """Parse a Beats-style YAML string (or pre-parsed dict) into a
    compiled pipeline: ``filebeat.inputs:`` (per-input ``parsers:``,
    ``include_lines``/``exclude_lines``, ``message_max_bytes``, …),
    global ``processors:``, and ``output.*``. ``timestamp_field``
    names the event-time column the ``%{+format}`` fmtstr pieces read
    (the reference reads the event @timestamp); ``message_field`` /
    ``path_col`` / ``order_col`` map the input line stream onto the
    caller's table columns."""
    if isinstance(config, str):
        import yaml
        config = yaml.safe_load(config) or {}
    cfg = _unflatten(config)

    raw_inputs = (cfg.get("filebeat", {}) or {}).get("inputs") \
        or cfg.get("inputs") or []
    inputs = [t for t in
              (compile_input(i, field=message_field, path_col=path_col,
                             order_col=order_col)
               for i in raw_inputs)
              if t is not None]

    proc_cfgs = [_lift_when(p) for p in (cfg.get("processors", []) or [])]
    transform = compile_processors(proc_cfgs)

    output = cfg.get("output", {})
    if not output:
        # config with no output: inputs + processors, identity router
        return CompiledPipeline(transform=transform,
                                router=lambda df: df,
                                output_kind="none", inputs=inputs)
    kind, router = _build_router(output, timestamp_field)
    return CompiledPipeline(transform=transform, router=router,
                            output_kind=kind, inputs=inputs)
