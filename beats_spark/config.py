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

Supported surface: ``processors:`` (full registry incl. ``when:`` and
``if/then/else``), ``output.elasticsearch`` (``index``, ``indices``
rules with when/mappings/default — selector lowercased like ES),
``output.kafka`` (``topic``/``topics``, case preserved), and
``output.file``/``console``/``discard`` (constant sink). Dotted keys
(``output.elasticsearch.index: x``) and nested maps are both accepted,
like libbeat's config unpacking.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Mapping, Optional, Union

from pyspark.sql import DataFrame

from .processors import compile_processors
from .routing import route

__all__ = ["load_pipeline", "CompiledPipeline"]


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


@dataclass
class CompiledPipeline:
    """The compiled config: ``transform`` applies the processor chain,
    ``router`` attaches the ``sink`` column; calling the object does
    both (the shape of one Beats publish pipeline)."""
    transform: Callable[[DataFrame], DataFrame]
    router: Callable[[DataFrame], DataFrame]
    output_kind: str

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.router(self.transform(df))


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
                  timestamp_field: str = "@timestamp"
                  ) -> CompiledPipeline:
    """Parse a Beats-style YAML string (or pre-parsed dict) into a
    compiled pipeline. ``timestamp_field`` names the event-time column
    the ``%{+format}`` fmtstr pieces read (the reference reads the
    event @timestamp)."""
    if isinstance(config, str):
        import yaml
        config = yaml.safe_load(config) or {}
    cfg = _unflatten(config)

    proc_cfgs = [_lift_when(p) for p in (cfg.get("processors", []) or [])]
    transform = compile_processors(proc_cfgs)

    output = cfg.get("output", {})
    if not output:
        # config with no output: processors only, identity router
        return CompiledPipeline(transform=transform,
                                router=lambda df: df,
                                output_kind="none")
    kind, router = _build_router(output, timestamp_field)
    return CompiledPipeline(transform=transform, router=router,
                            output_kind=kind)
