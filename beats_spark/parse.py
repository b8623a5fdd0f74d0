"""Fused parse stage: multiline-join + dissect + explode in ONE
``mapInPandas`` operator.

Why fused: a Python UDF feeding ``posexplode`` is planned by Spark's
ExtractPythonUDFs into *two* ArrowEvalPython nodes (the generator
argument is extracted separately), i.e. the multiline UDF runs twice
per row. One ``mapInPandas`` stage does multiline segmentation, dissect
tokenization and row explosion in a single Arrow round-trip — the batch
analog of the reference's reader chain (line reader → multiline →
message, ``filestream/input.go:479-500``) which also makes exactly one
pass per byte.

Output keeps the extracted keys as ``map<string,string>``; typed
columns are materialized downstream with Catalyst casts
(``beats_spark.dissect.spark.cast_for``), so Python handles only what
Catalyst genuinely cannot (the tokenizers).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .dissect.spark import FLAG_PARSING_ERROR, cast_for
from .dissect.tokenizer import Dissector
from .functions.multiline import segment_lines

__all__ = ["parse_pages"]

_OUT_SCHEMA = ("url string, warc_ts timestamp, lang string, msg_idx int, "
               "message string, kv map<string,string>")


def parse_pages(
    pages: DataFrame,
    tokenizer: str,
    pattern: str = r"^\s",
    negate: bool = False,
    match: str = "after",
    max_lines: int = 500,
    typed: bool = True,
    target_prefix: str = "",
) -> DataFrame:
    """pages(url, warc_ts, lang, text, …) → one row per event with
    typed dissect columns and ``log_flags``."""
    dissector = Dissector(tokenizer)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        safe = dissector.dissect_safe
        for pdf in batches:
            urls, tss, langs, idxs, msgs, kvs = [], [], [], [], [], []
            for url, ts, lang, text in zip(
                    pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["text"]):
                if text is None:
                    continue
                events = segment_lines(
                    text.split("\n"), pattern=pattern, negate=negate,
                    match=match, max_lines=max_lines)
                for i, m in enumerate(events):
                    urls.append(url)
                    tss.append(ts)
                    langs.append(lang)
                    idxs.append(i)
                    msgs.append(m)
                    kvs.append(safe(m))  # dissect sees the full joined message
            yield pd.DataFrame({
                "url": urls, "warc_ts": tss, "lang": langs,
                "msg_idx": pd.array(idxs, dtype="int32"),
                "message": msgs, "kv": kvs,
            })

    events = (
        pages.select("url", "warc_ts", "lang", "text")
        .mapInPandas(fn, _OUT_SCHEMA)
    )

    def out_name(key: str) -> str:
        return f"{target_prefix}_{key}" if target_prefix else key

    assigns = {}
    for key in dissector.keys:
        raw = F.element_at(F.col("kv"), key)
        dt = dissector.data_types.get(key, "")
        assigns[out_name(key)] = cast_for(dt, raw) if (typed and dt) else raw
    assigns["log_flags"] = F.when(
        F.col("kv").isNull(), F.array(F.lit(FLAG_PARSING_ERROR))
    ).otherwise(F.array().cast("array<string>"))
    return events.withColumns(assigns).drop("kv")
