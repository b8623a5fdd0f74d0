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

Arrow-shape note: extracted keys leave the Python stage as one plain
string column per key, NOT a ``map<string,string>`` — Arrow map
encoding plus JVM-side ``element_at`` extraction measured ~2× slower
than flat string columns at 32 workers. Typed values are materialized
with Catalyst casts (``beats_spark.dissect.spark.cast_for``), so
Python handles only what Catalyst genuinely cannot (the tokenizers).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .dissect.spark import FLAG_PARSING_ERROR, cast_for
from .dissect.tokenizer import Dissector
from .functions.multiline import segment_lines

__all__ = ["parse_pages"]


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
    keys: List[str] = list(dissector.keys)
    key_cols = [f"__k{i}" for i in range(len(keys))]
    out_schema = ("url string, warc_ts timestamp, lang string, "
                  "msg_idx int, message string, __ok boolean, "
                  + ", ".join(f"{c} string" for c in key_cols))

    # vectorized fast path: the tokenizer as ONE lazy-capture regex →
    # C-speed str.extract over the whole batch instead of a per-message
    # Python find() loop (identical output; see Dissector.to_regex)
    rx = dissector.to_regex()
    if rx is not None:
        rx_pat, rx_keys = rx
        if not rx_keys or len(set(rx_keys)) != len(rx_keys):
            rx = None

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import itertools
        import numpy as np
        safe = dissector.dissect_safe
        for pdf in batches:
            # python touches ONLY text; page-level columns fan out to
            # events via numpy repeat (no per-row boxing, timestamps
            # stay datetime64 end to end)
            # note: a pandas-vectorized batch segmenter was measured
            # SLOWER than this loop (pandas .str.contains is a cython
            # loop, not SIMD) — see BENCH.md optimization log
            nested = [
                segment_lines(t.split("\n"), pattern=pattern,
                              negate=negate, match=match,
                              max_lines=max_lines)
                if t is not None else []
                for t in pdf["text"].tolist()]
            counts = np.fromiter((len(m) for m in nested), dtype=np.int64,
                                 count=len(nested))
            total = int(counts.sum())
            msgs = list(itertools.chain.from_iterable(nested))
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            data = {
                "url": np.repeat(pdf["url"].values, counts),
                "warc_ts": np.repeat(pdf["warc_ts"].values, counts),
                "lang": np.repeat(pdf["lang"].values, counts),
                "msg_idx": (np.arange(total) - offsets).astype("int32"),
                "message": msgs,
            }
            if rx is not None:
                ext = pd.Series(msgs, dtype="object").str.extract(rx_pat)
                ext.columns = rx_keys
                # dissect treats the empty message as a parse failure
                # (dissect.go:57-62) even when the regex matches ''
                nonempty = np.fromiter((len(m) > 0 for m in msgs),
                                       dtype=bool, count=total)
                ok = ext[rx_keys[0]].notna().to_numpy() & nonempty
                data["__ok"] = ok
                ext[~ok] = None      # failed rows carry no key values
                for c, key in zip(key_cols, keys):
                    data[c] = (ext[key] if key in ext.columns
                               else pd.Series([None] * total,
                                              dtype="object"))
            else:
                oks, kcols = [], [[] for _ in keys]
                for m in msgs:
                    kv = safe(m)  # dissect on the full joined message
                    if kv is None:
                        oks.append(False)
                        for lst in kcols:
                            lst.append(None)
                    else:
                        oks.append(True)
                        for j, lst in enumerate(kcols):
                            lst.append(kv.get(keys[j]))
                data["__ok"] = pd.array(oks, dtype="boolean")
                for c, lst in zip(key_cols, kcols):
                    data[c] = lst
            yield pd.DataFrame(data)

    events = (
        pages.select("url", "warc_ts", "lang", "text")
        .mapInPandas(fn, out_schema)
    )

    def out_name(key: str) -> str:
        return f"{target_prefix}_{key}" if target_prefix else key

    assigns = {}
    for key, c in zip(keys, key_cols):
        raw = F.col(c)
        dt = dissector.data_types.get(key, "")
        assigns[out_name(key)] = cast_for(dt, raw) if (typed and dt) else raw
    assigns["log_flags"] = F.when(
        ~F.col("__ok"), F.array(F.lit(FLAG_PARSING_ERROR))
    ).otherwise(F.array().cast("array<string>"))
    return events.withColumns(assigns).drop("__ok", *key_cols)
