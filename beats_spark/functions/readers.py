"""Reader-stack helpers (``libbeat/reader/readfile/``), as column ops.

The reference composes pull-based readers: encode → strip_newline →
limit → parsers → include_message (``filestream/input.go:479-500``,
``reader/parser/parser.go:86-160``). Row-wise equivalents:
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["include_lines", "exclude_lines", "limit_message",
           "strip_newline", "split_lines", "attach_file_meta",
           "DEFAULT_MAX_BYTES"]

DEFAULT_MAX_BYTES = 10 * 1024 * 1024  # reader/parser/parser.go:66-68


def include_lines(df: DataFrame, field: str, patterns: List[str]) -> DataFrame:
    """Keep rows matching any regex (``input.go:770-784``). Plan-side →
    Catalyst pushes this to the scan when possible."""
    cond = None
    for p in patterns:
        c = F.col(field).rlike(p)
        cond = c if cond is None else (cond | c)
    return df.filter(cond) if cond is not None else df


def exclude_lines(df: DataFrame, field: str, patterns: List[str]) -> DataFrame:
    """Drop rows matching any regex (``input.go:770-784``)."""
    cond = None
    for p in patterns:
        c = F.col(field).rlike(p)
        cond = c if cond is None else (cond | c)
    return df.filter(~F.coalesce(cond, F.lit(False))) if cond is not None else df


def strip_newline(col: Column) -> Column:
    """Trim trailing line terminators (``readfile/strip_newline.go``)."""
    return F.regexp_replace(col, r"[\r\n]+$", "")


def limit_message(df: DataFrame, field: str,
                  max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """Truncate oversized messages and tag ``truncated``
    (``readfile/limit.go``): byte-budget cut on the utf-8 encoding."""
    col = F.col(field)
    over = F.octet_length(col) > max_bytes
    cut = F.decode(F.substring(F.encode(col, "utf-8"), 1, max_bytes), "utf-8")
    prev = (F.coalesce(F.col("log_flags"), F.array().cast("array<string>"))
            if "log_flags" in df.columns else F.array().cast("array<string>"))
    return df.withColumns({
        field: F.when(over, cut).otherwise(col),
        "log_flags": F.when(
            over, F.array_union(prev, F.array(F.lit("truncated")))
        ).otherwise(prev),
    })


def attach_file_meta(df: DataFrame, path_col: str = "log_file_path",
                     extra: Optional[dict] = None) -> DataFrame:
    """filemeta reader (``readfile/metafields.go``; wired
    ``input.go:492``): attach the source path (``input_file_name`` —
    the file-backed analog of ``log.file.path``) plus caller-supplied
    identity fields (device/inode/fingerprint/owner become literals or
    derived columns in an engine)."""
    out = df.withColumn(path_col, F.input_file_name())
    for k, v in (extra or {}).items():
        out = out.withColumn(k, v if isinstance(v, Column) else F.lit(v))
    return out


def split_lines(df: DataFrame, text_field: str, out_field: str = "line",
                keep_empty: bool = False) -> DataFrame:
    """Document → one row per line with a ``line_no`` ordering column
    (the harvester's per-file line stream, ``readfile/line.go:57``;
    empty lines dropped like ``input.go:729-737``)."""
    exploded = df.select(
        "*",
        F.posexplode(F.split(F.col(text_field), "\n")).alias("line_no", out_field),
    )
    if not keep_empty:
        exploded = exploded.filter(F.col(out_field) != "")
    return exploded
