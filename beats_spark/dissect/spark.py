"""Spark integration for the dissect tokenizer.

The reference runs the tokenizer serially per event
(``libbeat/processors/dissect/processor.go:64-120``). Here the tokenizer
runs inside an Arrow-batched pandas UDF over a string Series — one
Python invocation per ~10k-row batch, not per row — returning a
``map<string,string>`` column. Known keys are then exploded into typed
top-level columns with plain Catalyst ``cast`` expressions so everything
downstream stays JVM-side and prunable.

Config parity (``dissect/config.go:34-47``): ``field`` (default
``message``), ``target_prefix`` (default ``dissect``; empty = root),
``ignore_failure``, ``overwrite_keys``, ``trim_values``, ``trim_chars``.
Parse failure tags ``log.flags += dissect_parsing_error``
(``dissect/processor.go:94-104``).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from .tokenizer import Dissector

__all__ = ["dissect_map_col", "apply_dissect", "FLAG_PARSING_ERROR", "cast_for"]

FLAG_PARSING_ERROR = "dissect_parsing_error"

_SPARK_TYPES = {
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "ip": T.StringType(),
}


def cast_for(data_type: str, col: Column) -> Column:
    """Catalyst cast matching dissect's |type conversion
    (``dissect/dissect.go:249-285``): trailing-space strip, 0x hex ints,
    fall back handled by null (Spark cast yields null on failure, the
    closest declarative analog to keep-as-string)."""
    v = F.rtrim(col)
    if data_type in ("integer", "long"):
        tgt = _SPARK_TYPES[data_type]
        hex_val = F.conv(F.regexp_replace(v, r"^0[xX]", ""), 16, 10).try_cast(tgt)
        return F.when(v.rlike(r"^0[xX][0-9a-fA-F]+$"), hex_val).otherwise(
            v.try_cast(tgt)
        )
    if data_type == "boolean":
        return F.when(v.isin("1", "t", "T", "TRUE", "true", "True"), F.lit(True)).when(
            v.isin("0", "f", "F", "FALSE", "false", "False"), F.lit(False)
        ).otherwise(F.lit(None).cast("boolean"))
    if data_type == "ip":
        return F.when(
            v.rlike(r"^((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(25[0-5]|2[0-4]\d|1?\d?\d)$")
            | v.contains(":"),
            v,
        ).otherwise(F.lit(None).cast("string"))
    return v.try_cast(_SPARK_TYPES.get(data_type, T.StringType()))


def dissect_map_col(col: Column, tokenizer: str, trim_values: str = "none",
                    trim_chars: str = " ") -> Column:
    """``map<string,string>`` of extracted keys; null map = parse failure.

    Arrow-batched: the Dissector compiles once per executor (closure
    capture), then runs a tight find()-loop per batch.
    """
    dissector = Dissector(tokenizer, trim_values=trim_values,
                          trim_chars=trim_chars)

    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _dissect(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        safe = dissector.dissect_safe
        for s in it:
            yield s.map(safe)

    return _dissect(col)


def apply_dissect(
    df: DataFrame,
    tokenizer: str,
    field: str = "message",
    target_prefix: str = "dissect",
    overwrite_keys: bool = False,
    trim_values: str = "none",
    trim_chars: str = " ",
    typed: bool = True,
) -> DataFrame:
    """Processor-shaped dissect: extract keys into columns named
    ``{target_prefix}_{key}`` (root columns when prefix empty), cast
    ``|type`` keys, and tag failures in the ``log_flags`` array column.

    The reference nests under ``target_prefix`` in the event map
    (``processor.go:126+``); with a declared schema we flatten to
    prefixed top-level columns so Catalyst prunes per-key.
    """
    d = Dissector(tokenizer, trim_values=trim_values, trim_chars=trim_chars)
    m = dissect_map_col(F.col(field), tokenizer, trim_values, trim_chars)
    df = df.withColumn("__dissect_map", m)

    def out_name(key: str) -> str:
        return f"{target_prefix}_{key}" if target_prefix else key

    for key in d.keys:
        name = out_name(key)
        if name in df.columns and not overwrite_keys:
            continue
        raw = F.element_at(F.col("__dissect_map"), key)
        dt = d.data_types.get(key, "")
        df = df.withColumn(name, cast_for(dt, raw) if (typed and dt) else raw)

    failed = F.col("__dissect_map").isNull()
    existing = F.col("log_flags") if "log_flags" in df.columns else F.array().cast("array<string>")
    df = df.withColumn(
        "log_flags",
        F.when(
            failed,
            F.array_union(F.coalesce(existing, F.array().cast("array<string>")),
                          F.array(F.lit(FLAG_PARSING_ERROR))),
        ).otherwise(existing),
    )
    return df.drop("__dissect_map")
