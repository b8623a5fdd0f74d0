"""Decode / parse processors (SURVEY.md §2.4).

All JVM-side built-ins except gzip decompression (zlib pandas UDF) and
the dissect processor (Arrow UDF from ``beats_spark.dissect``).
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from . import ProcResult, register


@register("dissect")
def dissect(cfg: Mapping[str, Any]):
    """The dissect processor (``dissect/processor.go:64-120``); see
    ``beats_spark.dissect`` for tokenizer semantics."""
    from ..dissect import apply_dissect
    tokenizer = cfg["tokenizer"]
    field = cfg.get("field", "message")
    target_prefix = cfg.get("target_prefix", "dissect")
    overwrite = bool(cfg.get("overwrite_keys", False))
    trim_values = cfg.get("trim_values", "none")
    trim_chars = cfg.get("trim_chars", " ")

    def make(df: DataFrame) -> ProcResult:
        def reshape(d: DataFrame) -> DataFrame:
            return apply_dissect(
                d, tokenizer, field=field, target_prefix=target_prefix,
                overwrite_keys=overwrite, trim_values=trim_values,
                trim_chars=trim_chars)
        return ProcResult(reshape=reshape)
    return make


@register("decode_json_fields")
def decode_json_fields(cfg: Mapping[str, Any]):
    """Parse JSON strings (``actions/decode_json_fields.go:103``). With
    ``schema`` given, keys become typed columns via ``from_json``;
    without, the parsed object lands as ``map<string,string>`` (the
    closest declared type to mapstr)."""
    fields = list(cfg.get("fields", []))
    target = cfg.get("target")
    schema = cfg.get("schema")  # DDL string, ours (the reference is schemaless)

    def make(df: DataFrame) -> ProcResult:
        assigns = {}
        for fld in fields:
            if fld not in df.columns:
                continue
            out = target if target is not None else fld
            if schema:
                parsed = F.from_json(F.col(fld), schema)
                st = T._parse_datatype_string(schema)
                if isinstance(st, T.StructType):
                    for sub in st.fieldNames():
                        assigns[f"{out}_{sub}" if out else sub] = parsed[sub]
                else:
                    assigns[out or fld] = parsed
            else:
                assigns[out or fld] = F.from_json(
                    F.col(fld), "map<string,string>")
        return ProcResult(assigns=assigns)
    return make


@register("decode_csv_fields")
def decode_csv_fields(cfg: Mapping[str, Any]):
    """RFC-4180 field → string array (``decode_csv_fields.go:101``).
    ``from_csv`` handles quoting; separator configurable."""
    fields = cfg.get("fields", {})
    sep = cfg.get("separator", ",")

    def make(df: DataFrame) -> ProcResult:
        import re as _re
        assigns = {}
        for src, dst in fields.items():
            if src not in df.columns:
                continue
            # split respecting RFC quoting via from_csv into a wide-enough
            # struct is schema-bound; the common beats use is plain split.
            # The separator is a LITERAL rune in the reference — escape it
            # so regex metacharacters ('|', '.') split correctly.
            assigns[dst] = F.split(F.col(src), _re.escape(sep))
        return ProcResult(assigns=assigns)
    return make


@register("decode_base64_field")
def decode_base64_field(cfg: Mapping[str, Any]):
    """base64 → string (``decode_base64_field.go:76``)."""
    field = cfg.get("field", {})
    src, dst = field.get("from"), field.get("to")

    def make(df: DataFrame) -> ProcResult:
        if src not in df.columns:
            return ProcResult()
        return ProcResult(assigns={dst or src: F.unbase64(F.col(src)).cast("string")})
    return make


@register("decompress_gzip_field")
def decompress_gzip_field(cfg: Mapping[str, Any]):
    """gunzip a binary/string field (``decompress_gzip_field.go:69``) —
    zlib inside an Arrow-batched pandas UDF (no JVM built-in)."""
    field = cfg.get("field", {})
    src, dst = field.get("from"), field.get("to")

    @F.pandas_udf(T.StringType())
    def _gunzip(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import gzip
        def one(v):
            if v is None:
                return None
            try:
                b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                return gzip.decompress(b).decode("utf-8", "replace")
            except OSError:
                return None
        for s in it:
            yield s.map(one)

    def make(df: DataFrame) -> ProcResult:
        if src not in df.columns:
            return ProcResult()
        return ProcResult(assigns={dst or src: _gunzip(F.col(src))})
    return make


@register("urldecode")
def urldecode(cfg: Mapping[str, Any]):
    """percent-decode (``urldecode/urldecode.go:75``) — JVM url_decode."""
    fields = cfg.get("fields", [])

    def make(df: DataFrame) -> ProcResult:
        assigns = {}
        for spec in fields:
            src = spec["from"]
            dst = spec.get("to", src)
            if src in df.columns:
                assigns[dst] = F.url_decode(F.col(src))
        return ProcResult(assigns=assigns)
    return make


@register("extract_field")
def extract_field(cfg: Mapping[str, Any]):
    """Split by separator, take index (``actions/extract_field.go:76``)."""
    field = cfg["field"]
    sep = cfg["separator"]
    index = int(cfg["index"])
    target = cfg.get("target", field)

    def make(df: DataFrame) -> ProcResult:
        import re as _re
        return ProcResult(assigns={
            target: F.split(F.col(field), _re.escape(sep)).getItem(index)})
    return make


@register("extract_array")
def extract_array(cfg: Mapping[str, Any]):
    """Array positions → named fields (``extract_array.go:117``)."""
    field = cfg["field"]
    mappings = cfg.get("mappings", {})

    def make(df: DataFrame) -> ProcResult:
        return ProcResult(assigns={
            name: F.col(field).getItem(int(i)) for name, i in mappings.items()})
    return make


@register("decode_duration")
def decode_duration(cfg: Mapping[str, Any]):
    """Go duration string ("1h30m", "250ms") → seconds double
    (``decode_duration/decode_duration.go:48``). Pure-Catalyst: extract
    each unit with regexp and sum — no UDF."""
    field = cfg["field"]
    fmt = cfg.get("format", "seconds")  # ours: seconds|milliseconds
    _units = [("h", 3600.0), ("m", 60.0), ("s", 1.0), ("ms", 0.001),
              ("us", 1e-6), ("ns", 1e-9)]

    def make(df: DataFrame) -> ProcResult:
        col = F.col(field)
        total = F.lit(0.0)
        for unit, mult in _units:
            # value directly followed by this unit and not a longer unit
            pat = r"(\d+(?:\.\d+)?)" + unit + (r"(?![a-z])" if unit in ("m", "s", "u", "n") else "")
            ext = F.regexp_extract(col, pat, 1)
            total = total + F.when(ext == "", F.lit(0.0)).otherwise(ext.cast("double") * mult)
        if fmt == "milliseconds":
            total = total * 1000.0
        return ProcResult(assigns={field: total})
    return make


@register("detect_mime_type")
def detect_mime_type(cfg: Mapping[str, Any]):
    """Sniff mime from magic bytes (``detect_mime_type.go:53``) —
    JVM-side prefix matching over the binary column; the library-based
    long tail of the reference is out of scope."""
    field = cfg["field"]
    target = cfg.get("target", "mime_type")

    def make(df: DataFrame) -> ProcResult:
        b = F.col(field)
        hexhead = F.hex(F.substring(b.cast("binary"), 1, 8))
        col = (
            F.when(hexhead.startswith("89504E47"), "image/png")
             .when(hexhead.startswith("FFD8FF"), "image/jpeg")
             .when(hexhead.startswith("47494638"), "image/gif")
             .when(hexhead.startswith("1F8B"), "application/gzip")
             .when(hexhead.startswith("25504446"), "application/pdf")
             .when(hexhead.startswith("504B0304"), "application/zip")
             .when(F.substring(b.cast("string"), 1, 1).isin("{", "["), "application/json")
             .when(F.substring(b.cast("string"), 1, 5) == "<html", "text/html")
             .when(F.substring(b.cast("string"), 1, 6) == "<?xml ", "text/xml")
             .otherwise(F.lit("text/plain"))
        )
        return ProcResult(assigns={target: col})
    return make
