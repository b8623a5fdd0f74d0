"""Charset decoding for the reader stack — the reference's encoding
table (``libbeat/reader/readfile/encoding/encoding.go:38-108``) mapped
onto Spark.

The reference wraps every harvester stream in an x/text decoder chosen
by config name. Here the same names resolve to either a pure-JVM
``F.decode`` (the charsets the JVM builtin accepts: UTF-8, ISO-8859-1,
US-ASCII, UTF-16*) or an Arrow-batched kernel over Python's codec
registry (IBM codepages, KOI8, Windows-125x, GBK, Mac charmaps, …).
Unknown names fall through to the Python codec registry lookup like the
reference falls through to htmlindex.

Divergence notes: the explicit-bidi ISO8859 variants (``iso8859-6e``
etc.) decode as their base charmap — the byte→rune table is identical,
only bidi metadata differs, which a column engine does not carry. The
``-bom`` UTF-16 variants honor a BOM when present and fall back to the
stated endianness, like the reference's seekable-source codecs.
"""

from __future__ import annotations

import codecs
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["ENCODINGS", "resolve_encoding", "decode_charset",
           "decode_text_field"]

# beats config name → Python codec name (encoding.go:38-108; the
# ebcdic-1040 key is the reference's own alias for CodePage1140)
ENCODINGS = {
    "nop": None, "plain": None,
    "unicode-1-1-utf-8": "utf-8", "utf-8": "utf-8", "utf8": "utf-8",
    "gbk": "gbk",
    **{f"iso8859-{i}": f"iso8859_{i}"
       for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14, 15, 16)},
    "iso8859-6e": "iso8859_6", "iso8859-6i": "iso8859_6",
    "iso8859-8e": "iso8859_8", "iso8859-8i": "iso8859_8",
    **{f"cp{n}": f"cp{n}"
       for n in (437, 850, 852, 855, 858, 860, 862, 863, 865, 866)},
    "ebcdic-037": "cp037", "ebcdic-1040": "cp1140",
    "ebcdic-1047": "cp1047",
    "koi8r": "koi8_r", "koi8u": "koi8_u",
    "macintosh": "mac_roman", "macintosh-cyrillic": "mac_cyrillic",
    **{f"windows{n}": f"cp{n}"
       for n in (1250, 1251, 1252, 1253, 1254, 1255, 1256, 1257, 1258)},
    "windows874": "cp874",
    "utf-16-bom": "utf-16", "utf-16be-bom": "utf-16be-bom",
    "utf-16le-bom": "utf-16le-bom",
}

# names the JVM's decode() accepts directly — zero-Python fast path
_JVM_CHARSETS = {"utf-8": "UTF-8", "iso8859_1": "ISO-8859-1"}


def resolve_encoding(name: str) -> Optional[str]:
    """Config name → Python codec name. Mirrors the reference's
    ``findEncoding``: the explicit table first, then the general codec
    registry (its htmlindex fallthrough); unknown → ValueError."""
    key = name.strip().lower()
    if key in ENCODINGS:
        return ENCODINGS[key]
    try:
        return codecs.lookup(key).name
    except LookupError:
        raise ValueError(f"unknown encoding {name!r} "
                         "(encoding.go findEncoding would also fail)")


def _decode_udf(codec: str):
    @F.pandas_udf("string")
    def _dec(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(v):
            if v is None:
                return None
            b = bytes(v)
            c = codec
            if c == "utf-16be-bom" or c == "utf-16le-bom":
                if b.startswith(codecs.BOM_UTF16_LE):
                    return b[2:].decode("utf-16-le", "replace")
                if b.startswith(codecs.BOM_UTF16_BE):
                    return b[2:].decode("utf-16-be", "replace")
                c = "utf-16-be" if c == "utf-16be-bom" else "utf-16-le"
            return b.decode(c, "replace")
        for s in it:
            yield s.map(one)
    return _dec


def decode_charset(col: Column, encoding: str = "utf-8") -> Column:
    """Binary column → string under the named charset.

    utf-8 / latin-1 stay pure JVM (``F.decode``); every other charset
    goes through one Arrow-batched kernel — map-side, no shuffle, the
    same place the reference pays its per-byte transform cost."""
    codec = resolve_encoding(encoding)
    if codec is None:  # plain/nop: bytes pass through 1:1
        return F.decode(col, "ISO-8859-1")
    if codec in _JVM_CHARSETS:
        return F.decode(col, _JVM_CHARSETS[codec])
    return _decode_udf(codec)(col)


def decode_text_field(df: DataFrame, field: str,
                      encoding: str = "utf-8",
                      target: Optional[str] = None) -> DataFrame:
    """Reader-stack form: decode ``field`` (binary) into ``target``
    (default: in place) — the harvester's LineReader charset step."""
    return df.withColumn(target or field,
                         decode_charset(F.col(field), encoding))
