"""Unicode text normalization — the pre-tokenizer cleanup every web
corpus needs before dedup/stats (mixed NFC/NFD spellings of the same
word otherwise hash differently, zero-widths hide inside tokens,
exotic spaces break whitespace tokenizers).

Three steps, in order:

1. **NFC normalization** — the one step Catalyst cannot express, as
   ONE Arrow-batched pandas UDF (``unicodedata.normalize``; Unicode's
   normalization-stability policy guarantees the result never changes
   across Unicode versions, and DuckDB's ``nfc_normalize`` produces
   the identical bytes — verified in tests). NFC, not NFKC, on
   purpose: compatibility folding (ﬁ→fi, ①→1) is lossy and belongs
   to an explicit opt-in, not a hygiene pass.
2. **control-character strip** (C0 minus tab/LF/CR, DEL, C1).
3. **zero-width removal + space unification** (NBSP, en/em/thin/
   ideographic spaces → ASCII space; ZWSP/ZWNJ/ZWJ/BOM → gone).

Steps 2–3 are pure JVM ``regexp_replace`` from one shared
(pattern, replacement) table in the RE2 ∩ Java common subset;
:func:`unicode_clean_sql` emits the identical chain (wrapped in
``nfc_normalize``) for DuckDB — the same cross-engine discipline as
the PII and HTML tables.

Scale: one ArrowEvalPython node plus codegen'd regexps, zero
shuffle. Derive downstream columns from the CLEANED column after a
materialization point if you reference it many times (the
CollapseProject recompute rule).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

__all__ = ["UNICODE_CLEAN_STEPS", "fold_accents",
           "fold_accents_sql", "nfc", "unicode_clean",
           "unicode_clean_sql", "clean_text_column"]

UNICODE_CLEAN_STEPS: Sequence[Tuple[str, str]] = (
    # C0 controls minus \t \n \r, DEL, C1 controls
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{0080}-\x{009F}]", ""),
    # zero-widths and the BOM-as-ZWNBSP
    (r"[\x{200B}-\x{200D}\x{FEFF}]", ""),
    # unicode horizontal spaces → ASCII space
    (r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]",
     " "),
)


def _nfc_fn(s: pd.Series) -> pd.Series:
    import unicodedata
    return s.map(lambda x: unicodedata.normalize("NFC", x)
                 if x is not None else None)


_nfc_udf = None


def nfc(col: Column) -> Column:
    """NFC-normalize a string column (Arrow-batched; NULL passes
    through). The pandas UDF is built on first use so that importing
    the package never requires pyarrow (decoration runs the Arrow
    version check)."""
    global _nfc_udf
    if _nfc_udf is None:
        _nfc_udf = F.pandas_udf(_nfc_fn, StringType())
    return _nfc_udf(col)


def unicode_clean(text: Column) -> Column:
    """NFC + control strip + space unification of ``text`` as a
    Column (NULL in, NULL out)."""
    out = nfc(text)
    for pat, rep in UNICODE_CLEAN_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def clean_text_column(df: DataFrame, text_col: str = "text",
                      out_col: str = None) -> DataFrame:
    """DataFrame form: clean ``text_col`` in place (or into
    ``out_col``)."""
    return df.withColumn(out_col or text_col,
                         unicode_clean(F.col(text_col)))


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def unicode_clean_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression over ``expr``."""
    out = f"nfc_normalize({expr})"
    for pat, rep in UNICODE_CLEAN_STEPS:
        out = f"regexp_replace({out}, {_q(pat)}, {_q(rep)}, 'g')"
    return out


#: Latin accent-folding map, kept as explicit (accented → ascii)
#: pairs so the translate() FROM/TO strings are derived and can never
#: drift out of alignment. Covers the Latin-1 + Latin-Extended-A
#: letters that dominate European-language web text; 1→2 expansions
#: (ß, ligatures) go through replace() below since translate is 1:1.
_ACCENT_MAP = {
    "àáâãäåāăą": "a", "èéêëēĕėęě": "e", "ìíîïĩīĭįı": "i",
    "òóôõöøōŏő": "o", "ùúûüũūŭůűų": "u", "çćĉċč": "c", "ñńņň": "n",
    "ðďđ": "d", "ğĝģ": "g", "ĥ": "h", "śŝşš": "s", "ţťŧ": "t",
    "ýÿŷ": "y", "źżž": "z", "ŕŗř": "r", "ĺļľŀł": "l", "ŵ": "w",
    "ÀÁÂÃÄÅĀĂĄ": "A", "ÈÉÊËĒĔĖĘĚ": "E", "ÌÍÎÏĨĪĬĮ": "I",
    "ÒÓÔÕÖØŌŎŐ": "O", "ÙÚÛÜŨŪŬŮŰŲ": "U", "ÇĆĈĊČ": "C", "ÑŃŅŇ": "N",
    "ÐĎĐ": "D", "ĞĜĢ": "G", "Ĥ": "H", "ŚŜŞŠ": "S", "ŢŤŦ": "T",
    "ÝŸŶ": "Y", "ŹŻŽ": "Z", "ŔŖŘ": "R", "ĹĻĽĿŁ": "L", "Ŵ": "W",
}
_ACCENT_FROM = "".join(_ACCENT_MAP)
_ACCENT_TO = "".join(ascii_ch * len(group)
                     for group, ascii_ch in _ACCENT_MAP.items())

#: 1→2 expansions translate() cannot express
_ACCENT_PAIRS = [("ß", "ss"), ("æ", "ae"), ("œ", "oe"),
                 ("Æ", "AE"), ("Œ", "OE")]


def fold_accents(col: Column) -> Column:
    """Fold Latin accents to ASCII (é→e, ñ→n, ß→ss, …) — the
    normalization step before cross-language exact/fuzzy host and
    token matching (``café.example`` and ``cafe.example`` should
    dedup together; so should a typosquat probe). Pure
    ``translate`` + ``replace`` chain: zero Python, whole-stage
    codegen, and reproducible verbatim in any engine with the
    Postgres translate() contract (see :func:`fold_accents_sql`).
    Non-Latin scripts pass through untouched — folding is not
    transliteration."""
    out = F.translate(col, _ACCENT_FROM, _ACCENT_TO)
    for a, b in _ACCENT_PAIRS:
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def fold_accents_sql(expr: str) -> str:
    """The exact DuckDB/Postgres spelling of :func:`fold_accents`,
    for oracle SQL."""
    out = f"translate({expr}, '{_ACCENT_FROM}', '{_ACCENT_TO}')"
    for a, b in _ACCENT_PAIRS:
        out = f"replace({out}, '{a}', '{b}')"
    return out
