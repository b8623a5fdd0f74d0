"""Common Event Format (CEF) decoding, pure codegen.

Reference: x-pack filebeat's ``decode_cef`` processor
(``x-pack/filebeat/processors/decode_cef/cef/cef.go:106-176`` and the
ragel grammar it generates from; vectors ported from
``cef/cef_test.go:15-63``). The reference parses with a generated
state machine; here the same grammar is factored into sentinel-marked
regex passes that run entirely inside whole-stage codegen — no Python
worker, and every regex avoids lookaround/backrefs so Java regex and
RE2 (DuckDB) agree byte-for-byte, making the oracle exact.

Grammar recap (cef.go:103-124):

- header: ``CEF:Version|Vendor|Product|Version|ClassID|Name|Severity|``
  — seven ``|``-delimited values; ``\\|`` and ``\\\\`` escape pipe and
  backslash; a raw ``=`` is legal in header values.
- extensions: ``key=value`` pairs separated by a single space. A key
  starts ``[A-Za-z0-9_]`` and continues ``[A-Za-z0-9_.,\\[\\]-]``
  (cef.go:121-124 — looser than the spec, matching practice). The
  value runs until the next space-preceded ``key=`` token; interior
  spaces, raw pipes, tabs and control chars are value content
  (cef_test.go: pipeInMessage, tabMessage).
- value escapes: ``\\=`` ``\\\\`` and the literal sequences ``\\n`` /
  ``\\r`` which decode to LF / CR (cef.go:182-220 replaceEscapes).
  Any other escape (e.g. ``\\|``) is malformed and the *field* is
  dropped with an error, as is a value containing an unescaped ``=``
  (cef_test.go: errorEscapedPipeInExtension,
  errorMultipleMalformedExtensionValues — ``id==old_id`` drops ``id``
  but parsing recovers at ``user=root``).
- trailing ``[ \\t\\r\\n]`` of the *final* value is trimmed; trailing
  spaces of non-final values are preserved minus the single separator
  space (cef_test.go: padded / crlf vectors).

Scale shape: one projection, zero exchanges, zero Python. The decode
is ~10 regexp passes over the message column; duplicate-key last-wins
resolution is a bounded O(n²) array filter (n ≤ pairs per event, the
reference itself caps its map estimate at 50 — cef.go:86-92).

Out of scope (documented, not hidden): the reference's
``recoverExtensions`` second pass that salvages extensions from events
whose *header* is truncated (cef.go:134-141, truncatedHeader vector) —
here an incomplete header yields null header fields and no extensions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "CEF_HEADER_FIELDS", "cef_header", "cef_pairs", "cef_get",
    "cef_extensions", "decode_cef", "kv_get",
]

# extension key charset, cef.go:121-124 + hyphenInExtensionKey vector
_KEY = r"[A-Za-z0-9_][A-Za-z0-9_.,\[\]\-]*"

# one escaped-or-plain header char: backslash escapes anything; a raw
# pipe terminates the field. (?s) at use-site lets values span newlines.
_HCHAR = r"(?:\\.|[^\\|])"

_HEADER_RE = (
    r"(?s)^CEF:(\d+)"
    + (r"\|(" + _HCHAR + r"*)") * 6
    + r"\|(.*)$"
)

CEF_HEADER_FIELDS = ("cef_version", "device_vendor", "device_product",
                     "device_version", "device_event_class_id", "name",
                     "severity")

# pair-boundary sentinel + backslash stash for the unescape chain.
# Log lines containing raw \x01/\x02 control bytes are undefined input
# (the reference's UTF-8 contract); tab/CR/LF are preserved fine.
_SEP = "\x01"
_STASH = "\x02"

# a value is well-formed iff every backslash opens one of the four
# legal escapes and every ``=`` is escaped (cef.go:182-220 + the
# malformed-vector expectations).
_VALID_VALUE = r"^(?:\\[\\=nr]|[^\\=])*$"


def _unescape(col: Column) -> Column:
    """Left-to-right escape decode, header and extension shared
    (cef.go:182-220): ``\\\\``→``\\``, ``\\n``→LF, ``\\r``→CR, any
    other ``\\x``→``x``. Each regexp_replace pass is itself a
    left-to-right consume, so chaining stash → specials → generic
    reproduces the reference's single-scan pairing exactly
    (``\\\\n`` is backslash-then-n, not an escaped newline)."""
    c = F.regexp_replace(col, r"\\\\", _STASH)
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\(.)", "$1")
    return F.regexp_replace(c, _STASH, "\\\\")


def cef_header(line: Column) -> Column:
    """Seven-field header struct; null fields when ``line`` is not a
    complete CEF header (see module docstring on truncated headers).
    ``cef_version`` is int (cef_test.go expects ``Version == 26``)."""
    vals = [F.regexp_extract(line, _HEADER_RE, i) for i in range(1, 8)]
    # regexp_extract yields '' on no-match; distinguish via a match
    # probe so genuinely-empty device fields (emptyDeviceFields
    # vector) survive as '' while non-CEF lines go null.
    ok = line.rlike(_HEADER_RE)
    out = [F.when(ok, v) for v in vals]
    return F.struct(
        out[0].cast("int").alias("cef_version"),
        *[_unescape(v).alias(n)
          for v, n in zip(out[1:], CEF_HEADER_FIELDS[1:])],
    )


def _ext_string(line: Column) -> Column:
    """The raw extension block: everything after the 7th pipe, with
    the final value's trailing whitespace trimmed (crlf/padded
    vectors — the rtrim happens once on the block, which preserves
    interior trailing spaces of non-final values)."""
    ext = F.when(line.rlike(_HEADER_RE),
                 F.regexp_extract(line, _HEADER_RE, 8))
    return F.regexp_replace(ext, "[ \t\r\n]+$", "")


def cef_pairs(line: Column) -> Column:
    """``array<struct<key,value>>`` of well-formed extension pairs, in
    message order, escapes decoded, malformed fields dropped (the
    reference drops them and records an error; counters ride the
    router's error path here). Duplicates are NOT resolved — see
    :func:`cef_get` / :func:`cef_extensions` for last-wins."""
    marked = F.regexp_replace(_ext_string(line),
                              "( )(" + _KEY + ")=", _SEP + "$2=")
    pieces = F.split(marked, _SEP)
    key = lambda p: F.regexp_extract(p, "^(" + _KEY + ")=", 1)
    rawv = lambda p: F.regexp_replace(p, "^" + _KEY + "=", "")
    good = F.filter(
        pieces,
        lambda p: (key(p) != "") & rawv(p).rlike(_VALID_VALUE))
    return F.transform(
        good,
        lambda p: F.struct(key(p).alias("key"),
                           _unescape(rawv(p)).alias("value")))


def cef_get(line: Column, key: str) -> Column:
    """Value of extension ``key`` (last occurrence wins, matching the
    reference's map overwrite — cef.go:96-101); null when absent or
    malformed."""
    hits = F.filter(cef_pairs(line), lambda p: p["key"] == F.lit(key))
    # try_: ANSI mode (Spark 4 default) errors on out-of-bounds
    return F.try_element_at(hits, F.lit(-1))["value"]


def cef_extensions(line: Column) -> Column:
    """All extensions as ``map<string,string>`` with last-wins
    duplicate resolution (bounded O(n²) positional filter — no
    mapKeyDedupPolicy dependence, pure codegen)."""
    pairs = cef_pairs(line)
    n = F.size(pairs)
    last = F.filter(
        pairs,
        lambda p, i: ~F.exists(
            F.slice(pairs, i + F.lit(2), n),
            lambda q: q["key"] == p["key"]))
    return F.map_from_entries(last)


def decode_cef(df: DataFrame, field: str = "message",
               target_field: str = "cef",
               keys: Optional[Sequence[str]] = None) -> DataFrame:
    """DataFrame form of the x-pack ``decode_cef`` processor
    (``decode_cef.go:99-187``): adds ``target_field`` (header struct),
    ``{target_field}_ext`` (extensions map) and, when ``keys`` is
    given, one ``{target_field}_{key}`` string column per requested
    extension — the projection form that lets Catalyst prune the map
    build entirely when only named keys are used."""
    line = F.col(field)
    out = df.withColumn(target_field, cef_header(line))
    if keys is None:
        return out.withColumn(f"{target_field}_ext",
                              cef_extensions(line))
    for k in keys:
        out = out.withColumn(f"{target_field}_{k}", cef_get(line, k))
    return out


def kv_get(col: Column, key: str) -> Column:
    """Logstash-style key/value extraction for space-separated
    ``key=value`` / ``key="quoted value"`` logs (the ``kv`` filter
    shape; distinct from CEF, whose values are unquoted and
    space-spanning). Double-quoted values may contain spaces and
    ``\\"`` escapes; unquoted values end at the next space. Last
    occurrence wins. Pure codegen, RE2∩Java-safe."""
    pat = ('(?:^|[ ])' + key
           + '=("(?:\\\\.|[^"\\\\])*"|[^ ]*)')
    all_vals = F.regexp_extract_all(col, F.lit(pat), F.lit(1))
    v = F.try_element_at(all_vals, F.lit(-1))
    quoted = v.rlike('^".*"$')
    body = v.substr(F.lit(2), F.greatest(F.length(v) - 2, F.lit(0)))
    # one pass \x → x pairs escapes left-to-right (\\" is an escaped
    # backslash followed by the terminator, not an escaped quote)
    unq = F.regexp_replace(body, r"\\(.)", "$1")
    return F.when(quoted, unq).otherwise(v)
