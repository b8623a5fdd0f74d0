"""Event format strings → Columns.

The reference renders ``%{[field]}``-style templates per event
(``libbeat/common/fmtstr/formatevents.go:35-43``): ``%{[a][b]}`` ≡
``%{[a.b]}`` nested access, ``%{[x]:fallback}`` default values,
``%{+yyyy.MM.dd}`` timestamp patterns against ``@timestamp``. Used by
output selectors (``outil/select.go:194-207``) and
``add_formatted_index``.

Compiled here to ``F.concat`` of literal/`col`/`date_format` pieces —
pure Catalyst, so a template of constants folds to a constant exactly
like the reference's ``IsConst`` fast path (``select.go:96-104``).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, functions as F

__all__ = ["compile_fmtstr", "is_const_fmtstr"]

_TOKEN_RE = re.compile(r"%\{([^}]*)\}")
_FIELD_RE = re.compile(r"^(\[[^\]]+\])+$")


def _field_path(ref: str) -> str:
    """``[a][b]`` → ``a.b``; ``[a.b]`` stays ``a.b`` (fmtstr accepts both)."""
    parts = re.findall(r"\[([^\]]+)\]", ref)
    return ".".join(parts)


def is_const_fmtstr(template: str) -> bool:
    return _TOKEN_RE.search(template) is None


def compile_fmtstr(template: str, timestamp_field: str = "@timestamp",
                   columns: "Optional[list]" = None) -> Column:
    """Template → string Column. Missing fields without a default render
    the whole template to null (the reference errors per event and the
    selector falls through to the next rule — null gives the same
    when-chain fall-through). With ``columns`` (the frame's column
    list), a reference to an ABSENT column compiles to null instead of
    an analysis error — so ``%{[gone]:fallback}`` degrades to the
    fallback like the reference's missing-key default."""
    pieces = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos:m.start()]))
        token = m.group(1)
        if token.startswith("+"):
            # Joda pattern over the event timestamp. Joda's Y is
            # year-of-era (≡ y), but Spark's Y is WEEK-based year —
            # wrong at year boundaries — so map it unless an actual
            # week field is present (the common beats idiom
            # %{+YYYY.MM.dd} must mean the calendar year).
            pat = token[1:]
            if "w" not in pat and "W" not in pat:
                pat = pat.replace("Y", "y")
            pieces.append(F.date_format(F.col(timestamp_field), pat))
        else:
            default: Optional[str] = None
            ref = token
            if ":" in token:
                ref, default = token.split(":", 1)
            path = _field_path(ref) if _FIELD_RE.match(ref) else ref
            if path == "@timestamp":
                # the literal event-timestamp reference renders in
                # ISO8601 with millis + Z (formatevents_test.go:
                # "2015-05-01T20:12:34.000Z"), not the engine's
                # default timestamp-to-string cast; it reads the
                # configured timestamp column
                col = F.date_format(F.col(timestamp_field),
                                    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
            else:
                # engine-wide flat-column convention (processors/core.py):
                # a beats nested path a.b is the column a_b
                name = path.replace(".", "_")
                if columns is not None and name not in columns:
                    col = F.lit(None).cast("string")
                else:
                    col = F.col(name).cast("string")
            pieces.append(F.coalesce(col, F.lit(default)) if default is not None else col)
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)
