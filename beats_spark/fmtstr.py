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


def compile_fmtstr(template: str, timestamp_field: str = "@timestamp") -> Column:
    """Template → string Column. Missing fields without a default render
    the whole template to null (the reference errors per event and the
    selector falls through to the next rule — null gives the same
    when-chain fall-through)."""
    pieces = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos:m.start()]))
        token = m.group(1)
        if token.startswith("+"):
            # Joda-ish date pattern over the event timestamp; the subset
            # (yyyy MM dd HH mm ss) is valid for date_format too.
            pieces.append(F.date_format(F.col(timestamp_field), token[1:]))
        else:
            default: Optional[str] = None
            ref = token
            if ":" in token:
                ref, default = token.split(":", 1)
            path = _field_path(ref) if _FIELD_RE.match(ref) else ref
            col = F.col(path).cast("string")
            pieces.append(F.coalesce(col, F.lit(default)) if default is not None else col)
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)
