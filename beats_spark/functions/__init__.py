from .multiline import multiline_join_col, multiline_over_rows, segment_lines
from .grok import Grok, grok_extract, GROK_PATTERNS
from .syslog import parse_syslog_rfc3164, parse_syslog_rfc5424, parse_syslog
from .readers import (
    include_lines, exclude_lines, limit_message, strip_newline, split_lines,
)
from .parsers import compile_parsers, parse_container, parse_ndjson

__all__ = [
    "multiline_join_col", "multiline_over_rows", "segment_lines",
    "Grok", "grok_extract", "GROK_PATTERNS",
    "parse_syslog_rfc3164", "parse_syslog_rfc5424", "parse_syslog",
    "include_lines", "exclude_lines", "limit_message", "strip_newline",
    "split_lines",
    "compile_parsers", "parse_container", "parse_ndjson",
]
