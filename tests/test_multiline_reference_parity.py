"""Multiline joiner parity with the reference's own test cases
(re-expressed from ``libbeat/reader/multiline/multiline_test.go``):
each case concatenates the expected events into a line stream and
asserts our segmentation reproduces the same events (the Go harness
compares content right-trimmed of ``\\r\\n ``)."""

import pytest

from beats_spark.functions.multiline import segment_lines


def run_case(expected_events, **cfg):
    stream = "".join(expected_events)
    lines = stream.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    got = segment_lines(lines, **cfg)
    want = [e.rstrip("\r\n ") for e in expected_events]
    assert got == want


# multiline_test.go:48 TestMultilineAfterOK
def test_after_ok():
    run_case(["line1\n  line1.1\n  line1.2\n",
              "line2\n  line2.1\n  line2.2\n"],
             pattern=r"^[ \t] +", match="after")


# multiline_test.go:62 TestMultilineBeforeOK
def test_before_ok():
    run_case(["line1 \\\nline1.1 \\\nline1.2\n",
              "line2 \\\nline2.1 \\\nline2.2\n"],
             pattern=r"\\$", match="before")


# multiline_test.go:77 TestMultilineAfterNegateOK
def test_after_negate_ok():
    run_case(["-line1\n  - line1.1\n  - line1.2\n",
              "-line2\n  - line2.1\n  - line2.2\n"],
             pattern=r"^-", negate=True, match="after")


# multiline_test.go:93 TestMultilineBeforeNegateOK
def test_before_negate_ok():
    run_case(["line1\nline1.1\nline1.2;\n",
              "line2\nline2.1\nline2.2;\n"],
             pattern=r";$", negate=True, match="before")


# multiline_test.go:109 TestMultilineAfterNegateOKFlushPattern
def test_after_negate_flush_pattern():
    run_case(["EventStart\nEventId: 1\nEventEnd\n",
              "OtherThingInBetween\n",
              "EventStart\nEventId: 2\nEventEnd\n"],
             pattern=r"EventStart", negate=True, match="after",
             flush_pattern=r"EventEnd")


# multiline_test.go:128 …WhereTheFirstLinesDosentMatchTheStartPattern
def test_after_negate_flush_pattern_first_lines_unmatched():
    run_case(["StartLineThatDosentMatchTheEvent\nOtherThingInBetween\n",
              "EventStart\nEventId: 2\nEventEnd\n",
              "EventStart\nEventId: 3\nEventEnd\n"],
             pattern=r"EventStart", negate=True, match="after",
             flush_pattern=r"EventEnd")


# multiline_test.go:147 TestMultilineBeforeNegateOKWithEmptyLine
def test_before_negate_with_empty_line():
    run_case(["line1\n\n\nline1.2;\n",
              "line2\nline2.1\nline2.2;\n"],
             pattern=r";$", negate=True, match="before")


# multiline_test.go:199 TestMultilineCount
@pytest.mark.parametrize("count,events", [
    (2, ["line1\n line1.1\n", "line2\n line2.1\n"]),
    (4, ["line1\n line1.1\nline2\n line2.1\n",
         "line3\n line3.1\nline4\n line4.1\n"]),
    (1, ["line1\n", "line1.1\n", "line2\n", "line2.1\n",
         "line3\n", "line3.1\n", "line4\n", "line4.1\n"]),
])
def test_count_mode(count, events):
    run_case(events, mode="count", count_lines=count)


# multiline_test.go:246 TestMultilineWhilePattern
def test_while_pattern():
    run_case(["{line1\n{line1.1\n", "not matched line\n",
              "{line2\n{line2.1\n"],
             mode="while_pattern", pattern=r"^{")


def test_while_pattern_negate():
    run_case(["{line1\n", "panic:\n~stacktrace~\n", "{line2\n"],
             mode="while_pattern", pattern=r"^{", negate=True)


# multiline_test.go:246 (truncated leg): max_lines truncates the event
def test_while_pattern_truncated():
    lines = ["{line1", "{line1.1", "{line1.2"]
    got = segment_lines(lines, mode="while_pattern", pattern=r"^{",
                        max_lines=2)
    assert got == ["{line1\n{line1.1"]


# pattern.go:209-220 — the flush check precedes the continuation
# predicate: a flush-matching line joins the CURRENT event even when
# the predicate says it is not a continuation, and the next line
# starts a new event.
def test_flush_line_joins_even_when_not_a_continuation():
    got = segment_lines(
        ["BEGIN tx", " step 1", "COMMIT", "BEGIN tx2", " step 1",
         "COMMIT", "orphan"],
        pattern=r"^\s", match="after", flush_pattern=r"^COMMIT")
    assert got == ["BEGIN tx\n step 1\nCOMMIT",
                   "BEGIN tx2\n step 1\nCOMMIT",
                   "orphan"]


def test_flush_line_joins_window_form(spark):
    from beats_spark.functions.multiline import multiline_over_rows
    rows = [("a", i + 1, ln) for i, ln in enumerate(
        ["BEGIN tx", " step 1", "COMMIT", "BEGIN tx2", " step 1",
         "COMMIT", "orphan"])]
    df = spark.createDataFrame(rows, "path string, line_no long, line string")
    out = multiline_over_rows(
        df, line_col="line", partition_cols=("path",),
        order_col="line_no", pattern=r"^\s", match="after",
        flush_pattern=r"^COMMIT")
    got = {r["line_no"]: r["message"] for r in out.collect()}
    assert got == {1: "BEGIN tx\n step 1\nCOMMIT",
                   4: "BEGIN tx2\n step 1\nCOMMIT",
                   7: "orphan"}


def test_consecutive_flush_lines_each_emit(spark):
    # buffer just flushed + another flush line → its own 1-line event
    got = segment_lines(["COMMIT", "COMMIT", "x"],
                        pattern=r"^\s", match="after",
                        flush_pattern=r"^COMMIT")
    assert got == ["COMMIT", "COMMIT", "x"]
