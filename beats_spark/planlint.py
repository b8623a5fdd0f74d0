"""Physical-plan linting: the scale-killer audit PLANS.md does in
prose, as an executable check.

``lint_plan(df)`` inspects the planned (not executed) physical tree
and reports the patterns that break 100 TB jobs:

- ``cartesian``        CartesianProduct — all-pairs join, O(N·M).
- ``nested_loop``      BroadcastNestedLoopJoin — bounded only if the
                       broadcast side is truly small; every legitimate
                       use in this repo documents its bound.
- ``python_row_udf``   BatchEvalPython — row-at-a-time Python in the
                       plan; the hot path must use Arrow
                       (ArrowEvalPython / MapInPandas) or JVM exprs.
- ``single_partition`` Exchange SinglePartition — a global
                       sort/window/agg collapsing to ONE task; safe
                       only when the collapsed row count is bounded by
                       a parameter, not the data (the vocab_coverage /
                       zipf_fit pattern), or it is the final
                       partial-combined global aggregate.
- ``unpushed_scan``    a parquet scan with pushable filters above it
                       but ``PushedFilters: []``.

``assert_scale_safe(df)`` raises on the first two severities unless
explicitly allowed — the test-suite form; CI-grade enforcement of what
used to be prose.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

__all__ = ["lint_plan", "assert_scale_safe"]

# rule -> severity. "error" = never acceptable undocumented;
# "warn" = acceptable when bounded by a parameter (caller documents).
RULES = {
    "cartesian": "error",
    "python_row_udf": "error",
    # warn, not error: the catalog's dominant NLJ shape is
    # join(broadcast(<one-row aggregate>)) — a scalar attach, bounded
    # by construction — and a genuinely oversized broadcast side fails
    # LOUDLY (driver OOM / broadcast timeout), never silently
    # quadratic. The silent killer is CartesianProduct, which stays
    # error.
    "nested_loop": "warn",
    "single_partition": "warn",
    "unpushed_scan": "warn",
}


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame) -> List[Dict[str, str]]:
    """Return findings ``[{rule, severity, evidence}, ...]`` for the
    DataFrame's physical plan (planning only — nothing executes)."""
    plan = _plan_string(df)
    findings: List[Dict[str, str]] = []

    def hit(rule: str, evidence: str):
        findings.append({"rule": rule, "severity": RULES[rule],
                         "evidence": evidence.strip()[:200]})

    for line in plan.splitlines():
        if "CartesianProduct" in line:
            hit("cartesian", line)
        elif "BroadcastNestedLoopJoin" in line:
            hit("nested_loop", line)
        elif "BatchEvalPython" in line:
            hit("python_row_udf", line)
        elif re.search(r"Exchange SinglePartition", line):
            hit("single_partition", line)

    # a scan advertising zero pushed filters while a Filter node sits
    # somewhere above it in the same plan
    if "PushedFilters: []" in plan and re.search(
            r"^\s*[+:*]*\s*\(?\d*\)?\s*Filter ", plan, re.M):
        for line in plan.splitlines():
            if "PushedFilters: []" in line:
                hit("unpushed_scan", line)
                break
    return findings


def assert_scale_safe(
    df: DataFrame,
    allow: Sequence[str] = (),
    label: Optional[str] = None,
) -> List[Dict[str, str]]:
    """Raise ``AssertionError`` if the plan contains any error-severity
    finding whose rule is not in ``allow``; returns all findings for
    further inspection. ``allow`` entries must name their
    justification in the calling code — an allowance without a
    documented bound is exactly the silent cliff this exists to
    catch."""
    findings = lint_plan(df)
    bad = [f for f in findings
           if f["severity"] == "error" and f["rule"] not in allow]
    if bad:
        who = f" [{label}]" if label else ""
        raise AssertionError(
            f"scale-unsafe plan{who}: "
            + "; ".join(f"{f['rule']}: {f['evidence']}" for f in bad))
    return findings
