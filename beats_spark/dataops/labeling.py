"""Weak-supervision labeling: combine noisy rule votes into training
labels, and audit the rules themselves.

Programmatic labeling (Snorkel: Ratner et al., VLDB 2018) is how
classifier training sets get built at corpus scale: dozens of cheap
labeling functions (keyword rules, source heuristics, model votes)
each label SOME rows, abstain elsewhere, and a combiner resolves
their votes. The two operators every such pipeline runs:

- :func:`weak_label_vote` — per-row majority vote over the rule
  columns with an explicit abstain value; ties abstain rather than
  guess, and the margin/confidence come out as exact integer
  micro-units (cross-engine hashable — no float vote fractions).
- :func:`lf_summary` — the standard labeling-function analysis table
  (coverage / overlap / conflict per rule) used to debug and prune
  rule sets before fitting anything fancier.

Scale design (100 TB): voting is a pure per-row projection — zero
shuffle, whole-stage codegen; vote arrays are staged as real columns
before any lambda touches them (the repo's measured HOF-re-evaluation
lesson), and every inner loop is bounded by the RULE count (tens),
never data size. ``lf_summary`` is ONE global aggregate: per-rule
sums ride a single partial-combining exchange carrying r×3 longs
per map task; the per-rule unpivot happens on the aggregated row.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["lf_summary", "weak_label_vote"]

_MICRO = 1_000_000


def _check_rules(df: DataFrame, rule_cols: Sequence[str]) -> None:
    if not rule_cols:
        raise ValueError("rule_cols must be non-empty")
    if len(set(rule_cols)) != len(rule_cols):
        raise ValueError(f"duplicate rule_cols: {sorted(rule_cols)}")
    missing = [c for c in rule_cols if c not in df.columns]
    if missing:
        raise ValueError(f"rule_cols not in DataFrame: {missing}")


def weak_label_vote(
    df: DataFrame,
    rule_cols: Sequence[str],
    abstain: int = -1,
    out_col: str = "label",
) -> DataFrame:
    """Majority-vote combiner: every input column plus

    - ``n_votes`` — non-abstain votes on the row (bigint);
    - ``out_col`` — the winning label (int), NULL when every rule
      abstained OR the top two labels tie (a tie is a disagreement,
      not a coin flip — downstream filters on NULL keep the training
      set clean);
    - ``margin`` — top count minus runner-up count (bigint, 0 on
      tie/abstain);
    - ``confidence_micro`` — ``top_count * 1e6 // n_votes`` (bigint,
      exact integer division; NULL when no votes).

    NULL rule values count as abstain (an unevaluated rule is an
    abstaining rule). Labels may be any ints except the abstain
    value. Pure projection: zero exchanges, zero Python; per-row work
    is O(rules²) with rules in the tens — data size never enters.
    """
    _check_rules(df, rule_cols)
    votes = F.array(*[
        F.coalesce(F.col(c).cast("int"), F.lit(int(abstain)))
        for c in rule_cols])
    staged = df.withColumn(
        "__nonab", F.filter(votes, lambda v: v != int(abstain)))
    nonab = F.col("__nonab")
    counts = F.transform(
        F.array_distinct(nonab),
        lambda u: F.struct(
            F.size(F.filter(nonab, lambda v: v == u)).alias("c"),
            u.alias("lab")))
    # ascending (c, lab) sort: last = winner, deterministic lab
    # tie-break inside the struct comparison; a TIE IN C alone (two
    # labels at max count) abstains below
    ranked = F.array_sort(counts)
    top = F.element_at(ranked, -1)
    second = F.when(F.size(ranked) > 1, F.element_at(ranked, -2))
    tied = F.coalesce(second["c"] == top["c"], F.lit(False))
    n_votes = F.size(nonab).cast("bigint")
    return (staged
            .withColumn("n_votes", n_votes)
            .withColumn(out_col,
                        F.when((n_votes > 0) & ~tied, top["lab"]))
            .withColumn("margin",
                        F.when(n_votes > 0,
                               top["c"] - F.coalesce(second["c"],
                                                     F.lit(0)))
                         .otherwise(F.lit(0)).cast("bigint"))
            # top_c ≤ len(rule_cols) (tens), so top_c * 1e6 is far
            # inside float-exact range; trunc == floor for these
            # non-negatives — matches DuckDB `//`
            .withColumn("confidence_micro",
                        F.when(n_votes > 0,
                               (top["c"].cast("bigint") * _MICRO)
                               / n_votes)
                         .cast("bigint"))
            .drop("__nonab"))


def lf_summary(
    df: DataFrame,
    rule_cols: Sequence[str],
    abstain: int = -1,
) -> DataFrame:
    """The Snorkel LF-analysis table, one row per rule:

    - ``coverage`` — rows where the rule votes (non-abstain);
    - ``overlaps`` — rows where it votes AND at least one other rule
      also votes;
    - ``conflicts`` — rows where it votes AND at least one other rule
      votes DIFFERENTLY;
    - the three ``*_micro`` exact integer fractions of ``n_rows``.

    This is what decides which rules to keep: high coverage + low
    conflict is signal, high conflict is noise, near-zero coverage is
    dead weight. ONE global aggregate — per-rule sums partial-combine
    map-side (r×3 longs per map task cross the exchange); the
    per-rule unpivot runs on the single aggregated row.
    """
    _check_rules(df, rule_cols)
    ab = int(abstain)
    cols = [F.coalesce(F.col(c).cast("int"), F.lit(ab))
            for c in rule_cols]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, cj in enumerate(cols):
        voted = cj != ab
        others_vote = F.lit(False)
        others_disagree = F.lit(False)
        for k, ck in enumerate(cols):
            if k == j:
                continue
            others_vote = others_vote | (ck != ab)
            others_disagree = others_disagree | ((ck != ab) & (ck != cj))
        aggs += [
            F.sum(voted.cast("long")).alias(f"__c{j}"),
            F.sum((voted & others_vote).cast("long")).alias(f"__o{j}"),
            F.sum((voted & others_disagree).cast("long"))
             .alias(f"__x{j}"),
        ]
    row = df.agg(*aggs)
    per_rule = F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"__c{j}").alias("coverage"),
                 F.col(f"__o{j}").alias("overlaps"),
                 F.col(f"__x{j}").alias("conflicts"))
        for j, name in enumerate(rule_cols)])
    ex = row.select(F.col("__n").alias("n_rows"),
                    F.explode(per_rule).alias("r"))
    flat = ex.select(
        F.col("r.rule").alias("rule"), "n_rows",
        F.col("r.coverage").alias("coverage"),
        F.col("r.overlaps").alias("overlaps"),
        F.col("r.conflicts").alias("conflicts"))
    # SQL `div`: exact integer division — a float `/` then cast
    # silently loses exactness once count * 1e6 passes 2^53, which a
    # 100 TB corpus does
    return flat.select(
        "rule", "n_rows", "coverage", "overlaps", "conflicts",
        F.expr(f"coverage * {_MICRO} div n_rows")
            .alias("coverage_micro"),
        F.expr(f"overlaps * {_MICRO} div n_rows")
            .alias("overlap_micro"),
        F.expr(f"conflicts * {_MICRO} div n_rows")
            .alias("conflict_micro"))
