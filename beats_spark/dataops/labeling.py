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

__all__ = ["cohen_kappa", "lf_summary", "weak_label_vote"]

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


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa between two labelers — inter-annotator agreement
    corrected for chance, the first number a labeling effort reports
    (Cohen 1960; Landis & Koch's 0.6/0.8 rule-of-thumb bands). One
    row out: ``(n, po_micro, pe_micro, kappa_micro)`` in the repo's
    exact integer micro-units:

    - ``po_micro = 10^6 · agreements div n`` (observed agreement);
    - ``pe_micro = Σ_c n_a(c)·n_b(c) · 10^6 div n²`` (chance
      agreement from the two raters' marginals, products in
      decimal(38,0) — n² at 10^12 rows is 10^24, fine);
    - ``kappa_micro = (po_micro − pe_micro) · 10^6 div (10^6 −
      pe_micro)`` — NULL when ``pe_micro = 10^6`` (a constant pair of
      raters has no chance-corrected signal), matching the undefined
      0/0 in the real-valued formula.

    Rows where either label is NULL (abstains) are excluded first —
    kappa is defined over co-labeled items.

    Plan: one global partial-combining aggregate for (n, agreements),
    two label-marginal aggregates (≤ |label space| rows each) joined
    broadcast on the class, and a scalar combine — the corpus crosses
    one exchange as (label_a, label_b) pairs, nothing wider.
    """
    base = (df.select(F.col(rater_a).alias("__a"),
                      F.col(rater_b).alias("__b"))
            .filter(F.col("__a").isNotNull()
                    & F.col("__b").isNotNull()))
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__a") == F.col("__b")).cast("long"))
         .cast("long").alias("__agree"))
    ma = base.groupBy(F.col("__a").alias("__cls")) \
             .agg(F.count(F.lit(1)).alias("__na"))
    mb = base.groupBy(F.col("__b").alias("__cls")) \
             .agg(F.count(F.lit(1)).alias("__nb"))
    d38 = "decimal(38,0)"
    pe_num = (ma.join(F.broadcast(mb), "__cls")
              .agg(F.sum(F.expr(
                  f"cast(__na as {d38}) * cast(__nb as {d38})"))
                  .cast(d38).alias("__pe_num")))
    j = tot.join(F.broadcast(pe_num))
    po = F.expr("1000000 * __agree DIV n")
    pe = F.expr(f"__pe_num * 1000000 DIV "
                f"(cast(n as {d38}) * cast(n as {d38}))")
    out = (j.withColumn("po_micro", po.cast("long"))
           .withColumn("pe_micro", pe.cast("long"))
           .withColumn(
               "kappa_micro",
               F.when(F.col("pe_micro") < 1_000_000,
                      F.expr("(po_micro - pe_micro) * 1000000 DIV "
                             "(1000000 - pe_micro)"))
               .cast("long")))
    return out.select("n", "po_micro", "pe_micro", "kappa_micro")
