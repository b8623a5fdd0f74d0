"""Data-governance primitives: k-anonymity suppression and
deletion-request (right-to-be-forgotten) propagation.

Both are join-shaped, not scan-shaped, so they hold at 100 TB: the
group-size census shuffles only the quasi-identifier columns (+ one
long), and the row-level verdict is a SEMI/ANTI join that AQE turns
into a broadcast probe whenever the violating-group / tombstone side
is small — the common case (suppression lists and deletion requests
are tiny next to the corpus).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["dp_counts", "k_anonymize", "k_violations", "l_diversify", "l_violations", "purge_ids"]


def _census(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("n")))


def k_anonymize(df: DataFrame, quasi_cols: Sequence[str],
                k: int) -> DataFrame:
    """Suppression-mode k-anonymity (Sweeney): keep only rows whose
    quasi-identifier combination occurs in ≥ ``k`` rows — every
    surviving record hides among at least k-1 others. Generalization
    (coarsening the QI columns) is the caller's move: pre-bucket the
    columns (hour-of-day, value decile, ZIP prefix) and re-run until
    the retention is acceptable.

    Plan: one partial-combining census on the QI key (only QI columns
    + a long cross that exchange), then a LEFT SEMI join of the corpus
    against qualifying groups."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ok = _census(df, quasi_cols).filter(F.col("n") >= k) \
                                .select(*quasi_cols)
    return df.join(ok, list(quasi_cols), "left_semi")


def k_violations(df: DataFrame, quasi_cols: Sequence[str],
                 k: int) -> DataFrame:
    """The audit view: quasi-identifier groups that violate
    k-anonymity, with their sizes — what a privacy review reads before
    choosing between suppression and further generalization."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return _census(df, quasi_cols).filter(F.col("n") < k)


def purge_ids(df: DataFrame, tombstones: DataFrame,
              id_col: str) -> DataFrame:
    """Deletion-request propagation: drop every row whose ``id_col``
    appears in ``tombstones`` (same column name). LEFT ANTI join —
    tombstone sets are small, so the probe broadcasts; the corpus is
    never shuffled. Run once per derived table; the snapshot catalog
    records the purge as a new snapshot (no in-place mutation)."""
    return df.join(tombstones.select(id_col).distinct(),
                   [id_col], "left_anti")


def dp_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon_micro: int = 1_000_000,
    seed: int = 42,
) -> DataFrame:
    """Differential-privacy-shaped noisy group counts: per group,
    ``count + Laplace(1/ε)`` — the sensitivity-1 count release every
    privacy-preserving analytics surface starts from.

    The noise here is SEEDED, not secret: the Laplace draw comes from
    an inverse-CDF over an md5-derived uniform of (group key, seed),
    so results are reproducible and oracle-checkable — the same
    stub-seam pattern as the multimodal decoders. A REAL deployment
    must swap in secure randomness (a seeded release is NOT
    differentially private: the noise is recomputable by anyone who
    knows the seed); the plumbing — sensitivity-bounded census,
    noise column, micro-unit release — is what this operator ships.

    Noise spec (both engines compute THIS): ``u = v/2^60 − ½`` with
    ``v`` the first 15 md5 hex digits of ``key'|'seed``;
    ``noise = −b·sign(u)·ln(1−2|u|)``, ``b = 10^6/epsilon_micro``;
    release ``noisy_micro = 10^6·n + round(10^6·noise)``.

    Plan: ONE partial-combining census on the group key (the only
    exchange), noise applied as a map-side projection on the
    aggregated (small) table."""
    if epsilon_micro < 1:
        raise ValueError(
            f"epsilon_micro must be >= 1, got {epsilon_micro}")
    census = _census(df, group_cols)
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in group_cols],
        F.lit(f"seed{seed}"))
    v = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    u = v / F.lit(float(1 << 60)) - F.lit(0.5)
    b = 1_000_000.0 / float(epsilon_micro)
    noise = (-F.lit(b) * F.signum(u)
             * F.log(F.lit(1.0) - 2.0 * F.abs(u)))
    return census.select(
        *group_cols, F.col("n"),
        (F.col("n") * 1_000_000
         + F.round(F.lit(1e6) * noise).cast("long"))
        .cast("long").alias("noisy_micro"))


def l_violations(df: DataFrame, quasi_cols: Sequence[str],
                 sensitive_col: str, l: int) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006): the
    quasi-identifier groups whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — k-anonymity's blind spot, where a
    group is large enough to hide in but everyone in it shares the
    secret (the homogeneity attack). Output: ``(quasi_cols..., n,
    n_sensitive)`` for violating groups.

    Plan: one partial-combining exchange on (QI..., sensitive) — the
    distinct-count shuffle carries QI columns + the sensitive value,
    never full rows — then a second tiny aggregate over the distinct
    pairs. This is exact distinct counting; for a profiling-grade
    answer at 10^12 rows use the sketch layer instead."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    qs = list(quasi_cols)
    return (df.groupBy(*qs)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_distinct(F.col(sensitive_col))
                 .alias("n_sensitive"))
            .filter(F.col("n_sensitive") < l))


def l_diversify(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, l: int) -> DataFrame:
    """Suppression-mode l-diversity: keep only rows whose QI group
    carries at least ``l`` distinct sensitive values. The companion
    of :func:`k_anonymize` — run AFTER it (a group can be large yet
    homogeneous). Same plan shape: distinct census on the QI key +
    LEFT SEMI join back; the corpus itself is never shuffled on the
    sensitive value."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    qs = list(quasi_cols)
    ok = (df.groupBy(*qs)
          .agg(F.count_distinct(F.col(sensitive_col)).alias("__d"))
          .filter(F.col("__d") >= l)
          .select(*qs))
    return df.join(ok, qs, "left_semi")
