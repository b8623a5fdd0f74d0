"""End-to-end document curation: the training-data shape of the
shipper pipeline — filter → dedup → near-dedup → select, with
per-stage counters (the FineWeb/Gopher-style funnel).

Every stage is the engine's own operator (quality_score, exact dedup
window, MinHash+LSH pairs) composed lazily; one action drives the
whole funnel, and the stage metrics ride the same cached frame instead
of re-running the plan per stage. All decisions are deterministic
(score thresholds on exact arithmetic, min-id winners), so the entire
funnel is reproducible by a SQL oracle — the curated SET is checkable
row-for-row, not just counted.

Scale notes: stage order puts the cheap map-side quality filter before
anything that shuffles; exact dedup shuffles only (digest, id); the
near-dup stage runs on the already-thinned survivors and its LSH
candidate join is the only quadratic-risk step, bounded by banding.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import minhash_lsh_pairs
from .textstats import text_stats_arrow

__all__ = ["curate", "CurationResult"]


@dataclass
class CurationResult:
    kept: DataFrame
    metrics: Dict[str, int] = field(default_factory=dict)


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.65,
    langs: Optional[Sequence[str]] = None,
    near_dup_jaccard: float = 0.12,
    minhash_hashes: int = 16,
    minhash_bands: int = 4,
    with_metrics: bool = True,
) -> CurationResult:
    """quality filter → language select → exact dedup → MinHash
    near-dedup. Near-dup resolution keeps the SMALLER id of every
    verified pair (deterministic; chains resolve to "drop anything
    that loses at least one pairing")."""
    metrics: Dict[str, int] = {}
    if with_metrics:
        metrics["docs.total"] = docs.count()

    # 1. quality (map-side, no shuffle; fused Arrow kernel)
    scored = docs.withColumn(
        "__q", text_stats_arrow(text_col)["quality"])
    kept = scored.filter(F.col("__q") >= min_quality)
    if with_metrics:
        metrics["docs.quality_kept"] = kept.count()

    # 2. language selection (map-side)
    if langs:
        kept = kept.filter(F.col(lang_col).isin(*langs))
        if with_metrics:
            metrics["docs.lang_kept"] = kept.count()

    # 3. exact dedup — shuffle carries (digest, id) only
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    kept = (kept.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))
    if with_metrics:
        metrics["docs.exact_kept"] = kept.count()

    # 4. near-dedup: verified MinHash pairs above the threshold; every
    # pair's larger id is dropped
    pairs = minhash_lsh_pairs(
        kept, id_col=id_col, text_col=text_col,
        num_hashes=minhash_hashes, bands=minhash_bands,
        threshold=near_dup_jaccard)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = kept.join(losers, id_col, "left_anti")
    if with_metrics:
        metrics["docs.near_dup_kept"] = kept.count()
        metrics["docs.dropped"] = (metrics["docs.total"]
                                   - metrics["docs.near_dup_kept"])

    return CurationResult(kept=kept.drop("__q"), metrics=metrics)
