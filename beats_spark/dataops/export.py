"""End-to-end training-set export: the composition the individual
dataops operators exist for.

    curate (quality + repetition gates + dedup, cluster-resolved)
      → hash split keyed on the NEAR-DUP CLUSTER id (no near-duplicate
        ever straddles the train/eval boundary)
      → greedy sequence packing per (split, shard)
      → one partitioned parquet write

Scale notes: curation's shuffles are the dedup joins (bounded — see
curate/dedup docstrings); the split assignment is a map-side
expression; packing is a per-shard Arrow scan; and the final write is
``partitionBy(split)`` — partition-local, no extra shuffle. The
cluster labels come from connected components over the SAME verified
MinHash pairs the funnel used, so "one survivor per cluster" and
"whole cluster on one side of the split" are decided by one pair
graph.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

from pyspark.sql import DataFrame, functions as F

from .components import connected_components
from .curate import CurationResult, curate
from .dedup import minhash_lsh_pairs
from .packing import pack_greedy
from .splits import hash_split

__all__ = ["export_training_set"]


def export_training_set(
    docs: DataFrame,
    out_dir: str,
    fractions: Optional[Mapping[str, float]] = None,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    tokens_col: str = "n_tokens",
    min_quality: float = 0.65,
    near_dup_jaccard: float = 0.12,
    **curate_kwargs,
) -> Dict[str, int]:
    """Run the funnel, split leak-free, pack, and write
    ``out_dir/split=<name>/``. Returns per-split row counts.

    The split key is the near-dup COMPONENT id over the curated
    survivors (survivor universe — a pair between two already-dropped
    docs can't leak anything), so every document that is a near-dup
    of a training document is itself in train."""
    fractions = dict(fractions or
                     {"train": 0.9, "val": 0.05, "test": 0.05})

    res: CurationResult = curate(
        docs, id_col=id_col, text_col=text_col, lang_col=lang_col,
        min_quality=min_quality, near_dup_jaccard=near_dup_jaccard,
        with_metrics=False, near_dup_resolution="components",
        **curate_kwargs)
    kept = res.kept

    # cluster labels over the survivors (kept docs are one-per-
    # component already; singletons label themselves)
    pairs = minhash_lsh_pairs(
        kept, id_col=id_col, text_col=text_col,
        threshold=near_dup_jaccard)
    labeled = connected_components(
        pairs, nodes=kept.select(id_col), id_col=id_col,
        comp_col="__cluster")
    kept = kept.join(labeled, id_col)

    split = hash_split(kept, "__cluster", fractions)

    if tokens_col not in split.columns:
        from .textstats import token_count
        split = split.withColumn(
            tokens_col, token_count(F.col(text_col)).cast("bigint"))
    packed = pack_greedy(split, budget=budget, tokens_col=tokens_col,
                         order_col=id_col, shard_col="split")

    packed.write.mode("overwrite").partitionBy("split") \
        .parquet(out_dir)

    spark = docs.sparkSession
    out = spark.read.parquet(out_dir)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    return counts
