"""Connected components over a pair list — the cluster-resolution
step of near-duplicate dedup.

The pairwise MinHash/SimHash stages emit edges (id_a, id_b). Dropping
"any doc that loses one pairing" (the simple rule in
:func:`beats_spark.dataops.curate.curate`) over-drops on chains
(a~b, b~c ⇒ c dropped even though a≁c); FineWeb/Gopher-style pipelines
resolve the CLUSTER first — one survivor per connected component.

Spark-first algorithm: iterative minimum-label propagation.

    L0(v) = v
    Li+1(v) = min(Li(v), min{Li(u) : (u,v) an edge})

Each round is one join + one min-aggregation; the loop runs until no
label changes (O(component diameter) rounds — near-dup clusters are
shallow, so typically 2-4). Per round the label frame is
``localCheckpoint``-ed: without it the lineage doubles every
iteration and the plan explodes long before the data does. This is
the standard map-reduce CC (the large-star/small-star variant of
Kiveris et al. trades more shuffle volume per round for fewer rounds;
min-label is the right default at shallow diameters).

Determinism: the component id is the MINIMUM member id — stable
across partitionings and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "keep_min_per_component"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    comp_col: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) pair list → one row per node with its component id
    (the minimum node id in the component).

    ``nodes`` optionally supplies the full node universe (one column
    named ``id_col``); nodes with no edges become singleton
    components. Without it, only nodes appearing in an edge are
    labeled. Raises if ``max_iter`` rounds don't converge (a
    pathological diameter — switch to star-contraction before raising
    the bound)."""
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v")))
           .distinct())
    # materialize the edge list ONCE — it is joined every round, and
    # an un-checkpointed pair frame (often itself an expensive
    # similarity join) would recompute per iteration
    sym = sym.localCheckpoint(eager=True)
    endpoints = sym.select(F.col("u").alias("id")).distinct()
    if nodes is not None:
        # ALWAYS include the edge endpoints: a universe missing them
        # would otherwise converge prematurely (a label reaching an
        # unlisted node has no previous label to compare against) and
        # return a silently partial labeling
        universe = (nodes.select(F.col(id_col).alias("id"))
                    .unionByName(endpoints).distinct())
    else:
        universe = endpoints
    labels = universe.select("id", F.col("id").alias("comp"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # push every node's label to its neighbors, keep the min; the
        # node's own previous label rides the same aggregation (as
        # min(old) — exactly one non-null per id), so convergence is a
        # cheap filter over the checkpointed result, not another join
        comp_type = dict(labels.dtypes)["comp"]
        prop = (sym.join(labels.withColumnRenamed("id", "u"), "u")
                   .select(F.col("v").alias("id"), "comp",
                           F.lit(None).cast(comp_type).alias("old")))
        own = labels.select("id", "comp", F.col("comp").alias("old"))
        agg = (own.unionByName(prop).groupBy("id")
               .agg(F.min("comp").alias("comp"),
                    F.min("old").alias("old")))
        agg = agg.localCheckpoint(eager=True)
        changed = agg.filter(F.col("comp") < F.col("old")).count()
        labels = agg.select("id", "comp")
        if changed == 0:
            return labels.select(F.col("id").alias(id_col),
                                 F.col("comp").alias(comp_col))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def keep_min_per_component(
    labeled: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
) -> DataFrame:
    """Survivor set: the (deterministic) minimum id of every
    component — by construction that IS the component id."""
    return (labeled.filter(F.col(id_col) == F.col(comp_col))
                   .select(id_col))
