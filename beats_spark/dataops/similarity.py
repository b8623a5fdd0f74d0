"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full corpus, dot products computed JVM-side with
``zip_with``/``aggregate`` (no Python in the hot path), top-k via a
per-query ``row_number`` window.

Scale path: random-hyperplane LSH — deterministic ±1 hyperplanes
derived from md5 parity, signature computed map-side, candidates
restricted to matching buckets (optionally with multi-probe via band
prefixes). At 10^9+ vectors the bucket join replaces the corpus-wide
cross product; brute force stays as the rerank step inside each
bucket. An IVF variant would swap the hash for learned centroids; the
plumbing (bucket column → co-partitioned join → rerank) is identical.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "bitext_margin_mine",
    "dot", "l2_norm", "normalize", "cosine_similarity", "cosine_topk",
    "cosine_topk_blocked", "hard_negatives", "lsh_signature", "lsh_cosine_topk",
    "ivf_assign", "ivf_cosine_topk", "kmeans_fit",
    "lsh_multiprobe_topk", "pq_topk", "random_projection", "rrf_fuse",
    "semdedup",
]


def _dbl(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision, index order (matches DuckDB
    ``list_dot_product`` on DOUBLE[])."""
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0),
                              lambda acc, v: acc + v * v))


def normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(_dbl(a), lambda v: v / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` is broadcast (it is the small side by construction); the
    corpus is scanned once, never shuffled — the only shuffle is the
    per-query top-k window over k·|queries| candidate rows after a
    map-side ``row_number`` is impossible, so we filter early is not
    needed at this scale. Self-matches (same id) are excluded.
    Deterministic order: score desc, neighbor id asc.
    """
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    scored = (c.crossJoin(F.broadcast(q))
               .filter(F.col("neighbor_id") != F.col(query_id_col))
               .select(
                   query_id_col, "neighbor_id",
                   F.round(cosine_similarity(F.col("__qv"), F.col("__cv")),
                           round_to).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
    max_queries: int = 10_000,
    max_sim: Optional[float] = None,
) -> DataFrame:
    """Exact top-k cosine via a numpy block-matmul ``mapInPandas``
    kernel — the hot-path form of :func:`cosine_topk` (same result,
    same determinism contract; that HOF form stays as the
    SQL-reproducible reference, this one is ~10× faster because each
    Arrow batch does one (block × dim) @ (dim × m) matmul instead of
    interpreted per-element ``zip_with``/``aggregate``).

    Scale shape: the query matrix is collected (bounded by
    ``max_queries`` — it is the small side by construction, exactly the
    set a vector-search service would broadcast) and closure-shipped;
    the corpus is scanned once, never shuffled. Each partition emits at
    most k rows PER QUERY (partial top-k on the rounded score with the
    same (score desc, id asc) order as the final window), so the only
    shuffled data is k·m·partitions candidate rows.

    ``max_sim`` (optional) excludes candidates whose ROUNDED cosine
    is ``>= max_sim`` before the top-k — the hard-negative-mining
    hook (see :func:`hard_negatives`); the comparison happens on the
    rounded score on both engines, so the exclusion is oracle-exact.

    Rounding parity: scores are rounded inside the kernel with
    decimal HALF_UP on the exact binary double — the same rule
    Spark's ``F.round``/BigDecimal and DuckDB apply — so the partial
    top-k and the final global window agree with the HOF/SQL form.
    (Summation order differs from the sequential HOF fold — numpy dot
    is pairwise — which can move a score by ~1 ulp; a rank flip needs
    that ulp to straddle a 0.5e-6 rounding boundary.)
    """
    import numpy as np
    import pandas as pd
    from decimal import Decimal, ROUND_HALF_UP

    q_rows = queries.select(id_col, vec_col).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_blocked collected {len(q_rows)} queries; "
            f"max_queries={max_queries}. Use lsh_cosine_topk for "
            "query sets too big to broadcast.")
    q_ids = [r[0] for r in q_rows]
    Q = np.asarray([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    quantum = Decimal(1).scaleb(-round_to)

    id_type = dict(corpus.select(id_col).dtypes)[id_col]
    out_schema = (f"{query_id_col} {id_type}, neighbor_id {id_type}, "
                  "cosine double")

    def _blocks(it):
        for pdf in it:
            if not len(pdf):
                continue
            C = np.asarray([list(v) for v in pdf[vec_col]],
                           dtype=np.float64)
            cn = np.sqrt((C * C).sum(axis=1))
            S = (C @ Q.T) / np.outer(cn, qn)  # (block, m)
            ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = S[:, j]
                mask = ids != qid  # self-match excluded
                cand_ids = ids[mask]
                scores = [float(Decimal(x).quantize(
                    quantum, rounding=ROUND_HALF_UP))
                    for x in col[mask]]
                if max_sim is not None:
                    # exclusion on the ROUNDED score: engine-exact,
                    # and filter-then-top-k commutes with the
                    # per-partition partial top-k
                    keep = [i for i, x in enumerate(scores)
                            if x < max_sim]
                    cand_ids = cand_ids[keep]
                    scores = [scores[i] for i in keep]
                order = sorted(range(len(cand_ids)),
                               key=lambda i: (-scores[i], cand_ids[i]))
                for i in order[:k]:
                    out_q.append(qid)
                    out_n.append(cand_ids[i])
                    out_s.append(scores[i])
            yield pd.DataFrame({query_id_col: out_q,
                                "neighbor_id": out_n,
                                "cosine": out_s})

    from .dedup import _spread
    cand = (_spread(corpus.select(id_col, vec_col))
            .mapInPandas(_blocks, out_schema))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dup_ceiling: float = 0.95,
    **kw,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training (the
    DPR/SimCSE recipe, Karpukhin et al. 2020: the most informative
    negatives are the highest-scoring NON-positives): for every query
    vector, the top-k cosine neighbors whose similarity stays BELOW
    ``dup_ceiling`` — candidates at or above the ceiling are
    positives/near-duplicates (paraphrases, boilerplate twins) and
    would poison the negative set (false negatives), so they are
    excluded before ranking.

    Same scale shape as :func:`cosine_topk_blocked` (broadcast query
    matrix, corpus scanned once and never shuffled, per-partition
    partial top-k): the ceiling filter runs inside the kernel on the
    rounded score, so partial top-k stays correct and the exclusion
    reproduces exactly in SQL.
    """
    return cosine_topk_blocked(corpus, queries, k=k,
                               max_sim=dup_ceiling, **kw)


# ----------------------------------------------------------------- IVF

def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    out_col: str = "__list",
    round_to: int = 6,
    sim_col: Optional[str] = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties →
    lowest centroid id): the inverted-file build step. TRULY map-side:
    the centroid table collapses to ONE array-of-structs row,
    broadcast once, and the argmax is a per-row ``array_max`` over
    ``(rounded cosine, -centroid_id)`` structs — zero shuffle of the
    vector side (the first cut window-ranked an N×K expansion, which
    exchanged N×K rows per call; measured plan now shows a single
    BroadcastNestedLoopJoin and no Exchange).

    ``sim_col`` additionally emits the winning (rounded) cosine — the
    distance-to-centroid signal :func:`semdedup` orders its removal
    scan by — at zero extra cost (the argmax struct already carries
    it)."""
    carr = centroids.agg(F.collect_list(F.struct(
        F.col(centroid_id_col).alias("cid"),
        F.col(vec_col).alias("cv"))).alias("__cents"))
    best = F.array_max(F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            F.round(cosine_similarity(F.col(vec_col), c["cv"]),
                    round_to).alias("s"),
            (-c["cid"]).alias("negid"))))
    # alias the argmax struct ONCE: referencing `best` from two output
    # columns would re-inline the whole K-cosine transform per column
    # (CollapseProject inlines multiply-referenced aliases only when
    # cheap; a raw Column expression is substituted before that check)
    out = (vectors.join(F.broadcast(carr))
                  .withColumn("__best", best)
                  .withColumn(out_col, -F.col("__best")["negid"]))
    if sim_col is not None:
        out = out.withColumn(sim_col, F.col("__best")["s"])
    return out.drop("__cents", "__best")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
    centroids: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF-flavored ANN: exemplar centroids (the ``n_centroids``
    lowest-id corpus vectors — a deterministic coarse quantizer; pass
    ``centroids=`` a :func:`kmeans_fit` result — ``(centroid_id,
    vec_col)`` — to use a LEARNED quantizer instead, which tightens
    the probed lists around real density), corpus partitioned
    into inverted lists by nearest centroid, each query probing its
    ``nprobe`` nearest lists, exact cosine rerank inside the probed
    lists only.

    Scale story: at 10^9+ vectors the corpus is written clustered by
    its list id, so a probe touches nprobe/n_centroids of the data and
    the candidate join is co-partitioned — the same plumbing as the
    LSH variant with a learned/selected quantizer instead of a hash.
    Exemplar centroids keep every step engine-portable (deterministic
    argmax on rounded cosine), so even this ANN has an exact SQL
    oracle."""
    cent = centroids if centroids is not None else (
        corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
              .select(F.col(id_col).alias("centroid_id"),
                      F.col(vec_col)))
    lists = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col,
                       round_to=round_to)

    qc = cent.select(F.col("centroid_id").alias("__cid"),
                     F.col(vec_col).alias("__cv"))
    q_scored = (queries.select(F.col(id_col).alias(query_id_col),
                               F.col(vec_col).alias("__qv"))
                .join(F.broadcast(qc))
                .withColumn("__sim", F.round(
                    cosine_similarity(F.col("__qv"), F.col("__cv")),
                    round_to)))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("__cid").asc())
    probes = (q_scored.withColumn("__rn", F.row_number().over(wq))
                      .filter(F.col("__rn") <= nprobe)
                      .select(query_id_col, "__qv",
                              F.col("__cid").alias("__list")))

    cand = (lists.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("__cv2"), "__list")
                 .join(F.broadcast(probes), "__list")
                 .filter(F.col("neighbor_id") != F.col(query_id_col)))
    scored = cand.select(
        query_id_col, "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv2")),
                round_to).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


# ----------------------------------------------------------------- LSH

def _plane_sign(dim_idx: Column, plane: int) -> Column:
    """Deterministic ±1 from md5 parity of (plane, dim) — any engine
    reproduces it; no RNG, no state."""
    h = F.md5(F.concat(F.lit(f"p{plane}:"), dim_idx.cast("string")))
    nib = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    return F.when(nib % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_signature(vec: Column, num_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = sign(v · h_p) where h_p has
    deterministic ±1 coefficients. Returned as an int (bucket id)."""
    v = _dbl(vec)
    idx = F.sequence(F.lit(1), F.size(v))

    def bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(v, idx,
                       lambda x, i: x * _plane_sign(i, p)),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))

    out = F.lit(0)
    for p in range(num_planes):
        out = out + bit(p)
    return out.cast("int")


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine rerank inside the bucket. Recall is tuned by
    ``num_planes`` (fewer planes → bigger buckets → higher recall);
    multi-probe or band-OR across several signatures is the standard
    extension and composes the same join.

    At scale the corpus is written bucketed/clustered by ``__bucket``
    so this join is co-partitioned with no shuffle of the big side.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"),
                      lsh_signature(F.col(vec_col), num_planes)
                      .alias("__bucket"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qv"),
                       lsh_signature(F.col(vec_col), num_planes)
                       .alias("__bucket"))
    scored = (c.join(F.broadcast(q), "__bucket")
               .filter(F.col("neighbor_id") != F.col(query_id_col))
               .select(
                   query_id_col, "neighbor_id",
                   F.round(cosine_similarity(F.col("__qv"), F.col("__cv")),
                           round_to).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB 2007): each query
    probes its own hyperplane bucket PLUS every bucket within Hamming
    distance ``probes`` of it — the standard way to buy recall
    without growing the index. A near neighbor that lands one
    flipped sign bit away (the most common miss: its projection on
    one plane sits near zero) is found by the 1-flip probes instead
    of being lost.

    Only the QUERY side fans out (``Σ_{i<=probes} C(planes, i)``
    probe rows per query — 9 for 8 planes / 1 probe); the corpus is
    hashed and bucketed exactly once, so the big side's layout and
    join shape are identical to :func:`lsh_cosine_topk` — at scale
    the corpus stays bucket-clustered with no shuffle. Exact cosine
    rerank inside the probed buckets; candidates deduped before
    ranking (a pair found via two probes must not double-count).
    ``probes=0`` degenerates to single-probe LSH.
    """
    if not 0 <= probes <= num_planes:
        raise ValueError(f"lsh_multiprobe_topk: probes must be in "
                         f"[0, num_planes], got {probes}")
    from itertools import combinations
    masks = [0]
    for r in range(1, probes + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= (1 << b)
            masks.append(m)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"),
                      lsh_signature(F.col(vec_col), num_planes)
                      .alias("__bucket"))
    base = lsh_signature(F.col(vec_col), num_planes)
    q = (queries.select(F.col(id_col).alias(query_id_col),
                        F.col(vec_col).alias("__qv"),
                        base.alias("__b0"))
         .select(query_id_col, "__qv",
                 F.explode(F.array(*[
                     F.col("__b0").bitwiseXOR(F.lit(m)) for m in masks
                 ])).alias("__bucket")))
    scored = (c.join(F.broadcast(q), "__bucket")
               .filter(F.col("neighbor_id") != F.col(query_id_col))
               .select(
                   query_id_col, "neighbor_id",
                   F.round(cosine_similarity(F.col("__qv"),
                                             F.col("__cv")),
                           round_to).alias("cosine"))
               .dropDuplicates([query_id_col, "neighbor_id"]))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def bitext_margin_mine(
    src_batch: DataFrame,
    tgt: DataFrame,
    src_corpus: "DataFrame | None" = None,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_micro_min: int = 1_000_000,
    max_queries: int = 10_000,
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings", §3 *ratio* margin): for each source embedding pick
    the target whose cosine most exceeds what either side scores
    against its ordinary neighborhood — the criterion behind the
    CCMatrix/LASER bitext pipelines, and the reason raw cosine
    thresholds fail (hub sentences score high against everything).

    ``margin(x, y) = cos(x, y) / ((avgNN_k(x→tgt) + avgNN_k(y→src))
    / 2)``, computed engine-exactly: each cosine is rounded to 6 then
    scaled to a micro-unit BIGINT, neighborhood sums are integer
    sums, and the ratio is one integer cross-multiplied floor
    division — ``margin_u6 = (cos_u6 · 2·n_x·n_y · 10^6) div
    (Σ_x·n_y + Σ_y·n_x)`` (n_* = actual neighbor counts, < k on tiny
    corpora).

    Scale shape: two :func:`cosine_topk_blocked` passes — queries
    broadcast (the ``src_batch`` must be bounded; the backward query
    set is its candidate fan-out, ≤ k·|batch|, both guarded by
    ``max_queries``'s loud failure), each corpus scanned once and
    never shuffled. The margin join keys are (x, y) id pairs; vectors
    never cross an exchange. Output: one row per source with a
    surviving best pair — ``(src_id, tgt_id, cosine, margin_u6)``,
    best = (margin desc, tgt_id) per src.

    ``src_corpus`` is the full source-language side used for the
    backward neighborhoods (defaults to ``src_batch`` when mining a
    self-contained batch).
    """
    if k < 1:
        raise ValueError("bitext_margin_mine: k must be >= 1")
    src_corpus = src_corpus if src_corpus is not None else src_batch
    u6 = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    fwd = cosine_topk_blocked(tgt, src_batch, k=k, id_col=id_col,
                              vec_col=vec_col,
                              max_queries=max_queries)
    fwd = fwd.localCheckpoint()  # consumers: denom agg + pair list
    den_x = (fwd.groupBy("query_id")
             .agg(F.sum(u6(F.col("cosine"))).alias("__sx"),
                  F.count(F.lit(1)).alias("__nx")))
    cand = (tgt.join(
        fwd.select(F.col("neighbor_id").alias(id_col)).distinct(),
        id_col))
    bwd = cosine_topk_blocked(src_corpus, cand, k=k, id_col=id_col,
                              vec_col=vec_col,
                              max_queries=max_queries)
    den_y = (bwd.groupBy("query_id")
             .agg(F.sum(u6(F.col("cosine"))).alias("__sy"),
                  F.count(F.lit(1)).alias("__ny")))
    pairs = (fwd.select(F.col("query_id").alias("src_id"),
                        F.col("neighbor_id").alias("tgt_id"),
                        "cosine")
             .join(den_x.withColumnRenamed("query_id", "src_id"),
                   "src_id")
             .join(den_y.withColumnRenamed("query_id", "tgt_id"),
                   "tgt_id")
             .withColumn(
                 "margin_u6",
                 F.expr("(CAST(round(cosine * 1000000) AS BIGINT) "
                        "* 2 * __nx * __ny * 1000000) DIV "
                        "(__sx * __ny + __sy * __nx)")))
    w = Window.partitionBy("src_id").orderBy(
        F.col("margin_u6").desc(), F.col("tgt_id"))
    return (pairs.filter(F.col("margin_u6") >= margin_micro_min)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("src_id", "tgt_id", "cosine", "margin_u6"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    rerank: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
    codebook: Optional[DataFrame] = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou, Douze & Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): vectors
    compressed to ``m`` one-byte-ish codes, queries scored against
    the CODES by asymmetric distance (ADC), exact cosine rerank of
    the shortlist → ``(query_id, neighbor_id, cosine, rank)``.

    This is the missing member of the ANN family here (brute / LSH /
    multi-probe / IVF): at 10^11 vectors the embeddings themselves
    are the storage problem — 64-dim floats = 256 B/vector vs
    ``m`` codes = 4 B — and PQ is how production vector search
    scans compressed data and touches raw vectors only for the
    ``rerank`` shortlist.

    Determinism/portability: the codebook is exemplar-based (the
    ``n_codes`` lowest-id corpus vectors' sub-slices; pass
    ``codebook=(code, vec)`` from :func:`kmeans_fit` for a learned
    one — same pluggable contract as IVF), every distance is spelled
    through the SAME dot-product fold the cosine oracles already
    prove engine-exact (``|a−b|² = a·a − 2a·b + b·b``), all
    comparisons happen on round-to-6 values with id tie-breaks.

    Scale shape: encoding is one broadcast join (n_codes rows) + one
    groupBy(id) with ``min_by`` per subspace — the corpus streams
    through map-side, vectors never shuffle; ADC is the bounded
    broadcast-queries scan (the cosine_topk contract) over CODE
    columns; only the ``rerank`` shortlist touches raw vectors
    again.
    """
    if dim % m != 0:
        raise ValueError(f"pq_topk: dim {dim} not divisible by "
                         f"m {m}")
    if rerank < k:
        raise ValueError(f"pq_topk: rerank {rerank} < k {k}")
    sub = dim // m

    def sl(col, s):  # 1-based sub-slice of subspace s
        return F.slice(col, 1 + s * sub, sub)

    def l2(a, b):  # |a-b|² via the proven dot fold, rounded
        return F.round(dot(a, a) - 2 * dot(a, b) + dot(b, b),
                       round_to)

    cb = codebook if codebook is not None else (
        corpus.orderBy(F.col(id_col).asc()).limit(n_codes)
              .select(F.col(id_col).alias("code"),
                      F.col(vec_col).alias("__cbv")))
    cb = cb.select("code", F.col(cb.columns[1]).alias("__cbv"))

    # encode: one broadcast join + one min_by groupBy; vectors ride
    # the groupBy ONCE (first(e)) for the later rerank join-free read
    enc = (corpus.select(F.col(id_col).alias("nid"),
                         F.col(vec_col).alias("__e"))
           .join(F.broadcast(cb)))
    aggs = [F.first("__e").alias("__e")]
    for s in range(m):
        d = l2(sl(F.col("__e"), s), sl(F.col("__cbv"), s))
        aggs.append(F.min_by("code", F.struct(d.alias("d"),
                                              F.col("code")))
                    .alias(f"c{s}"))
    codes = enc.groupBy("nid").agg(*aggs)

    # ADC: look the centroid sub-vectors back up (m broadcast joins
    # on n_codes rows), score against the bounded broadcast queries
    scored = codes
    for s in range(m):
        side = cb.select(F.col("code").alias(f"c{s}"),
                         F.col("__cbv").alias(f"__cb{s}"))
        scored = scored.join(F.broadcast(side), f"c{s}")
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qv"))
    adc = None
    cand = scored.join(F.broadcast(q)) \
        .filter(F.col("nid") != F.col(query_id_col))
    for s in range(m):
        t = l2(sl(F.col("__qv"), s), sl(F.col(f"__cb{s}"), s))
        adc = t if adc is None else adc + t
    cand = cand.withColumn("__adc", F.round(adc, round_to))
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc").asc(), F.col("nid").asc())
    short = (cand.withColumn("__rn", F.row_number().over(wa))
             .filter(F.col("__rn") <= rerank))

    exact = short.select(
        query_id_col, F.col("nid").alias("neighbor_id"),
        F.round(cosine_similarity(F.col("__qv"), F.col("__e")),
                round_to).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Spherical k-means over an embedding column — the learned coarse
    quantizer the IVF docstring promises (pass the result as
    ``centroids=`` to :func:`ivf_cosine_topk`), and the standard
    corpus-organization primitive (topic bucketing, per-cluster
    sampling quotas).

    Deterministic by construction: initial centroids are the ``k``
    vectors with the smallest ``md5(id)`` (hash order — spread across
    the corpus, stable across runs/partitionings), assignment is
    :func:`ivf_assign`'s rounded-cosine argmax with the lowest-id
    tie-break, and iteration count is FIXED at ``max_iter`` (no
    convergence epsilon — a float threshold would make the round
    count partition-order-sensitive). Exact float reproducibility of
    the centroid means across different partitionings is NOT promised
    (float addition is order-sensitive); boundary vectors may differ
    at the last ulp — the documented limit of any distributed k-means.

    Returns ``(centroid_id, vec_col)`` with unit-norm centroids
    (spherical update: mean then renormalize). Empty clusters keep
    their previous centroid.

    Scale: per iteration, ONE broadcast of k×d centroids, one
    assignment scan (map-side), one posexplode + (cluster, dim)
    aggregation — partial map-side, shuffle carries k×d partials per
    task. Lineage is localCheckpoint-truncated per round (the
    iterative-job rule from connected components).
    """
    if k < 1 or max_iter < 1:
        raise ValueError("kmeans_fit: k and max_iter must be >= 1")
    seeds = (vectors
             .withColumn("__h", F.md5(F.col(id_col).cast("string")))
             .orderBy("__h").limit(k))
    wseed = Window.orderBy("__h")
    cent = (seeds.withColumn("centroid_id",
                             (F.row_number().over(wseed) - 1)
                             .cast("bigint"))
            .select("centroid_id",
                    normalize(F.col(vec_col)).alias(vec_col)))
    cent = cent.localCheckpoint()
    for _ in range(max_iter):
        assigned = ivf_assign(vectors, cent, id_col=id_col,
                              vec_col=vec_col, out_col="__list",
                              round_to=round_to)
        # spherical update: average the UNIT-NORMALIZED members —
        # averaging raw vectors would let one high-magnitude vector
        # dominate a cluster its cosine assignment treated equally
        dims = assigned.select(
            "__list", F.posexplode(normalize(F.col(vec_col)))
                       .alias("__d", "__x"))
        newc = (dims.groupBy("__list", "__d")
                .agg(F.avg("__x").alias("__m"))
                .groupBy("__list")
                .agg(F.array_sort(F.collect_list(F.struct("__d", "__m")))
                      .alias("__dm"))
                .select(F.col("__list").alias("centroid_id"),
                        normalize(F.transform(
                            "__dm", lambda s: s["__m"])).alias(vec_col)))
        cent = (cent.select("centroid_id",
                            F.col(vec_col).alias("__old"))
                .join(newc, "centroid_id", "left")
                .select("centroid_id",
                        F.coalesce(F.col(vec_col), F.col("__old"))
                         .alias(vec_col))
                .localCheckpoint())
    return cent


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "far",
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning — cluster the embeddings, and within each
    cluster remove every vector whose cosine to an earlier-ranked
    cluster member reaches ``threshold``.

    The removal scan is the paper's triangular rule, made fully
    declarative: rank cluster members by distance to their centroid
    (``keep='far'`` — the paper's best setting — keeps the FARTHEST
    member of a duplicate group, so rank ascends by centroid cosine;
    ``keep='near'`` descends), ties broken by id, then drop member j
    iff ANY i with rank(i) < rank(j) has ``round(cos(i,j), round_to)
    >= threshold``. No iteration, no kept-set recursion: the rule
    compares against all earlier members (exactly the official
    implementation's upper-triangular max), so one ranked self-join
    decides every row independently and the result is deterministic
    under any partitioning.

    Returns every input row as ``(id_col, centroid_id, centroid_sim,
    kept)`` — an audit frame; filter ``kept`` to materialize the
    pruned corpus (same audit/filter split as the C4 cleaner).

    Pass ``centroids=`` a :func:`kmeans_fit` result (the paper's
    setup) or any exemplar frame ``(centroid_id, vec_col)``.

    Scale: assignment is :func:`ivf_assign` (one broadcast, zero
    shuffle); the pairwise stage shuffles each side ONCE on
    centroid_id and expands pairs only within a cluster, so total
    work is Σ|cluster|² — bounded by choosing k ≈ N/target_size
    (the paper runs k=50k on LAION-440M for ~9k-row clusters).
    A left-semi join keeps only duplicate IDs out of the pair
    expansion; nothing corpus-sized crosses a window.

    Reference analogue: none — Beats has no embedding surface; this
    extends the dedup family (exact → MinHash → SimHash → embedding)
    to the semantic tier of an LLM curation funnel.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"semdedup: keep must be 'far' or 'near', "
                         f"got {keep!r}")
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"semdedup: threshold must be in (0, 1], "
                         f"got {threshold}")
    a = ivf_assign(vectors.select(id_col, vec_col), centroids,
                   id_col=id_col, vec_col=vec_col,
                   out_col="centroid_id", round_to=round_to,
                   sim_col="centroid_sim")
    sim = F.col("centroid_sim")
    w = (Window.partitionBy("centroid_id")
         .orderBy(sim.asc() if keep == "far" else sim.desc(),
                  F.col(id_col).asc()))
    r = a.withColumn("__rk", F.row_number().over(w))
    earlier = r.select(F.col("centroid_id").alias("__c"),
                       F.col("__rk").alias("__rk_i"),
                       F.col(vec_col).alias("__vi"))
    pair_cos = F.round(
        cosine_similarity(F.col(vec_col), F.col("__vi")), round_to)
    dup_ids = r.join(
        earlier,
        (F.col("centroid_id") == F.col("__c"))
        & (F.col("__rk_i") < F.col("__rk"))
        & (pair_cos >= F.lit(float(threshold))),
        "leftsemi").select(id_col)
    return (r.drop("__rk", vec_col)
            .join(dup_ids.withColumn("__dup", F.lit(True)),
                  id_col, "left")
            .withColumn("kept", F.col("__dup").isNull())
            .drop("__dup"))


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "id",
    k: int = 60,
    topn: "int | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    ``(id, rrf_micro, n_lists)`` with ``rrf_micro = Σ 10^6 DIV
    (k + rank)`` — the standard way to combine retrieval signals
    (sparse cosine, dense cosine, a pagerank prior) without score
    calibration, since RRF reads only RANKS.

    Integer micro-units via DIV keep the fused score bit-exact across
    engines (the float ``1/(k+r)`` sum is order-dependent); ties in
    the fused readout break by id. Each input frame must already
    carry an integer ``rank`` column (1-based; build with a
    ``row_number`` over a DETERMINISTIC order — value then id — or
    the fusion inherits nondeterminism). Ids absent from a list
    contribute nothing for it, the conventional RRF treatment.

    Shape: a union + one partial-combining sum agg — no joins, so
    fusing S signals over 10^12 candidates is S map passes and one
    exchange keyed on id.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 0:
        raise ValueError(f"rrf_fuse: k must be >= 0, got {k}")
    parts = []
    for r in rankings:
        parts.append(r.select(
            F.col(id_col).alias("id"),
            F.expr(f"1000000 DIV ({k} + rank)").cast("long")
            .alias("__c")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = (u.groupBy("id")
           .agg(F.sum("__c").alias("rrf_micro"),
                F.count(F.lit(1)).cast("int").alias("n_lists")))
    if topn is not None:
        out = out.orderBy(F.col("rrf_micro").desc(), "id").limit(topn)
    return out


def random_projection(
    df: DataFrame,
    out_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dimensionality reduction by deterministic ±1 random projection
    (Achlioptas 2001: a Rademacher sign matrix preserves pairwise
    distances in the JL sense without Gaussian sampling): output dim
    ``j`` is ``Σ_i emb[i]·s(i,j)`` with the sign derived from integer
    arithmetic on (i, j) — no stored projection matrix, any executor
    regenerates any entry, and an ANSI-SQL oracle reproduces it
    exactly.

    Exactness: the input is quantized to integer micro-units FIRST
    (``round(1e6·x)``), so every projection is an integer sum —
    order-independent where a float fold would drift across engines.

    Scale shape: a pure zero-exchange projection (JVM higher-order
    functions, no Python, no shuffle); the quantized array is staged
    as a real column so the ``out_dims`` fold expressions share one
    array build (the measured HOF re-evaluation trap). Output: one row
    per (id, out_dim) with ``proj_micro``; NULL vectors project to
    NULL, empty vectors to 0.
    """
    if out_dims < 1:
        raise ValueError(f"out_dims must be >= 1, got {out_dims}")

    def sign(i: Column, j: int):
        # quadratic in i with a j-dependent slope so output dims
        # decorrelate (an affine-in-i parity makes every dim a shifted
        # copy of the same sequence — measured r=0.12 vs true-random
        # r=0.51 on the JL distance-correlation check)
        h = (i * i * F.lit(j + 1) + i * F.lit(31 * (j + 1) * (j + 1))
             + i * F.lit(7) + F.lit(11 * j)) % 101
        return F.when(h % 2 == 0, F.lit(1).cast("long")) \
                .otherwise(F.lit(-1).cast("long"))

    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.round(F.lit(1e6) * x).cast("long"))
         .alias("__em"))
    n = F.size("__em")

    def proj(j: int):
        # sequence(1, 0) is invalid — guard the empty/NULL cases
        return F.when(
            n > 0,
            F.aggregate(
                F.zip_with(F.col("__em"),
                           F.sequence(F.lit(1), n),
                           lambda x, i: x * sign(i, j)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v)) \
            .when(n == 0, F.lit(0).cast("long")) \
            .otherwise(F.lit(None).cast("long"))

    projs = F.array(*[
        F.struct(F.lit(j).alias("out_dim"),
                 proj(j).alias("proj_micro"))
        for j in range(out_dims)])
    return (staged
            .select(id_col, F.explode(projs).alias("__p"))
            .select(id_col, F.col("__p.out_dim").alias("out_dim"),
                    F.col("__p.proj_micro").alias("proj_micro")))
