"""Corpus n-gram language-model quality scoring — the CCNet recipe
(Wenzek et al. 2020: rank web text by LM perplexity; filter or bucket
on the score) with the KenLM stage re-expressed as DataFrame ops.

A bigram model with Laplace smoothing is trained ON the corpus
itself (or any reference corpus passed separately):

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

and every document is scored by its mean bigram log-probability.
Documents whose word transitions are unlike the corpus (gibberish,
boilerplate soup, wrong-language fragments) score low; fluent text
scores high — the same signal CCNet uses, minus the pretrained
external model (which a container without KenLM cannot ship anyway).

Exactness: each bigram's log-probability is quantized to integer
MICRO-NATS (``round(ln(p) · 1e6)`` as bigint) before summation, so
per-document totals are integer sums — immune to float-summation
order across partitions and engines — and an external SQL engine
reproduces the scores bit-for-bit. The only float step (one ``ln``
per DISTINCT bigram) happens before any cross-row aggregation.

Scale: two count aggregations (unigram, bigram — both partial
map-side, shuffle carries hash-keyed counts), one scalar broadcast
(vocabulary size), then the scoring join keyed by the bigram —
documents never move whole; the hot keys are stopword bigrams whose
counts arrive pre-combined. The model tables can be cached and
reused to score any number of batches (train once, score many).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens, _spread

__all__ = ["bigram_model", "domain_weights", "lm_score", "nb_quality",
           "token_kl"]


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens(F.col(text_col))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, (i + 1).cast("int"))
                         .alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (df.select(F.col(id_col), F.explode(pairs).alias("__bg"))
              .select(id_col, F.col("__bg.w1").alias("w1"),
                      F.col("__bg.w2").alias("w2")))


def bigram_model(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    spread: bool = True,
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Train the smoothed bigram tables on ``corpus``: returns
    ``(unigrams(w1, c1), bigrams(w1, w2, c12), vocab(v))`` — ``vocab``
    is a one-row frame joined as a broadcast scalar, so training is
    fully in-plan (no driver collect). ``spread=False`` skips the
    input re-spread when the caller already spread it."""
    spread = _spread(corpus) if spread else corpus
    uni = (spread.select(F.explode(tokens(F.col(text_col)))
                          .alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bi = (_doc_bigrams(spread, id_col, text_col)
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    return uni, bi, vocab


def lm_score(
    df: DataFrame,
    model: Optional[Tuple[DataFrame, DataFrame, DataFrame]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document by its mean bigram log-probability under
    ``model`` (default: a model trained on ``df`` itself — the
    self-scoring CCNet bucketing form).

    Returns ``(id_col, n_bigrams, lp_micro, avg_lp_micro)``:
    ``lp_micro`` is the bigint sum of per-bigram micro-nat
    log-probabilities, ``avg_lp_micro = floor(lp_micro / n_bigrams)``
    (integer division — exact everywhere). Documents with fewer than
    2 tokens score NULL averages over 0 bigrams (nothing to measure).
    Higher is more corpus-like; filter or bucket downstream.

    An unseen bigram whose ``w1`` is also unseen gets
    ``P = 1 / V`` (c12 = c1 = 0 — the Laplace limit), so scoring a
    NEW batch with a frozen model is total: no lookup can fail.
    """
    src = _spread(df)
    # self-training reuses the ONE spread frame for both the model
    # aggregations and the scoring explode (a second _spread added a
    # redundant full-text exchange)
    uni, bi, vocab = model if model is not None else bigram_model(
        src, id_col=id_col, text_col=text_col, spread=False)
    occ = _doc_bigrams(src, id_col, text_col)
    scored = (occ.join(bi, ["w1", "w2"], "left")
                 .join(uni, "w1", "left")
                 .join(F.broadcast(vocab))
                 .select(
                     F.col(id_col),
                     F.round(F.log(
                         (F.coalesce(F.col("c12"), F.lit(0)) + 1.0)
                         / (F.coalesce(F.col("c1"), F.lit(0))
                            + F.col("v")))
                         * 1_000_000.0)
                     .cast("bigint").alias("__lp")))
    agg = (scored.groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum("__lp").cast("bigint").alias("lp_micro")))
    base = df.select(F.col(id_col)).distinct()
    out = (base.join(agg, id_col, "left")
           .select(id_col,
                   F.coalesce("n_bigrams", F.lit(0).cast("bigint"))
                    .alias("n_bigrams"),
                   F.coalesce("lp_micro", F.lit(0).cast("bigint"))
                    .alias("lp_micro")))
    return out.withColumn(
        "avg_lp_micro",
        F.when(F.col("n_bigrams") > 0,
               F.floor(F.col("lp_micro") / F.col("n_bigrams"))
                .cast("bigint")))


def nb_quality(
    df: DataFrame,
    label: "F.Column",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Naive-Bayes quality classifier, trained in-plan — the
    curated-vs-crawl quality scorer of the GPT-3 recipe (Brown et al.
    2020, Appendix A: classify documents by similarity to a curated
    corpus; positives = curated, negatives = raw crawl), with the
    fastText/logistic model replaced by multinomial NB so both the
    training counts AND the scores are exactly reproducible in SQL.

    ``label`` is a boolean Column marking the positive (curated)
    class. Per token ``w``:

        lw = round(ln((c_pos+1)/(N_pos+V))·1e6)
           - round(ln((c_neg+1)/(N_neg+V))·1e6)

    (each ln quantized to integer micro-nats BEFORE any cross-row
    sum — the module's cents trick), and each document scores

        nb_micro = prior_micro + Σ_occurrences lw,
        pred_quality = nb_micro > 0

    with Laplace-smoothed log-odds priors (total even when one class
    is empty). Returns ``(id_col, n_tokens, nb_micro, pred_quality)``.

    Scale shape: ONE explode of the corpus into (id, y, w); the token
    table is a partial-combining groupBy on ``w`` (hot stopword keys
    arrive pre-summed); totals and priors are one-row broadcast
    scalars; scoring joins occurrences to the vocab-sized token table
    on ``w`` (NOT broadcast — at web scale the vocabulary can be
    100M+ types; AQE picks the strategy) and re-aggregates on the id.
    Documents never move whole — the exchanges carry (id, w) and
    (id, lw) pairs only. Reference: Beats has no analog; this is the
    curation layer over the same routed corpus.
    """
    src = _spread(df)
    lab = src.select(F.col(id_col), F.col(text_col),
                     label.cast("int").alias("__y"))
    occ = lab.select(
        id_col, "__y",
        F.explode(tokens(F.col(text_col))).alias("w"))
    tok = occ.groupBy("w").agg(
        F.sum("__y").cast("bigint").alias("c_pos"),
        F.sum(1 - F.col("__y")).cast("bigint").alias("c_neg"))
    tot = tok.agg(F.sum("c_pos").cast("double").alias("np"),
                  F.sum("c_neg").cast("double").alias("nn"),
                  F.count(F.lit(1)).cast("double").alias("v"))
    pri = lab.agg(
        (F.round(F.log((F.sum("__y") + 1.0)
                       / (F.count(F.lit(1)) + 2.0)) * 1_000_000.0)
          .cast("bigint")
         - F.round(F.log((F.count(F.lit(1)) - F.sum("__y") + 1.0)
                         / (F.count(F.lit(1)) + 2.0)) * 1_000_000.0)
            .cast("bigint")).alias("prior_micro"))
    lw = (F.round(F.log((F.col("c_pos") + 1.0)
                        / (F.col("np") + F.col("v"))) * 1_000_000.0)
           .cast("bigint")
          - F.round(F.log((F.col("c_neg") + 1.0)
                          / (F.col("nn") + F.col("v"))) * 1_000_000.0)
             .cast("bigint"))
    scored = (occ.join(tok, "w")          # self-trained: total by construction
                 .join(F.broadcast(tot))
                 .select(id_col, lw.alias("__lw")))
    agg = (scored.groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                F.sum("__lw").cast("bigint").alias("ll_micro")))
    nb = F.col("prior_micro") + F.coalesce(
        F.col("ll_micro"), F.lit(0).cast("bigint"))
    return (df.select(F.col(id_col)).distinct()
            .join(agg, id_col, "left")
            .join(F.broadcast(pri))
            .select(F.col(id_col),
                    F.coalesce("n_tokens", F.lit(0).cast("bigint"))
                     .alias("n_tokens"),
                    nb.cast("bigint").alias("nb_micro"),
                    (nb > 0).alias("pred_quality")))


def token_kl(
    df: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution drift: for every group ``by``
    (source, snapshot, language…), the KL divergence of its
    Laplace-smoothed unigram distribution from the whole corpus —
    the data-mixture diagnostic (which sources are distributionally
    far from the blend they feed) and the drift monitor (a snapshot
    whose KL jumps changed its content mix).

    Exactness: KL is reported SCALED by the group's smoothed mass so
    every cross-row aggregate is an integer sum —

        kl_scaled_micro = Σ_w (c_g(w)+1) · [round(ln p_g(w)·1e6)
                                           - round(ln q(w)·1e6)]

    with p_g(w) = (c_g(w)+1)/(N_g+V), q(w) = (c(w)+1)/(N+V); divide
    by ``smoothed_mass`` (= N_g+V, returned) for nats. Each ln is
    quantized per DISTINCT (group, token) BEFORE summation — the
    module's cents trick — so SQL reproduces the statistic
    bit-for-bit. The sum runs over the FULL vocabulary per group
    (Laplace gives absent tokens positive mass), which is the honest
    definition: cost is |groups| × |vocab| rows, fine for the
    low-cardinality groups this diagnostic is for (sources,
    languages, snapshots — not URLs).

    Returns ``(by, n_tokens, smoothed_mass, kl_scaled_micro)``.
    Scale shape: one corpus explode; (group, token) counts and vocab
    counts are partial-combining aggs; the grid is vocab ⋈
    broadcast(groups) (BroadcastNestedLoop on the SMALL side only);
    totals ride a broadcast one-row frame; the final agg carries
    (group, term) pairs.
    """
    src = _spread(df)
    occ = src.select(F.col(by).alias("g"),
                     F.explode(tokens(F.col(text_col))).alias("w"))
    gw = occ.groupBy("g", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cgw"))
    vocab = gw.groupBy("w").agg(F.sum("cgw").cast("bigint").alias("cw"))
    gtot = gw.groupBy("g").agg(F.sum("cgw").cast("bigint").alias("ng"))
    tot = vocab.agg(F.sum("cw").cast("double").alias("n"),
                    F.count(F.lit(1)).cast("double").alias("v"))
    grid = (vocab.crossJoin(F.broadcast(gtot))
            .join(gw, ["g", "w"], "left")
            .join(F.broadcast(tot))
            .select(
                "g", "ng",
                (F.coalesce("cgw", F.lit(0)) + 1).cast("bigint")
                .alias("cg1"),
                (F.round(F.log((F.coalesce("cgw", F.lit(0)) + 1.0)
                               / (F.col("ng") + F.col("v")))
                         * 1_000_000.0).cast("bigint")
                 - F.round(F.log((F.col("cw") + 1.0)
                                 / (F.col("n") + F.col("v")))
                           * 1_000_000.0).cast("bigint")).alias("t")))
    out = (grid.groupBy("g", "ng")
           .agg(F.sum(F.col("cg1") * F.col("t")).cast("bigint")
                .alias("kl_scaled_micro")))
    return (out.join(F.broadcast(tot))
            .select(F.col("g").alias(by),
                    F.col("ng").alias("n_tokens"),
                    (F.col("ng") + F.col("v")).cast("bigint")
                    .alias("smoothed_mass"),
                    "kl_scaled_micro"))


def domain_weights(
    df: DataFrame,
    curated: "F.Column",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """DoReMi-style domain mixture weights (Xie et al. 2023,
    "Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"), as a one-shot frozen-model analog: instead of the
    paper's Group-DRO proxy training loop, both models are bigram LMs
    trained in-plan — the REFERENCE on the ``curated`` subset (the
    target distribution), the PROXY on the whole corpus — and each
    domain's excess loss is
    ``max(0, loss_proxy(d) - loss_ref(d)) = max(0, avg_lp_ref(d) -
    avg_lp_proxy(d))``: domains the curated reference compresses
    better than the corpus generalist carry learnable target-aligned
    signal; domains both models find equally hard (noise) clip to
    zero. Weights are bigram-mass-scaled and normalized to
    micro-units: ``weight_micro(d) = round(1e6 * nb_d * excess_d /
    Σ nb·excess)`` (all zeros when no domain has excess).

    Fused plan (the scale shape): ONE unigram explode and ONE bigram
    explode train BOTH models via conditional sums (``c_all`` /
    ``c_cur`` per gram), and one join pass scores both — the corpus
    text is read once, never duplicated per model. Per-bigram
    log-probs are quantized to integer micro-nats BEFORE any
    cross-row sum (the lm_score discipline), so per-domain sums are
    integer-exact across engines and partitionings. The final
    normalization joins a broadcast one-row total. ``nb_d × excess_d``
    products are BIGINT — at true 10^12-doc scale move them to
    DECIMAL(38,0).

    ``curated`` must select a NON-EMPTY subset (the reference
    vocabulary backstop ``greatest(v_cur, 1)`` keeps the expression
    total, but an empty reference makes every excess meaningless).
    Returns one row per domain: ``(domain, n_bigrams,
    avg_lp_ref_micro, avg_lp_proxy_micro, excess_micro,
    weight_micro)``; domains with no bigrams get NULL averages and
    zero weight."""
    src = _spread(df)
    toks = tokens(F.col(text_col))
    one_if_cur = F.when(curated, 1).otherwise(0)

    # fit tables are CHECKPOINTED (the dsir_select lesson): u/b/v are
    # vocab-sized aggregates, but left lazy each downstream consumer
    # re-runs their corpus explode inside one plan — the scoring join
    # references b AND u AND v, and v aggregates u, so the un-staged
    # spelling exploded the corpus 4x (measured 31 -> 3.8 s at sf0.1)
    uocc = src.select(one_if_cur.alias("__cur"),
                      F.explode(toks).alias("w1"))
    u = (uocc.groupBy("w1")
         .agg(F.count(F.lit(1)).cast("bigint").alias("c1_all"),
              F.sum("__cur").cast("bigint").alias("c1_cur"))
         .localCheckpoint())
    v = u.agg(
        F.count(F.lit(1)).cast("double").alias("v_all"),
        F.greatest(
            F.sum(F.when(F.col("c1_cur") > 0, 1).otherwise(0)),
            F.lit(1)).cast("double").alias("v_cur"))

    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, (i + 1).cast("int"))
                         .alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    g = (src.select(F.col(domain_col), one_if_cur.alias("__cur"),
                    F.explode(pairs).alias("__bg"))
         .select(domain_col, "__cur", F.col("__bg.w1").alias("w1"),
                 F.col("__bg.w2").alias("w2")))
    b = (g.groupBy("w1", "w2")
         .agg(F.count(F.lit(1)).cast("bigint").alias("c12_all"),
              F.sum("__cur").cast("bigint").alias("c12_cur"))
         .localCheckpoint())

    lp = lambda c12, c1, vv: F.round(F.log(  # noqa: E731
        (F.col(c12) + 1.0) / (F.col(c1) + F.col(vv)))
        * 1_000_000.0).cast("bigint")
    s = (g.join(b, ["w1", "w2"]).join(u, "w1").join(F.broadcast(v))
         .select(F.col(domain_col),
                 lp("c12_all", "c1_all", "v_all").alias("lp_all"),
                 lp("c12_cur", "c1_cur", "v_cur").alias("lp_cur")))
    d = (s.groupBy(domain_col)
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
              F.sum("lp_cur").alias("__sum_cur"),
              F.sum("lp_all").alias("__sum_all")))

    base = df.select(domain_col).distinct()
    e = (base.join(d, domain_col, "left")
         .select(domain_col,
                 F.coalesce("n_bigrams", F.lit(0).cast("bigint"))
                  .alias("n_bigrams"),
                 F.floor(F.col("__sum_cur") / F.col("n_bigrams"))
                  .cast("bigint").alias("avg_lp_ref_micro"),
                 F.floor(F.col("__sum_all") / F.col("n_bigrams"))
                  .cast("bigint").alias("avg_lp_proxy_micro")))
    # e is DOMAIN-sized (one row per source); the checkpoint keeps the
    # normalization total + final select from re-running the scoring
    # join twice
    e = e.withColumn(
        "excess_micro",
        F.when(F.col("n_bigrams") > 0,
               F.greatest(F.lit(0).cast("bigint"),
                          F.col("avg_lp_ref_micro")
                          - F.col("avg_lp_proxy_micro")))
         .otherwise(F.lit(0).cast("bigint"))).localCheckpoint()
    tot = e.agg(F.sum(F.col("n_bigrams") * F.col("excess_micro"))
                .cast("double").alias("__tt"))
    return (e.join(F.broadcast(tot))
            .withColumn(
                "weight_micro",
                F.when(F.col("__tt") > 0,
                       F.round((F.col("n_bigrams")
                                * F.col("excess_micro"))
                               .cast("double") * 1_000_000.0
                               / F.col("__tt")).cast("bigint"))
                 .otherwise(F.lit(0).cast("bigint")))
            .drop("__tt"))
