#!/usr/bin/env python
"""Deterministic scale-up of the shipped testdata for scaling-curve
measurement (VERDICT r4 item 1): synthesize an sfN directory as K
isomorphic replicas of sf0.1, where K = sfN / 0.1.

Construction (seed-free, fully deterministic):

- ``documents``: replica r offsets ``doc_id`` by r·10^7 and maps each
  word into a replica-DISJOINT vocabulary (``w → w || '~' || r`` for
  r>0; r=0 is the shipped corpus verbatim). A per-replica word
  bijection preserves every intra-replica property the
  dedup/curation family measures — exact-dup groups, shingle-set
  Jaccard, simhash/minhash collision structure, token counts, DSIR
  n-gram masses — EXACTLY, while DISJOINT vocabularies guarantee
  zero cross-replica shingle collisions: K replicas ≡ K independent
  corpora of identical statistics, so the candidate-pair WORK grows
  exactly K×. (A first attempt rotated words within the shared
  31-word vocab; that keeps cross-replica similarity high and
  candidate pairs grow ~quadratically — a data artifact that read
  as 15–16× growth for 10× data. An operator-scaling curve needs
  the corpus's similarity DENSITY held constant, which disjoint
  vocabularies do and a real growing web corpus approximates.)
- ``embeddings``: replica r offsets ``vec_id`` by r·10^7 and
  circularly shifts each vector by r positions — norms and
  intra-replica pairwise cosines are exactly preserved.
- ``events`` / TPC-H tables: replica r offsets every join key by
  r·10^7 (event_id, user_id, orderkey, custkey, suppkey, partkey),
  preserving the join graph per replica; region/nation stay as-is
  (bounded dims shared by all replicas).

Usage: python scripts/make_scale_data.py [sf] [out_dir]
Defaults: sf=1 → /tmp/beats_spark_testdata_sf1
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000


def build(sf: float, out: str) -> None:
    k = round(sf / 0.1)
    assert k >= 1
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def cp(table, sql):
        dst = os.path.join(out, f"{table}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, "
            f"COMPRESSION SNAPPY)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")

    def src(t):
        return f"'{SRC}/{t}.parquet'"

    rep = f"(SELECT unnest(range({k})) AS r)"

    cp("documents", f"""
        WITH ex AS (
          SELECT d.doc_id + r.r * {OFF} AS doc_id,
                 CASE WHEN d.text IS NULL OR r.r = 0 THEN d.text
                      ELSE array_to_string(
                        list_transform(string_split(d.text, ' '),
                          w -> CASE WHEN w = '' THEN w
                               ELSE w || '~' || r.r END), ' ')
                 END AS text,
                 d.lang, d.source
          FROM {src('documents')} d CROSS JOIN {rep} r)
        SELECT doc_id, text, lang, source,
               coalesce(length(text), 0) AS n_chars FROM ex""")

    cp("embeddings", f"""
        SELECT e.vec_id + r.r * {OFF} AS vec_id,
               CASE WHEN r.r = 0 THEN e.embedding ELSE
                 list_concat(
                   e.embedding[(len(e.embedding) -
                      (r.r % len(e.embedding)) + 1):],
                   e.embedding[:(len(e.embedding) -
                      (r.r % len(e.embedding)))])
               END AS embedding,
               e.label
        FROM {src('embeddings')} e CROSS JOIN {rep} r""")

    cp("events", f"""
        SELECT e.event_id + r.r * {OFF} AS event_id, e.ts,
               e.user_id + r.r * {OFF} AS user_id,
               e.event_type, e.value, e.props
        FROM {src('events')} e CROSS JOIN {rep} r""")

    cp("customer", f"""
        SELECT c.c_custkey + r.r * {OFF} AS c_custkey,
               c.* EXCLUDE (c_custkey)
        FROM {src('customer')} c CROSS JOIN {rep} r""")
    cp("supplier", f"""
        SELECT s.s_suppkey + r.r * {OFF} AS s_suppkey,
               s.* EXCLUDE (s_suppkey)
        FROM {src('supplier')} s CROSS JOIN {rep} r""")
    cp("part", f"""
        SELECT p.p_partkey + r.r * {OFF} AS p_partkey,
               p.* EXCLUDE (p_partkey)
        FROM {src('part')} p CROSS JOIN {rep} r""")
    cp("orders", f"""
        SELECT o.o_orderkey + r.r * {OFF} AS o_orderkey,
               o.o_custkey + r.r * {OFF} AS o_custkey,
               o.* EXCLUDE (o_orderkey, o_custkey)
        FROM {src('orders')} o CROSS JOIN {rep} r""")
    cp("lineitem", f"""
        SELECT l.l_orderkey + r.r * {OFF} AS l_orderkey,
               l.l_partkey + r.r * {OFF} AS l_partkey,
               l.l_suppkey + r.r * {OFF} AS l_suppkey,
               l.* EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM {src('lineitem')} l CROSS JOIN {rep} r""")
    for t in ("region", "nation"):
        cp(t, f"SELECT * FROM {src(t)}")


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (sys.argv[2] if len(sys.argv) > 2
           else f"/tmp/beats_spark_testdata_sf{sf:g}")
    build(sf, out)
