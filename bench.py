#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline workload at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default
32) and print ONE JSON line::

    {"metric": "flagship_pages_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...}

The headline metric is the north_star's end-to-end parse→enrich→route
throughput in pages/sec over the deterministic synthetic pages table
(``beats_spark.fixtures.pages`` — same generator at any scale; the
sf dir sizes the page count). Catalog queries from
``beats_spark.queries`` are timed individually at the sf dir.

``--scaling`` mode: run the SAME flagship job at two parallelism
levels (local[8] and local[32] by default) in separate JVMs on
identical input and report throughput at both plus scaling efficiency
``(thr_hi / thr_lo) / (hi / lo)`` — the in-sandbox proxy for the
north_rule's N→4N executor criterion (see BASELINE.md). Results are
appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages for the throughput leg: proportional to sf (sf0.1 → 200k pages)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", int(2_000_000 * _SF)))

# catalog queries timed per round (a representative spread: scan-agg,
# broadcast join, window, Arrow-UDF parse, dedup-join, ANN, text stats)
BENCH_QUERIES = [
    "tpch_q1", "enrich_join", "router_fanout", "timestamp_hist",
    "rate_limit", "dissect_extract", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "text_quality", "token_count",
    "flagship_routed_counts",
]


def _session(cpus: int):
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("beats_spark_bench")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def flagship_throughput(spark, n_pages: int, cpus: int) -> dict:
    """End-to-end parse→enrich→route over n_pages synthetic pages;
    returns pages/sec (the BASELINE.json metric)."""
    from pyspark.sql import functions as F
    from beats_spark.fixtures import pages, host_meta, lang_meta
    from beats_spark.pipeline import build_routed

    pg = pages(spark, n_pages, partitions=cpus * 2)
    hm, lm = host_meta(spark), lang_meta(spark)
    # warm the tiny lookup frames so their planning isn't in the timing
    hm.count(), lm.count()
    t0 = time.time()
    routed = build_routed(pg, hm, lm)
    counts = {r["sink"]: r["n"] for r in
              routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n"))
                    .collect()}
    dt = time.time() - t0
    return {"pages": n_pages, "seconds": round(dt, 3),
            "pages_per_sec": round(n_pages / dt, 1),
            "events": sum(counts.values()), "sink_counts": counts}


def run_default() -> dict:
    spark = _session(CPUS)
    from beats_spark.queries import QUERIES

    fl = flagship_throughput(spark, N_PAGES, CPUS)

    qtimes = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)

    return {
        "metric": "flagship_pages_per_sec",
        "value": fl["pages_per_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": _SF,
        "cpus": CPUS,
        "flagship": fl,
    }


def run_scaling(lo: int = 8, hi: int = 32) -> dict:
    """Same flagship job, two parallelism levels, separate JVMs."""
    out = {}
    for cpus in (lo, hi):
        env = dict(os.environ,
                   SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_BENCH_PAGES=str(N_PAGES),
                   PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-only"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)
    thr_lo = out[lo]["pages_per_sec"]
    thr_hi = out[hi]["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cpus": lo, "hi_cpus": hi,
        "lo_pages_per_sec": thr_lo, "hi_pages_per_sec": thr_hi,
        "pages": N_PAGES, "sf": _SF,
    }


def main():
    if "--flagship-only" in sys.argv:
        spark = _session(CPUS)
        print(json.dumps(flagship_throughput(spark, N_PAGES, CPUS)))
        return
    if "--scaling" in sys.argv:
        res = run_scaling()
        print(json.dumps(res))
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH.md"), "a") as f:
            f.write(
                f"\n## scaling run ({time.strftime('%Y-%m-%d %H:%M')}, "
                f"{res['pages']} pages, sf={res['sf']})\n\n"
                f"| parallelism | pages/sec |\n|---|---|\n"
                f"| local[{res['lo_cpus']}] | {res['lo_pages_per_sec']} |\n"
                f"| local[{res['hi_cpus']}] | {res['hi_pages_per_sec']} |\n\n"
                f"scaling efficiency (N→4N proxy): **{res['value']}** "
                f"(target ≥0.8 per BASELINE.json north_rule)\n")
        return
    print(json.dumps(run_default()))


if __name__ == "__main__":
    main()
