"""End-to-end training export (dataops/export.py): partitioned
output, leak-free splits, packing integrity."""

import os

from pyspark.sql import functions as F

from beats_spark.dataops.export import export_training_set


def test_export_training_set(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "train_set")
    counts = export_training_set(docs, out, budget=256)

    df = spark.read.parquet(out)
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == df.count() > 0
    assert counts["train"] > counts.get("val", 0)
    # partition layout
    assert any(d.startswith("split=") for d in os.listdir(out))
    # bins respect the budget except oversized singletons
    per_bin = (df.groupBy("split", "bin")
               .agg(F.sum("n_tokens").alias("t"),
                    F.count(F.lit(1)).alias("k")).collect())
    for r in per_bin:
        assert r["t"] <= 256 or r["k"] == 1
    # leak-free: no cluster straddles two splits
    sides = (df.groupBy("__cluster")
             .agg(F.countDistinct("split").alias("s")).collect())
    assert all(r["s"] == 1 for r in sides)
    # survivors are deduplicated (one per cluster)
    per_cluster = df.groupBy("__cluster").count().collect()
    assert all(r["count"] == 1 for r in per_cluster)
