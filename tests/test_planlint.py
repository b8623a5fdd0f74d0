"""Plan linting: each rule triggers on a constructed offender and the
catalog-wide sweep enforces the two never-acceptable rules
(CartesianProduct, row-wise Python) across EVERY query's actual plan —
the executable form of the PLANS.md audit."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from beats_spark.planlint import assert_scale_safe, lint_plan


def _rules(findings):
    return {f["rule"] for f in findings}


def test_detects_cartesian(spark):
    a = spark.range(3)
    b = spark.range(3).withColumnRenamed("id", "jd")
    cross = a.crossJoin(b).filter("id + jd > 100")  # non-equi
    assert "cartesian" in _rules(lint_plan(cross)) \
        or "nested_loop" in _rules(lint_plan(cross))
    with pytest.raises(AssertionError, match="scale-unsafe"):
        assert_scale_safe(
            spark.range(3).hint("shuffle_replicate_nl").crossJoin(b),
            label="x")


def test_detects_row_wise_python_udf(spark):
    from pyspark.sql.functions import udf
    slow = udf(lambda x: x + 1, LongType(), useArrow=False)
    df = spark.range(5).select(slow("id").alias("y"))
    assert "python_row_udf" in _rules(lint_plan(df))
    with pytest.raises(AssertionError, match="python_row_udf"):
        assert_scale_safe(df)
    # Arrow-batched stages are NOT flagged
    ok = spark.range(5).mapInPandas(
        lambda it: it, "id long")
    assert "python_row_udf" not in _rules(lint_plan(ok))


def test_detects_single_partition_exchange(spark):
    from pyspark.sql import Window
    df = spark.range(10).withColumn(
        "r", F.row_number().over(Window.orderBy("id")))
    assert "single_partition" in _rules(lint_plan(df))
    # warn-severity: assert_scale_safe does not raise for it
    assert_scale_safe(df)
    # nested_loop is warn (the scalar-broadcast-attach shape is
    # bounded by construction) but still REPORTED for plan review
    b = spark.range(3).withColumnRenamed("id", "jd")
    nl = spark.range(3).join(b, F.col("id") < F.col("jd"), "inner")
    if "nested_loop" in _rules(lint_plan(nl)):
        assert_scale_safe(nl)


def test_clean_plan_has_no_findings(spark):
    df = (spark.range(100).withColumn("k", F.col("id") % 5)
          .groupBy("k").count())
    findings = [f for f in lint_plan(df)
                if f["rule"] != "single_partition"]
    assert findings == []


def test_catalog_sweep_no_silent_scale_killers(spark, sf_dir):
    """EVERY catalog query's plan must be free of CartesianProduct and
    row-wise Python. The documented-bounded exceptions carry their
    justification here, not buried in prose."""
    from beats_spark.queries import QUERIES
    # no allowances: CartesianProduct and row-wise Python must not
    # appear in ANY catalog plan (nested-loop broadcasts are
    # warn-severity and reviewed via PLANS.md instead)
    allowed = {}
    failures = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            assert_scale_safe(df, allow=allowed.get(name, ()),
                              label=name)
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # pragma: no cover - plan build issue
            failures.append(f"[{name}] plan build failed: {e}")
    assert not failures, "\n".join(failures)
