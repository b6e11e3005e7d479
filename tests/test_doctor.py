"""Plan-doctor detector contracts: each detector fires on a
deliberately-bad construction and stays silent on the healthy form."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from flink_application_spark.doctor import diagnose


def _codes(df):
    return {f.code for f in diagnose(df)}


def test_cartesian_detected(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    # crossJoin of two non-broadcastable-marked sides still plans BNLJ
    # under the default threshold; force a true cartesian via hint
    bad = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert "CARTESIAN" in _codes(bad)
    good = a.join(b, a.id == b.id2)
    assert "CARTESIAN" not in _codes(good)


def test_nested_loop_detected(spark):
    a = spark.range(10)
    b = spark.range(5).withColumnRenamed("id", "id2")
    bad = a.join(F.broadcast(b), a.id > b.id2)  # non-equi condition
    assert "NESTED_LOOP" in _codes(bad)


def test_global_window_detected(spark):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert "GLOBAL_WINDOW" in _codes(bad)
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert "GLOBAL_WINDOW" not in _codes(good)


def test_unpushed_filter_detected(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    @F.udf("boolean")
    def slow_pred(q):
        return q is not None and q > 10

    bad = df.filter(slow_pred(F.col("l_quantity")))
    assert "UNPUSHED_FILTER" in _codes(bad)
    good = df.filter(F.col("l_quantity") > 10)
    assert "UNPUSHED_FILTER" not in _codes(good)


def test_shuffle_budget(spark):
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    one = df.groupBy("k").count()
    assert not [
        f for f in diagnose(one, shuffle_ceiling=0) if f.code != "SHUFFLE_BUDGET"
    ]
    assert "SHUFFLE_BUDGET" in {
        f.code for f in diagnose(one, shuffle_ceiling=0)
    }
    assert "SHUFFLE_BUDGET" not in {
        f.code for f in diagnose(one, shuffle_ceiling=5)
    }


def test_healthy_flagships_have_no_errors(spark, sf_dir):
    """The reference pipeline and a TPC-H aggregate diagnose clean —
    no `error`-severity finding (warn-level allowlisted classes are
    judged by tests/test_plan_quality.py instead)."""
    from flink_application_spark.plans.registry import REGISTRY_GET

    for name in ("cdr_enrichment_full", "tpch_q1_pricing_summary"):
        df = REGISTRY_GET(name).spark(spark, sf_dir)
        errors = [f for f in diagnose(df) if f.severity == "error"]
        assert not errors, (name, errors)
