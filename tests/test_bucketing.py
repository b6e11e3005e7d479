"""Bucketed co-located join: the write-once-shuffle-never plan.

Asserts the physical property that justifies bucketing at 100 TB —
a fact-fact equi-join over two tables bucketed on the join key plans
with ZERO Exchange nodes (vs 2 for plain parquet), while producing
identical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.operators.bucketed import bucketed_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_elides_exchanges(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_bucketed", str(tmp_path / "li"), 8, "l_orderkey")
    write_bucketed(o, "o_bucketed", str(tmp_path / "o"), 8, "o_orderkey")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cond = F.col("l_orderkey") == F.col("o_orderkey")
        bucketed = bucketed_join(spark, "li_bucketed", "o_bucketed", cond)
        plain = li.join(o, cond)

        bp, pp = _plan(bucketed), _plan(plain)
        assert bp.count("Exchange") == 0, bp
        assert "SortMergeJoin" in bp
        assert pp.count("Exchange") == 2, pp

        got = bucketed.groupBy("l_orderkey").count()
        want = plain.groupBy("l_orderkey").count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
