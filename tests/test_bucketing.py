"""Bucketing = the 100 TB co-location story (SCALE.md): two tables
bucketed on the join key must join with NO shuffle exchange on either
side. This is what "Iceberg bucketed by cell" buys at scale; local
Spark's bucketed tables demonstrate the identical plan property.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from esri_dump_spark.kernels.cells import cell_sql_expr


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_cell_join_has_no_exchange(spark, sf_dir, tmp_path):
    from esri_dump_spark.functions.geo_sql import derived_lonlat_sql
    lon, lat = derived_lonlat_sql("o_orderkey")
    pts = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .selectExpr("o_orderkey", f"{lon} AS lon", f"{lat} AS lat")
           .withColumn("cell", F.expr(cell_sql_expr("lon", "lat", 6))))

    spark.sql("DROP TABLE IF EXISTS pts_a")
    spark.sql("DROP TABLE IF EXISTS pts_b")
    (pts.write.bucketBy(8, "cell").sortBy("cell")
        .option("path", str(tmp_path / "pts_a")).saveAsTable("pts_a"))
    (pts.selectExpr("o_orderkey AS other_key", "cell")
        .write.bucketBy(8, "cell").sortBy("cell")
        .option("path", str(tmp_path / "pts_b")).saveAsTable("pts_b"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = spark.table("pts_a"), spark.table("pts_b")
        joined = a.join(b, "cell").groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"))
        plan = _physical(joined)
        # co-located bucketed join: sort-merge with NO shuffle of
        # either side (only the tiny post-agg exchange remains)
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, plan

        # sanity: the same join on unbucketed data shuffles both sides
        plain = pts.join(pts.selectExpr("o_orderkey AS other_key", "cell"),
                         "cell")
        assert _physical(plain).count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pts_a")
        spark.sql("DROP TABLE IF EXISTS pts_b")
