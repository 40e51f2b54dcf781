"""Partition pruning and bucketed co-located joins — the two
shuffle-avoidance levers a 100 TB layout depends on, asserted at the
plan level."""

import pytest

from arc_jupyter_spark.plans.pipeline import parse_pipeline, run_pipeline

from tests.conftest import SF_DIR


def test_partitioned_write_prunes_partitions(ctx, tmp_path):
    uri = str(tmp_path / "li_part")
    run_pipeline(parse_pipeline([
        {"type": "ParquetExtract", "name": "e",
         "inputURI": f"{SF_DIR}/lineitem.parquet", "outputView": "pp_src"},
        {"type": "ParquetLoad", "name": "l", "inputView": "pp_src",
         "outputURI": uri, "partitionBy": ["l_returnflag"]},
    ]), ctx)
    df = ctx.spark.read.parquet(uri).where("l_returnflag = 'R'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    # pruning is real: the pruned scan reads fewer files than the table
    all_parts = ctx.spark.read.parquet(uri)
    assert df.count() < all_parts.count()


def test_bucketed_tables_join_without_exchange(ctx, tmp_path):
    spark = ctx.spark
    warehouse_df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ctx.register(warehouse_df, "bk_lineitem_src")
    ctx.register(orders, "bk_orders_src")
    for view, table in (("bk_lineitem_src", "bk_lineitem"),
                        ("bk_orders_src", "bk_orders")):
        key = "l_orderkey" if "lineitem" in table else "o_orderkey"
        run_pipeline(parse_pipeline([
            {"type": "ParquetLoad", "name": f"load_{table}", "inputView": view,
             "outputURI": str(tmp_path / table), "tableName": table,
             "bucketBy": [key], "numBuckets": 4}]), ctx)
    joined = spark.table("bk_lineitem").join(
        spark.table("bk_orders"),
        spark.table("bk_lineitem").l_orderkey == spark.table("bk_orders").o_orderkey,
    )
    # disable broadcast so the co-located SMJ path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    assert "SortMergeJoin" in plan
    # bucket co-location: no shuffle exchange feeds the join
    assert "Exchange hashpartitioning" not in plan
    for t in ("bk_lineitem", "bk_orders"):
        ctx.spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_by_requires_table_name(ctx):
    from arc_jupyter_spark.operators.load import ParquetLoad

    stage = ParquetLoad(name="bad", input_view="pp_src",
                        output_uri="/tmp/x", bucket_by=("a",))
    with pytest.raises(ValueError, match="tableName"):
        stage.execute(ctx)


def test_aqe_splits_skewed_join_partitions(spark):
    """Skew evidence: a join keyed 80% onto one value must come out of
    AQE with skew=true on the sort-merge join — the runtime re-plan a
    100 TB pipeline leans on when salting wasn't pre-applied. Thresholds
    are scoped down so the fixture-sized shuffle trips the detector."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 8, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
