"""Count-min sketch and Z-order layout operators."""

from pyspark.sql import functions as F

from arc_jupyter_spark.operators import layout, sketch


def test_count_min_never_undercounts(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]], ["k"]
    )
    cms = sketch.count_min_build(df, "k", depth=4, width=64)
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["estimate"]
        for r in sketch.count_min_estimate(cms, probes, "k", depth=4, width=64).collect()
    }
    exact = {"a": 5, "b": 3, "c": 2, "d": 1}
    for k, n in exact.items():
        assert est[k] >= n  # the one-sided sketch guarantee


def test_count_min_exact_when_sparse(spark):
    # far fewer keys than buckets -> collisions are unlikely; with
    # depth 4 the min over rows is exact for this fixture
    df = spark.createDataFrame([(f"k{i}",) for i in range(10)], ["k"])
    cms = sketch.count_min_build(df, "k", depth=4, width=1024)
    est = sketch.count_min_estimate(
        cms, df.distinct(), "k", depth=4, width=1024
    ).collect()
    assert all(r["estimate"] == 1 for r in est)


def test_count_min_mergeable(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["k"])
    b = spark.createDataFrame([("x",), ("z",)], ["k"])
    merged = (
        sketch.count_min_build(a, "k", depth=2, width=32)
        .unionAll(sketch.count_min_build(b, "k", depth=2, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    both = sketch.count_min_build(a.unionAll(b), "k", depth=2, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_count_min_weighted(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 1)], ["k", "w"])
    cms = sketch.count_min_build(df, "k", weight_col="w", depth=3, width=64)
    est = {
        r["k"]: r["estimate"]
        for r in sketch.count_min_estimate(
            cms, df.select("k").distinct(), "k", depth=3, width=64
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1


def test_zorder_key_interleaves(spark):
    # x=0b11, y=0b00 -> bits of x at even positions: 0b0101 = 5
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], ["x", "y"])
    vals = [
        r["z"]
        for r in df.select(
            layout.zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    ]
    assert vals == [0b0101, 0b1010, 0b1111]


def test_zorder_sql_matches_column_form(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    both = df.select(
        layout.zorder_key([F.col("x"), F.col("y")], bits=4).alias("a"),
        F.expr(layout.zorder_sql(["x", "y"], bits=4)).alias("b"),
    )
    assert both.where(F.col("a") != F.col("b")).count() == 0


def test_repartition_zordered_tiles_both_dims(spark, tmp_path):
    # 4096 points over a 64x64 grid -> 16 range partitions; every
    # written file must cover a narrow envelope in BOTH dims (a plain
    # x-sort leaves the y envelope at full width)
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = str(tmp_path / "zordered")
    layout.repartition_zordered(
        df, [F.col("x"), F.col("y")], num_partitions=16, bits=6
    ).write.parquet(out)
    per_file = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    for r in per_file:
        assert r["xr"] <= 31 and r["yr"] <= 31, per_file


def test_hll_shard_merge_close_to_full_and_exact(spark):
    from arc_jupyter_spark.operators.sketch import hll_shard_estimate

    df = spark.createDataFrame([(i % 137,) for i in range(3000)], ["k"])
    row = hll_shard_estimate(df, "k", num_shards=4).first()
    assert row["n_exact"] == 137
    assert abs(row["n_merged_estimate"] - row["n_full_estimate"]) <= 137 * 0.02
    assert abs(row["n_merged_estimate"] - 137) <= 137 * 0.05


def test_hll_shard_estimate_stable_across_partitionings(spark):
    # NOT exact equality: DataSketches HLL merges drop the
    # order-dependent HIP accumulator, so layout shifts the estimate
    # by a fraction of a percent; the contract is a tolerance.
    from arc_jupyter_spark.operators.sketch import hll_shard_estimate

    rows = [(i * 31 % 997,) for i in range(5000)]
    a = hll_shard_estimate(
        spark.createDataFrame(rows, ["k"]).repartition(1), "k"
    ).first()
    b = hll_shard_estimate(
        spark.createDataFrame(rows, ["k"]).repartition(17), "k"
    ).first()
    assert abs(a["n_merged_estimate"] - b["n_merged_estimate"]) <= 997 * 0.02


def test_hist_quantile_merge_and_lookup(spark):
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import sketch

    # values 0..99 -> 10 bins of width 10; shards must merge exactly
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "v bigint, s int")
    sharded = sketch.hist_build(df, F.col("v"), 0, 99, 10, shard=F.col("s"))
    merged = sketch.hist_merge(sharded)
    direct = sketch.hist_build(df, F.col("v"), 0, 99, 10)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    got = {
        r["q_label"]: (r["bin"], r["bin_lo"], r["cum_n"], r["n_total"])
        for r in sketch.hist_quantile_bins(
            merged, [("p50", 1, 2), ("p90", 9, 10)], 0, 99, 10
        ).collect()
    }
    # rank ceil(100*0.5)=50 -> bin 4 (v=49 is rank 50), cum 50
    assert got["p50"] == (4, 40, 50, 100)
    # rank 90 -> bin 8 (v=89), cum 90
    assert got["p90"] == (8, 80, 90, 100)


def test_hist_build_clamps_outliers(spark):
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import sketch

    df = spark.createDataFrame([(-5,), (500,), (50,)], "v bigint")
    h = {r["bin"]: r["n"] for r in sketch.hist_build(df, F.col("v"), 0, 99, 10).collect()}
    assert h == {0: 1, 9: 1, 5: 1}


def test_hist_quantile_empty_quantiles_raises(spark):
    import pytest

    from arc_jupyter_spark.operators import sketch

    hist = spark.createDataFrame([(0, 5)], "bin long, n long")
    with pytest.raises(ValueError, match="non-empty"):
        sketch.hist_quantile_bins(hist, [], lo=0, hi=99)
