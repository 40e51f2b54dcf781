"""asof_join operator: semantics vs a hand-checked fixture."""

from arc_jupyter_spark.operators.joins import asof_join


def test_asof_join_strict(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("B", 15, 3), ("A", 5, 4)],
        ["sym", "t", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 18, 102.0), ("B", 14, 50.0)],
        ["sym", "t", "px"],
    )
    out = asof_join(trades, quotes, on="t", by="sym")
    got = {r["trade_id"]: r["asof_px"] for r in out.collect()}
    # t=10 strict: quote at t=10 NOT visible → t=8 quote
    assert got == {1: 100.0, 2: 102.0, 3: 50.0, 4: None}


def test_asof_join_non_strict(spark):
    trades = spark.createDataFrame([("A", 10, 1)], ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0)], ["sym", "t", "px"]
    )
    out = asof_join(trades, quotes, on="t", by="sym", strict=False)
    assert out.first()["asof_px"] == 101.0


def test_asof_join_single_shuffle_no_range_join(spark):
    trades = spark.createDataFrame([("A", 10, 1)], ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame([("A", 8, 100.0)], ["sym", "t", "px"])
    plan = asof_join(trades, quotes, on="t", by="sym")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window-based, not a join node
    assert plan.count("Exchange hashpartitioning") <= 1


def test_salted_join_equals_plain_join(spark):
    from arc_jupyter_spark.operators.joins import salted_join
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, i) for i in range(5)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "name"])
    got = sorted(map(tuple, salted_join(fact, dim, "k", salts=4).collect()))
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want


def test_salted_join_left_preserves_unmatched(spark):
    from arc_jupyter_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, 10), (9, 90)], ["k", "v"])
    dim = spark.createDataFrame([(1, "a")], ["k", "name"])
    rows = {r["k"]: r["name"] for r in
            salted_join(fact, dim, "k", salts=4, how="left").collect()}
    assert rows == {1: "a", 9: None}


def test_salted_join_rejects_right(spark):
    from arc_jupyter_spark.operators.joins import salted_join
    import pytest

    fact = spark.createDataFrame([(1, 10)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_join(fact, fact, "k", how="right")


def test_delta_join_maintenance_identity(spark):
    """Δ(A⋈B) over inserts: (old join) ∪ (maintained delta) must equal
    the full recomputed join exactly, with no duplicates."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import joins

    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(10)], "k bigint, av string"
    )
    b = spark.createDataFrame(
        [(k % 5, f"b{i}") for i, k in enumerate(range(12))], "k bigint, bv string"
    )
    is_new_a = F.col("k") >= 8
    is_new_b = F.col("bv").isin("b0", "b7")
    a_old, da = a.where(~is_new_a), a.where(is_new_a)
    b_old, db = b.where(~is_new_b), b.where(is_new_b)
    delta = joins.delta_join_maintenance(a_old, da, b_old, db, on=["k"])
    incremental = a_old.join(b_old, "k").unionByName(delta)
    full = a.join(b, "k")
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_asof_join_forward_and_tolerance(spark):
    from pyspark.sql import Row, functions as F

    from arc_jupyter_spark.operators import joins

    left = spark.createDataFrame(
        [Row(k="a", t=10, i=1), Row(k="a", t=20, i=2), Row(k="b", t=5, i=3)]
    )
    right = spark.createDataFrame(
        [Row(k="a", t=12, v="x"), Row(k="a", t=40, v="y"), Row(k="b", t=5, v="z")]
    )
    fwd = {
        r["i"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, on="t", by="k", direction="forward", strict=False
        ).collect()
    }
    # i=1 -> next right at 12; i=2 -> 40; i=3 -> simultaneous z visible
    assert fwd == {1: "x", 2: "y", 3: "z"}
    fwd_strict = {
        r["i"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, on="t", by="k", direction="forward", strict=True
        ).collect()
    }
    assert fwd_strict[3] is None  # simultaneous row excluded
    tol = {
        r["i"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, on="t", by="k", direction="forward",
            strict=False, tolerance=5,
        ).collect()
    }
    # i=2's match at 40 is 20 away -> nulled by tolerance
    assert tol == {1: "x", 2: None, 3: "z"}


def test_asof_join_nearest(spark):
    from pyspark.sql import Row

    from arc_jupyter_spark.operators import joins

    left = spark.createDataFrame(
        [Row(k="a", t=10, i=1), Row(k="a", t=100, i=2), Row(k="a", t=3, i=3)]
    )
    right = spark.createDataFrame(
        [Row(k="a", t=8, v="b8"), Row(k="a", t=13, v="f13"), Row(k="a", t=90, v="b90")]
    )
    near = {
        r["i"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, on="t", by="k", direction="nearest", strict=False
        ).collect()
    }
    # i=1: back gap 2 (8) vs fwd gap 3 (13) -> b8
    # i=2: back gap 10 (90), no fwd -> b90
    # i=3: no back, fwd 8 -> b8
    assert near == {1: "b8", 2: "b90", 3: "b8"}
    # equal gaps tie -> backward (pandas semantics)
    left2 = spark.createDataFrame([Row(k="a", t=10, i=1)])
    right2 = spark.createDataFrame(
        [Row(k="a", t=8, v="back"), Row(k="a", t=12, v="fwd")]
    )
    r = joins.asof_join(
        left2, right2, on="t", by="k", direction="nearest", strict=False
    ).first()
    assert r["asof_v"] == "back"
    # tolerance cuts the far side: i=2's 10-away match nulled at tol 5
    tol = {
        r["i"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, on="t", by="k", direction="nearest",
            strict=False, tolerance=5,
        ).collect()
    }
    assert tol == {1: "b8", 2: None, 3: "b8"}


def test_asof_join_subsecond_timestamps(spark):
    """Tolerance and nearest gaps keep sub-second precision: the old
    unix_timestamp() path truncated to whole seconds, so a match 1.5s
    away passed a tolerance of 1 (ADVICE round-3, medium)."""
    from pyspark.sql import Row, functions as F

    from arc_jupyter_spark.operators import joins

    mk = F.col("s").cast("timestamp")
    left = spark.createDataFrame(
        [Row(k="a", s="2024-01-01 00:00:10.400", i=1)]
    ).select("k", "i", mk.alias("t"))
    right = spark.createDataFrame(
        [
            Row(k="a", s="2024-01-01 00:00:08.900", v="back1500ms"),
            Row(k="a", s="2024-01-01 00:00:10.000", v="back400ms"),
        ]
    ).select("k", "v", mk.alias("t"))
    # truncation would see gaps of 2s/0s; real gaps are 1.5s/0.4s
    r = joins.asof_join(
        left, right, on="t", by="k", tolerance=0.5, strict=False
    ).first()
    assert r["asof_v"] == "back400ms"
    r = joins.asof_join(
        left,
        right.where(F.col("v") == "back1500ms"),
        on="t", by="k", tolerance=1.0, strict=False,
    ).first()
    assert r["asof_v"] is None  # 1.5s gap > 1.0s tolerance
    # nearest: fwd 0.3s beats back 0.4s only with fractional gaps
    right2 = spark.createDataFrame(
        [
            Row(k="a", s="2024-01-01 00:00:10.000", v="back"),
            Row(k="a", s="2024-01-01 00:00:10.700", v="fwd"),
        ]
    ).select("k", "v", mk.alias("t"))
    r = joins.asof_join(
        left, right2, on="t", by="k", direction="nearest", strict=False
    ).first()
    assert r["asof_v"] == "fwd"


def test_asof_join_date_on(spark):
    """DateType `on` gets real gaps (in seconds) instead of NULLs."""
    import datetime

    from pyspark.sql import Row

    from arc_jupyter_spark.operators import joins

    d = datetime.date
    left = spark.createDataFrame([Row(k="a", t=d(2024, 1, 10), i=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", t=d(2024, 1, 7), v="3days"),
            Row(k="a", t=d(2024, 1, 1), v="9days"),
        ]
    )
    r = joins.asof_join(
        left, right, on="t", by="k", tolerance=4 * 86400, strict=False
    ).first()
    assert r["asof_v"] == "3days"
    r = joins.asof_join(
        left, right, on="t", by="k", tolerance=2 * 86400, strict=False
    ).first()
    assert r["asof_v"] is None


def test_asof_join_rejects_gapless_on():
    """String `on` cannot produce gaps: tolerance/nearest raise
    instead of silently nulling matches (ADVICE round-3, low)."""
    import pytest
    from pyspark.sql import Row, SparkSession

    from arc_jupyter_spark.operators import joins

    spark = SparkSession.builder.getOrCreate()
    left = spark.createDataFrame([Row(k="a", t="x", i=1)])
    right = spark.createDataFrame([Row(k="a", t="w", v="v")])
    with pytest.raises(ValueError, match="tolerance/nearest"):
        joins.asof_join(left, right, on="t", by="k", tolerance=1.0)
    with pytest.raises(ValueError, match="tolerance/nearest"):
        joins.asof_join(left, right, on="t", by="k", direction="nearest")


def test_q89_scd2_intervals_hand_example(spark):
    """Tiny SCD2 fixture: intervals close at the user's next event,
    the last stays open, durations are exact microseconds."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 10:00:00", 7, "a"),
        (2, "2024-01-01 10:00:10", 7, "b"),
        (3, "2024-01-01 10:01:10", 7, "a"),
        (4, "2024-01-01 09:00:00", 8, "b"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type"]
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    ).createOrReplaceTempView("q89_fixture")

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = spark.table("q89_fixture").withColumn(
        "valid_to", F.lead("ts").over(w)
    )
    closed = F.when(
        F.col("valid_to").isNotNull(),
        F.unix_micros("valid_to") - F.unix_micros("ts"),
    ).otherwise(F.lit(0).cast("bigint"))
    got = {
        r["event_type"]: (r["n_intervals"], r["n_open"], r["closed_us"])
        for r in seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("valid_to").isNull().cast("bigint")).alias("n_open"),
            F.sum(closed).alias("closed_us"),
        )
        .collect()
    }
    # user 7: a@10:00:00 closed by b (+10s), b@10:00:10 closed by a
    # (+60s), a@10:01:10 open; user 8: b open
    assert got["a"] == (2, 1, 10_000_000)
    assert got["b"] == (2, 1, 60_000_000)
