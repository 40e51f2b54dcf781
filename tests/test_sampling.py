"""Deterministic sampling / data-mixing operators."""

from pyspark.sql import functions as F

from arc_jupyter_spark.operators import sampling


def _docs(spark):
    rows = [(i, "ab"[i % 2], (i % 7) + 1) for i in range(200)]
    return spark.createDataFrame(rows, ["id", "stratum", "cost"])


def test_stratified_sample_deterministic(spark):
    df = _docs(spark)
    a = sampling.stratified_sample(df, "stratum", {"a": 0.5}, "id").collect()
    b = sampling.stratified_sample(df, "stratum", {"a": 0.5}, "id").collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)


def test_stratified_sample_rates(spark):
    df = _docs(spark)
    out = sampling.stratified_sample(
        df, "stratum", {"a": 1.0, "b": 0.0}, "id"
    )
    got = {r["stratum"] for r in out.collect()}
    assert got == {"a"}
    n_a = out.count()
    assert n_a == 100  # rate 1.0 keeps every 'a' row


def test_stratified_sample_monotone_in_rate(spark):
    df = _docs(spark)
    small = {
        r["id"]
        for r in sampling.stratified_sample(df, "stratum", {}, "id", 0.25).collect()
    }
    big = {
        r["id"]
        for r in sampling.stratified_sample(df, "stratum", {}, "id", 0.75).collect()
    }
    assert small <= big
    assert len(small) < len(big)


def test_budget_select_exact(spark):
    rows = [
        ("s", 1, 40), ("s", 2, 40), ("s", 3, 40),
        ("t", 4, 90), ("t", 5, 90),
    ]
    df = spark.createDataFrame(rows, ["part", "id", "cost"])
    out = sampling.budget_select(
        df, "part", [F.col("id")], F.col("cost"), budget=100
    )
    got = sorted((r["part"], r["id"], r["running_cost"]) for r in out.collect())
    # s: 40, 80, (120 > 100 dropped); t: 90, (180 dropped)
    assert got == [("s", 1, 40), ("s", 2, 80), ("t", 4, 90)]


def test_mixture_allocation_upweights_small_groups(spark):
    rows = [(i, "big" if i < 180 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = {r["lang"]: r.asDict() for r in
           sampling.mixture_allocation(df, "lang").collect()}
    assert out["big"]["n_docs"] == 180 and out["small"]["n_docs"] == 20
    # alpha=0.5: weights proportional to sqrt(count), so the small
    # group's share (sqrt20/(sqrt180+sqrt20) ~ 0.25) beats its raw
    # share (0.1)
    assert abs(out["small"]["weight"] - 0.25) < 0.01
    assert abs(sum(v["weight"] for v in out.values()) - 1.0) < 1e-9
    # weight_e6 is the exact integer ppm of the same ratio (the
    # hash-safe form workload t12 emits)
    for v in out.values():
        assert v["weight_e6"] == int(v["weight"] * 1_000_000) or abs(
            v["weight_e6"] - v["weight"] * 1_000_000
        ) < 1
    assert sum(v["weight_e6"] for v in out.values()) <= 1_000_000
    # total allocation ~= 40% of corpus (integer floors may undershoot)
    total_alloc = sum(v["alloc_docs"] for v in out.values())
    assert 76 <= total_alloc <= 80
    # sampling rate threshold realizes alloc/n, capped at full keep
    assert out["small"]["threshold"] == min(
        4096, 4096 * out["small"]["alloc_docs"] // 20
    )


def test_mixture_allocation_deterministic(spark):
    rows = [(i, chr(97 + i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    a = sorted(map(tuple, sampling.mixture_allocation(df, "lang").collect()))
    b = sorted(map(tuple, sampling.mixture_allocation(df, "lang").collect()))
    assert a == b


def test_pack_sequences_bin_spans(spark):
    # capacity 10; source s costs 4,4,4 -> running 4,8,12:
    #   doc 0 [0,4)  -> bins 0..0
    #   doc 1 [4,8)  -> bins 0..0
    #   doc 2 [8,12) -> bins 0..1 (straddles the boundary)
    rows = [("s", 0, 4), ("s", 1, 4), ("s", 2, 4),
            ("t", 0, 25),               # longer than capacity: spans 0..2
            ("t", 1, 0)]                # zero-cost doc sits at a boundary
    df = spark.createDataFrame(rows, ["src", "id", "cost"])
    out = {
        (r["src"], r["id"]): (r["start_bin"], r["end_bin"])
        for r in sampling.pack_sequences(
            df, "src", [F.col("id")], F.col("cost"), capacity=10
        ).collect()
    }
    assert out[("s", 0)] == (0, 0)
    assert out[("s", 1)] == (0, 0)
    assert out[("s", 2)] == (0, 1)
    assert out[("t", 0)] == (0, 2)
    assert out[("t", 1)] == (2, 2)  # zero-cost: start == end


def test_pack_sequences_partitions_independent(spark):
    rows = [(chr(97 + s), i, 7) for s in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, ["src", "id", "cost"])
    got = sampling.pack_sequences(
        df, "src", [F.col("id")], F.col("cost"), capacity=10
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append((r["id"], r["start_bin"], r["end_bin"]))
    # every source packs identically (same costs, independent streams)
    vals = [sorted(v) for v in by_src.values()]
    assert vals[0] == vals[1] == vals[2]
    # 5 docs x 7 tokens = 35 tokens -> bins 0..3 used
    assert max(e for _, _, e in vals[0]) == 3


def test_pack_sequences_invariants_random(spark):
    """Packing invariants over randomized cost vectors: spans are
    well-formed and consecutive, total bins cover exactly the token
    stream, and a doc's span width matches its cost."""
    import random

    rng = random.Random(20260813)
    rows = [
        (f"s{g}", i, rng.randint(0, 37))
        for g in range(4)
        for i in range(rng.randint(1, 40))
    ]
    cap = 16
    df = spark.createDataFrame(rows, ["src", "id", "cost"])
    got = sampling.pack_sequences(
        df, "src", [F.col("id")], F.col("cost"), capacity=cap
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["id"])
        running = 0
        prev_end = 0
        for r in rs:
            assert 0 <= r["start_bin"] <= r["end_bin"]
            # a doc starts in the bin its first token falls in
            assert r["start_bin"] == running // cap
            running += r["cost"]
            if r["cost"] > 0:
                assert r["end_bin"] == (running - 1) // cap
                # spans never go backwards
                assert r["start_bin"] >= prev_end - 1
                prev_end = r["end_bin"]
        if running > 0:
            # last used bin is exactly ceil(total/cap) - 1
            assert max(r["end_bin"] for r in rs) == (running - 1) // cap


def test_shard_assign_deterministic_and_complete(spark):
    df = spark.range(200).withColumnRenamed("id", "k")
    out = sampling.shard_assign(df, "k", 8)
    rows = {r["k"]: r["shard"] for r in out.collect()}
    rows2 = {r["k"]: r["shard"] for r in out.collect()}
    assert rows == rows2                      # reproducible
    assert set(rows.values()) <= set(range(8))
    assert len(rows) == 200                   # no row lost
    # balance: no shard more than 3x the mean on 200 uniform keys
    from collections import Counter
    sizes = Counter(rows.values())
    assert max(sizes.values()) <= 3 * (200 / 8)


def test_shard_assign_repartition_plan(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    out = sampling.shard_assign(df, "k", 4, repartition=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(shard" in plan


def _clustered(spark, sizes):
    rows = []
    nid = 0
    for cid, n in sizes.items():
        for _ in range(n):
            rows.append((nid, cid))
            nid += 1
    return spark.createDataFrame(rows, ["id", "cluster"])


def test_cluster_balanced_sample_caps_dominant_cluster(spark):
    # cluster 0 dominates; share = 300 DIV 4 = 75, so cluster 0 is
    # downsampled toward ~75 while the small clusters keep everything
    df = _clustered(spark, {0: 280, 1: 12, 2: 8})
    kept = sampling.cluster_balanced_sample(df, "cluster", "id", budget_den=4)
    by = {
        r["cluster"]: r["n"]
        for r in kept.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by[1] == 12 and by[2] == 8  # thr = 4096 (kept whole)
    # hash-bucket sampling at rate 4096*75//280 = 1097/4096 ~ 0.268
    assert 40 <= by[0] <= 110
    assert by[0] < 280


def test_cluster_balanced_sample_nested_in_budget(spark):
    # growing the budget share must only ADD rows (thresholds grow)
    df = _clustered(spark, {0: 150, 1: 50})
    small = sampling.cluster_balanced_sample(df, "cluster", "id", budget_den=8)
    big = sampling.cluster_balanced_sample(df, "cluster", "id", budget_den=2)
    small_ids = {r["id"] for r in small.collect()}
    big_ids = {r["id"] for r in big.collect()}
    assert small_ids <= big_ids


def test_cluster_balanced_sample_precomputed_counts(spark):
    df = _clustered(spark, {0: 100, 1: 30})
    counts = df.groupBy("cluster").agg(F.count(F.lit(1)).alias("__cb_n_c"))
    a = sorted(r["id"] for r in sampling.cluster_balanced_sample(
        df, "cluster", "id", budget_den=4).collect())
    b = sorted(r["id"] for r in sampling.cluster_balanced_sample(
        df, "cluster", "id", budget_den=4, counts=counts).collect())
    assert a == b
