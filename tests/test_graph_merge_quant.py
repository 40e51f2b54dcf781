"""Unit tests for the round-2 additions: PageRank, MERGE upsert,
priority sampling, int8 quantization, leakage-safe split."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_jupyter_spark.operators.graph import pagerank
from arc_jupyter_spark.operators.joins import merge_upsert
from arc_jupyter_spark.operators.sampling import priority_sample
from arc_jupyter_spark.operators.similarity import (
    int_dot,
    quantize_int8,
    quantized_topk,
)


def test_pagerank_star_graph(spark):
    # star: 1..4 all point at 0 and 0 points back — node 0 must rank
    # highest; total rank is conserved up to integer-division dust.
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)],
        ["src", "dst"],
    )
    ranks = {r["node"]: r["rank_e9"] for r in pagerank(edges, iterations=5).collect()}
    assert len(ranks) == 5
    assert ranks[0] == max(ranks.values())
    leaves = [ranks[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1  # symmetry
    assert sum(ranks.values()) <= 10**9


def test_pagerank_deterministic_across_partitionings(spark):
    rows = [(i, (i * 7) % 23) for i in range(100)]
    e1 = spark.createDataFrame(rows, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(rows, ["src", "dst"]).repartition(13)
    r1 = sorted((r["node"], r["rank_e9"]) for r in pagerank(e1, iterations=3).collect())
    r2 = sorted((r["node"], r["rank_e9"]) for r in pagerank(e2, iterations=3).collect())
    assert r1 == r2


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25.0, "U"), (3, "c", 30.0, "D"), (9, "z", 90.0, "I")],
        ["k", "s", "v", "op"],
    )
    out = {r["k"]: (r["s"], r["v"]) for r in
           merge_upsert(base, changes, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 9: ("z", 90.0)}


def test_merge_upsert_composite_key(spark):
    base = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], ["a", "b", "v"])
    changes = spark.createDataFrame([(1, 2, "y2", "U")], ["a", "b", "v", "op"])
    out = sorted(
        (r["a"], r["b"], r["v"])
        for r in merge_upsert(base, changes, ["a", "b"]).collect()
    )
    assert out == [(1, 1, "x"), (1, 2, "y2")]


def test_priority_sample_weighted_and_deterministic(spark):
    rows = [(i, 10 if i % 10 else 10000) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = priority_sample(df, "id", "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["w"] == 10000)
    # 10% of rows are 1000x heavier — they must dominate the sample
    assert heavy > 50
    again = priority_sample(df, "id", "w", k=100).collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in again)


def test_priority_sample_zero_weight_excluded(spark):
    df = spark.createDataFrame([(1, 0), (2, 5), (3, 5)], ["id", "w"])
    got = sorted(r["id"] for r in priority_sample(df, "id", "w", k=2).collect())
    assert got == [2, 3]


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])], ["id", "v"]
    )
    out = {r["id"]: r["q"] for r in
           df.select("id", quantize_int8(F.col("v")).alias("q")).collect()}
    assert out[1] == [64, -127, 32]  # floor(±x*127/1.0 + .5)
    assert out[2] == [0, 0, 0]
    assert all(-127 <= x <= 127 for x in out[1])


def test_int_dot_exact(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    got = df.select(
        int_dot(
            F.array(F.lit(3), F.lit(-2), F.lit(7)),
            F.array(F.lit(10), F.lit(5), F.lit(1)),
        ).alias("d")
    ).first()["d"]
    assert got == 3 * 10 - 2 * 5 + 7


def test_quantized_topk_matches_exact_on_separable_data(spark):
    # query equals corpus vector 0; quantized scoring must still rank
    # the identical vector first
    vecs = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
            (2, [0.9, 0.1, 0.0]), (3, [-1.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = quantized_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert got[0]["vec_id"] == 0
    assert got[1]["vec_id"] == 2


def test_p05_split_covers_all_docs_and_no_leakage(spark):
    from tests.conftest import SF_DIR

    from arc_jupyter_spark.workloads import queries

    rows = queries()["p05_split_leakage_safe"](spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == docs
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
