"""Embedding similarity: exact cosine top-k vs numpy, batch top-k,
IVF cell assignment."""

import numpy as np
from pyspark.sql import functions as F

from arc_jupyter_spark.operators import similarity

RNG = np.random.default_rng(7)
N, D = 60, 8
VECS = RNG.normal(size=(N, D)).astype(float)
QUERY = RNG.normal(size=D).astype(float)


def corpus(spark):
    rows = [(i, [float(x) for x in VECS[i]]) for i in range(N)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def numpy_topk(k):
    sims = VECS @ QUERY / (np.linalg.norm(VECS, axis=1) * np.linalg.norm(QUERY))
    order = sorted(range(N), key=lambda i: (-sims[i], i))
    return [(i, sims[i]) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark):
    got = similarity.cosine_topk(corpus(spark), QUERY, k=5).collect()
    want = numpy_topk(5)
    assert [r["vec_id"] for r in got] == [i for i, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["cosine"] - s) < 1e-9


def test_cosine_topk_batch_per_query(spark):
    queries = spark.createDataFrame(
        [(101, [float(x) for x in QUERY]), (102, [float(x) for x in VECS[0]])],
        ["query_id", "embedding"],
    )
    got = similarity.cosine_topk_batch(corpus(spark), queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {101, 102}
    assert all(len(v) == 3 for v in by_q.values())
    # query 102 IS corpus vector 0 -> its own top hit with cosine 1
    top = max(by_q[102], key=lambda r: r["cosine"])
    assert top["vec_id"] == 0 and abs(top["cosine"] - 1.0) < 1e-9


def test_assign_ivf_cells_nearest_centroid(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["centroid_id", "centroid"]
    )
    pts = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9])], ["vec_id", "embedding"]
    )
    got = {r["vec_id"]: r["cell"] for r in
           similarity.assign_ivf_cells(pts, cents).collect()}
    assert got == {1: 0, 2: 1}


def test_ivf_recall_against_brute_force(spark):
    """IVF with n_probe=3 of 8 cells must recover most of the exact
    top-10 (recall gate for the approximate path). s02 itself now
    returns the recall-contract row, so assert that directly."""
    from arc_jupyter_spark.workloads.base import QUERIES

    row = QUERIES["s02_ivf_topk"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_results"] == 10
    assert row["all_in_exact_top50"], "IVF returned an id outside exact top-50"
    assert row["recall_at_10_ok"], "IVF recall@10 below 0.7"


def test_hyperplane_signature_deterministic_and_bounded(spark):
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = S.hyperplane_planes(64, n_planes=6, seed=7)
    sig = S.hyperplane_signature(F.col("embedding"), planes)
    a = sorted(r[0] for r in emb.select(sig.alias("s")).collect())
    b = sorted(r[0] for r in emb.select(sig.alias("s")).collect())
    assert a == b
    assert all(0 <= s < 64 for s in a)


def test_lsh_topk_subset_of_probed_buckets(spark):
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    planes = S.hyperplane_planes(len(qvec), n_planes=6, seed=7)
    with_sig = emb.withColumn(
        "sig", S.hyperplane_signature(F.col("embedding"), planes)
    )
    got = S.lsh_topk(with_sig, planes, qvec, k=5, multi_probe=1)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    # scores sorted descending, ids tie-broken ascending
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # query vector itself (vec_id 0) lands in its own bucket -> top hit
    assert rows[0]["vec_id"] == 0


def test_pq_roundtrip_and_recall(spark):
    from arc_jupyter_spark.operators import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    books = S.pq_train(emb, vec_col="embedding", id_col="vec_id")
    assert len(books) == 16 and len(books[0]) <= 16 and len(books[0][0]) == 4
    enc = S.pq_encode(emb, books)
    assert enc.columns == emb.columns + ["pq_code"]
    # codes are deterministic across partitionings
    a = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    b = {r["vec_id"]: r["pq_code"]
         for r in S.pq_encode(emb.repartition(7), books).collect()}
    assert a == b
    res = [r["vec_id"] for r in
           S.pq_search(enc, books, qvec, k=10, pool=100).collect()]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    assert len(res) == 10
    assert len(set(res) & set(exact)) >= 7


def test_pq_adc_orders_by_distance(spark):
    """ADC of a vector against its own codebook entry scores ~0."""
    from arc_jupyter_spark.operators import similarity as S
    import math
    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7)] * 2) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = S.pq_train(df, m=2, k=8, vec_col="embedding", id_col="vec_id",
                       sample_n=64)
    enc = S.pq_encode(df, books)
    top = S.pq_topk(enc, books, rows[3][1], k=5, id_col="vec_id").collect()
    assert top[0]["adc"] < 0.2  # own cell ≈ zero quantized distance
    assert [r["adc"] for r in top] == sorted(r["adc"] for r in top)


def test_lsh_multi_probe_2_extends_bucket_set(spark):
    """Distance-2 probing must strictly widen the candidate set (and
    therefore never lower recall) relative to distance-1."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 3).first()["embedding"]
    planes = similarity.hyperplane_planes(len(qv), n_planes=6, seed=7)
    with_sig = emb.withColumn(
        "sig", similarity.hyperplane_signature(F.col("embedding"), planes)
    )
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qv, k=10).collect()
    }
    r1 = {
        r["vec_id"]
        for r in similarity.lsh_topk(with_sig, planes, qv, k=10, multi_probe=1).collect()
    }
    r2 = {
        r["vec_id"]
        for r in similarity.lsh_topk(with_sig, planes, qv, k=10, multi_probe=2).collect()
    }
    assert len(exact & r2) >= len(exact & r1)


def test_bm25_scores_hand_computed(spark):
    import math

    from arc_jupyter_spark.operators import similarity

    # 2 docs, term "apple": doc 1 has tf=2, dl=4; doc 2 tf=0, dl=2.
    # N=2, df=1, avgdl=3.
    df = spark.createDataFrame(
        [(1, "apple pie apple tart"), (2, "banana split")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in similarity.bm25_scores(df, "doc_id", "text", ("apple",)).collect()
    }
    idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    norm = 1.0 - 0.75 + 0.75 * (4 / (6 / 2))
    expect = idf * (2 * 2.25 / (2 + 1.25 * norm))
    assert abs(got[1] - expect) < 1e-12
    assert got[2] == 0.0


def test_bm25_score_e9_is_quantized_score(spark):
    import math

    from arc_jupyter_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, "x " * (i + 1) + "apple") for i in range(5)], ["doc_id", "text"]
    )
    for r in similarity.bm25_scores(df, "doc_id", "text", ("apple", "x")).collect():
        assert r["score_e9"] == math.floor(r["score"] * 1e9 + 0.5)


def test_assign_quantized_cells_matches_bruteforce(spark):
    import math

    from arc_jupyter_spark.operators import similarity

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.9, 0.1, 0.0]),
        (11, [0.1, 0.95, 0.0]),
        (12, [-1.0, -1.0, 0.5]),
        (13, [0.0, 0.0, 0.0]),  # all-zero: quantizes to zeros, tie -> anchor 0
    ]
    anchors = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in similarity.assign_quantized_cells(df, anchors).collect()
    }

    def quant(v):
        am = max(max(abs(float(x)) for x in v), 1e-300)
        return [int(math.floor(float(x) * 127 / am + 0.5)) for x in v]

    for vid, v in vecs:
        qv = quant(v)
        best = min(
            ((-sum(a * b for a, b in zip(qv, quant(av))), aid) for aid, av in anchors),
        )[1]
        assert got[vid] == best, (vid, got[vid], best)


def test_assign_quantized_cells_is_map_only(spark):
    from arc_jupyter_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    anchors = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    plan = (
        similarity.assign_quantized_cells(df, anchors)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_mmr_greedy_prefers_diversity():
    from arc_jupyter_spark.operators.similarity import mmr_rerank_greedy

    # a and b are near-duplicates with top relevance; c is less
    # relevant but diverse — MMR must pick (a, c) not (a, b)
    rel = {1: 900, 2: 890, 3: 500}
    sims = {
        1: {2: 990, 3: 10},
        2: {1: 990, 3: 10},
        3: {1: 10, 2: 10},
    }
    out = mmr_rerank_greedy(rel, sims, k=2)
    assert [(r, i) for r, i, _ in out] == [(1, 1), (2, 3)]
    # scores: first = rel; second = rel - max_sim_to_selected
    assert out[0][2] == 900 and out[1][2] == 500 - 10


def test_mmr_greedy_tie_breaks_on_smaller_id():
    from arc_jupyter_spark.operators.similarity import mmr_rerank_greedy

    rel = {7: 100, 3: 100}
    sims = {7: {3: 0}, 3: {7: 0}}
    out = mmr_rerank_greedy(rel, sims, k=2)
    assert [i for _, i, _ in out] == [3, 7]


def test_mmr_greedy_pool_smaller_than_k():
    from arc_jupyter_spark.operators.similarity import mmr_rerank_greedy

    rel = {1: 10, 2: 5}
    sims = {1: {2: 1}, 2: {1: 1}}
    out = mmr_rerank_greedy(rel, sims, k=10)
    assert len(out) == 2


def test_mmr_topk_matches_reference(spark):
    import math

    from arc_jupyter_spark.operators import similarity

    vecs = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * (i % 3)])
            for i in range(1, 30)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = [1.0, 0.0, 0.0]
    out = similarity.mmr_topk(df, q, k=5, pool=12).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in out}) == 5

    # reference: replay greedy on the same quantized ints
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    pool = sorted(vecs, key=lambda t: (-cos(t[1], q), t[0]))[:12]
    rel = {i: int(math.floor(cos(v, q) * 1e6 + 0.5)) for i, v in pool}
    sims = {
        i: {
            j: int(math.floor(cos(v, w) * 1e6 + 0.5))
            for j, w in pool if j != i
        }
        for i, v in pool
    }
    want = similarity.mmr_rerank_greedy(rel, sims, k=5)
    assert [(r["rank"], r["vec_id"], r["score_e6"]) for r in out] == want
