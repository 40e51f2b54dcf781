"""Empty-input semantics: every core operator must return an empty,
correctly-typed result on a zero-row corpus — never throw. The
degenerate partition is routine at 100 TB (an empty hour, a filtered-
out source), so this is correctness, not pedantry."""

import pytest
from pyspark.sql import functions as F, types as T

from arc_jupyter_spark.operators import dedup, sketch, text


@pytest.fixture()
def empty_docs(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame([], schema)


def test_exact_dedup_empty(empty_docs):
    assert dedup.exact_dedup_by_digest(empty_docs, "text", "doc_id").count() == 0


def test_minhash_candidates_empty(empty_docs):
    out = dedup.minhash_candidates(empty_docs, id_col="doc_id", text_col="text")
    assert out.count() == 0 and out.columns == ["id_a", "id_b"]


def test_duplicated_spans_empty(empty_docs):
    out = dedup.duplicated_spans(empty_docs, "doc_id", "text")
    assert out.count() == 0


def test_passage_dedup_empty(empty_docs):
    assert dedup.passage_dedup(empty_docs, "doc_id", "text").count() == 0


def test_fuzzy_pairs_empty(empty_docs):
    assert dedup.fuzzy_pairs(empty_docs, "text").count() == 0


def test_inverted_index_empty(empty_docs):
    out = text.inverted_index(empty_docs, "doc_id", "text")
    assert out.count() == 0 and out.columns == ["tok", "df", "postings"]


def test_bigram_lift_empty(empty_docs):
    assert text.bigram_lift(empty_docs, "doc_id", "text").count() == 0


def test_token_rarity_empty(empty_docs):
    assert text.token_rarity(empty_docs, "doc_id", "text").count() == 0


def test_count_min_empty(spark, empty_docs):
    occ = empty_docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    cms = sketch.count_min_build(occ, "tok", depth=2, width=32)
    assert cms.count() == 0
    probes = spark.createDataFrame([("x",)], ["tok"])
    est = sketch.count_min_estimate(cms, probes, "tok", depth=2, width=32)
    assert est.first()["estimate"] == 0


def test_connected_components_empty(spark):
    edges = spark.createDataFrame(
        [], T.StructType(
            [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
        )
    )
    assert dedup.connected_components(edges).count() == 0


def test_merge_upsert_empty_changes(spark):
    from arc_jupyter_spark.operators.joins import merge_upsert

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    empty_changes = spark.createDataFrame(
        [], T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("op", T.StringType()),
        ])
    )
    out = merge_upsert(base, empty_changes, ["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a")]


def test_merge_upsert_empty_base(spark):
    from arc_jupyter_spark.operators.joins import merge_upsert

    empty_base = spark.createDataFrame(
        [], T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ])
    )
    changes = spark.createDataFrame([(1, "a", "I"), (2, "b", "D")],
                                    ["k", "v", "op"])
    out = merge_upsert(empty_base, changes, ["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a")]


def test_pagerank_empty_edges(spark):
    from arc_jupyter_spark.operators.graph import pagerank

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
        ])
    )
    # zero nodes: result is empty, not a divide-by-zero
    out = pagerank(empty.where(F.lit(False)), iterations=1)
    assert out.columns == ["node", "rank_e9"]


def test_priority_sample_empty(spark):
    from arc_jupyter_spark.operators.sampling import priority_sample

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("w", T.LongType()),
        ])
    )
    assert priority_sample(empty, "id", "w", k=5).count() == 0


def test_domain_block_filter_empty(spark):
    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("url", T.StringType())])
    )
    assert text.domain_block_filter(empty, "url", ["x.com"]).count() == 0


def test_hll_shard_estimate_empty(spark):
    out = sketch.hll_shard_estimate(
        spark.createDataFrame([], T.StructType([T.StructField("k", T.LongType())])),
        "k",
    ).first()
    assert out["n_exact"] == 0


def test_url_dedup_empty(spark):
    from arc_jupyter_spark.operators import urls

    df = spark.createDataFrame([], "id bigint, url string")
    out = urls.url_dedup(df, "url", "id")
    assert out.count() == 0 and "canon_url" in out.columns


def test_triangle_count_empty(spark):
    from arc_jupyter_spark.operators import graph

    df = spark.createDataFrame([], "src bigint, dst bigint")
    row = graph.triangle_count(df).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (0, 0, 0)


def test_phash_near_dup_empty(spark):
    from arc_jupyter_spark.operators import multimodal

    df = spark.createDataFrame([], "id bigint, ph bigint")
    out = multimodal.phash_near_dup(df, "id", "ph")
    assert out.count() == 0 and out.columns == ["id_a", "id_b", "hamming"]


def test_epoch_mixture_empty(spark):
    from arc_jupyter_spark.operators import sampling

    df = spark.createDataFrame([], "doc_id bigint, source string")
    assert sampling.epoch_mixture(df, "source", "doc_id", {"a": 5}).count() == 0


def test_expectation_report_empty(spark):
    from arc_jupyter_spark.operators import quality

    df = spark.createDataFrame([], "id bigint, v double")
    dim = spark.createDataFrame([], "k bigint")
    rep = quality.expectation_report(
        df,
        [
            {"name": "nn", "kind": "not_null", "column": "v"},
            {"name": "uq", "kind": "unique", "column": "id"},
            {"name": "rg", "kind": "range", "column": "v", "lo": 0, "hi": 1},
            {"name": "rf", "kind": "ref", "column": "id",
             "dim_df": dim, "dim_col": "k"},
        ],
    ).collect()
    assert len(rep) == 4
    assert all(r["n_rows"] == 0 and r["n_violations"] == 0 and r["passed"]
               for r in rep)


def test_jaccard_pairs_empty_both_paths(empty_docs):
    for cap in (None, 50):
        out = dedup.jaccard_pairs(
            empty_docs, "doc_id", "text", shingle_len=2, max_doc_freq=cap
        )
        assert out.count() == 0
        assert out.columns == ["id_a", "id_b", "jaccard"]


def test_boilerplate_chunks_empty(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    out = dedup.boilerplate_chunks(
        spark.createDataFrame([], schema), "doc_id", "text", "source"
    )
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "source", "n_chunks", "n_removed", "kept_tokens",
    ]


def test_overlapping_chunks_empty(empty_docs):
    out = text.overlapping_chunks(empty_docs, "doc_id", "text")
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "chunk_idx", "chunk_digest", "chunk_tokens",
    ]


def test_bm25_scores_empty(empty_docs):
    from arc_jupyter_spark.operators import similarity

    out = similarity.bm25_scores(empty_docs, "doc_id", "text", ("a", "b"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "score_e9"]


def test_cluster_balanced_sample_empty(spark):
    from arc_jupyter_spark.operators import sampling

    df = spark.createDataFrame([], "id BIGINT, cluster BIGINT")
    assert sampling.cluster_balanced_sample(df, "cluster", "id").count() == 0


def test_bpe_pairs_empty(empty_docs):
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators import text

    pairs = (
        empty_docs.select(F.explode(text.ascii_words(F.col("text"))).alias("w"))
        .select(F.explode(text.char_pairs(F.col("w"))).alias("p"))
    )
    assert pairs.count() == 0


def test_mmr_topk_empty_corpus(spark):
    from arc_jupyter_spark.operators import similarity

    df = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = similarity.mmr_topk(df, [1.0, 0.0], k=5, pool=10)
    assert out.count() == 0
    assert out.columns == ["rank", "vec_id", "score_e6"]


def test_assign_quantized_cells_rejects_empty_anchors(spark):
    import pytest

    from arc_jupyter_spark.operators import similarity

    df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        similarity.assign_quantized_cells(df, [])


def test_label_propagation_empty_edges(spark):
    from arc_jupyter_spark.operators.graph import label_propagation

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    out = label_propagation(empty, iterations=2)
    assert out.columns == ["node", "label"]
    assert out.count() == 0


def test_lloyd_step_quantized_rejects_empty_anchors(spark):
    import pytest
    from arc_jupyter_spark.operators import similarity

    df = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        similarity.lloyd_step_quantized(df, [])


def test_lloyd_step_quantized_empty_corpus(spark):
    from arc_jupyter_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = similarity.lloyd_step_quantized(empty, [(0, [1.0, 0.0])])
    assert out.columns == ["cluster_id", "dim", "sum_q", "n_c", "inertia_q"]
    assert out.count() == 0


def test_bfs_levels_empty_edges(spark):
    from arc_jupyter_spark.operators.graph import bfs_levels

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    src = spark.createDataFrame([(7,)], ["node"])
    out = bfs_levels(empty, src, max_depth=3).collect()
    assert [(r["node"], r["dist"]) for r in out] == [(7, 0)]


def test_smoothed_bigram_score_empty_train(spark):
    from arc_jupyter_spark.operators.text import smoothed_bigram_score

    train = spark.createDataFrame([], "doc_id bigint, text string")
    score = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    out = smoothed_bigram_score(train, score, "doc_id", "text").collect()
    # V=0, everything unseen: charge (0+0) div (0+1) = 0 per bigram
    assert [(r["doc_id"], r["sum_chg"], r["n_unseen"]) for r in out] == [(1, 0, 1)]


def test_lloyd_train_empty_corpus(spark):
    from arc_jupyter_spark.operators.similarity import lloyd_train_quantized

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = lloyd_train_quantized(empty, [(0, [1.0, 0.0])], iters=2)
    assert out.columns == ["cluster_id", "dim", "c_e6", "n_c"]
    assert out.count() == 0


def test_connected_components_distributed_empty(spark):
    from arc_jupyter_spark.operators import dedup

    edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = dedup.connected_components(edges, driver_threshold=0)
    assert out.columns == ["node", "label"]
    assert out.count() == 0


def test_containment_pairs_empty_both_paths(empty_docs):
    for cap in (None, 50):
        out = dedup.containment_pairs(
            empty_docs, "doc_id", "text", shingle_len=2, max_doc_freq=cap
        )
        assert out.count() == 0
        assert out.columns == ["id_a", "id_b", "containment"]
