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
