"""Benchmark-decontamination operator (n-gram overlap vs an eval set)."""

from pyspark.sql import functions as F

from arc_jupyter_spark.operators import decontaminate


def _frames(spark):
    eval_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "pack my box with five dozen liquor jugs"),
    ]
    corpus_rows = [
        # verbatim copy of eval doc 100 → max overlap
        (1, "the quick brown fox jumps over the lazy dog"),
        # shares one 5-gram window with eval doc 100
        (2, "watch the quick brown fox jumps today and tomorrow always"),
        # clean
        (3, "completely unrelated text with no overlap at all here"),
        # short doc (< n tokens): whole-doc shingle, no overlap
        (4, "tiny doc"),
    ]
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    return corpus, ev


def test_contamination_scores(spark):
    corpus, ev = _frames(spark)
    scores = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate.contamination_scores(corpus, ev, n=5).collect()
    }
    # doc 1 shares all five 5-grams of the 9-token eval doc; doc 2
    # shares exactly one ("the quick brown fox jumps"); 3 and 4 none.
    assert scores == {1: 5, 2: 1}


def test_decontaminate_removes_hits(spark):
    corpus, ev = _frames(spark)
    kept = decontaminate.decontaminate(corpus, ev, n=5, min_shared=1)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]
    # higher threshold keeps the single-shingle brush-pass
    kept2 = decontaminate.decontaminate(corpus, ev, n=5, min_shared=2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3, 4]


def test_repeated_shingles_count_once(spark):
    ev = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(10, "a b c d e a b c d e a b c d e")], ["doc_id", "text"]
    )
    scores = decontaminate.contamination_scores(corpus, ev, n=5).collect()
    # corpus doc repeats the eval 5-gram three times (plus wrap-around
    # shingles) but distinct-set semantics count each shared shingle once
    assert scores[0]["n_shared"] == 1


def test_eval_side_is_broadcast(spark):
    corpus, ev = _frames(spark)
    plan = decontaminate.contamination_scores(corpus, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
