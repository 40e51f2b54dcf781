"""Dedup operators: exact, MinHash+LSH, n-gram Jaccard, SimHash."""

from pyspark.sql import functions as F

from arc_jupyter_spark.operators import dedup


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", 10),
    (2, "the quick brown fox jumps over the lazy dog", 20),   # exact dup of 1
    (3, "the quick brown fox jumps over the sleepy dog", 30),  # near dup of 1
    (4, "completely different text about spark engines", 40),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["id", "text", "ord"])


def test_exact_dedup_keeps_lowest_order(spark):
    out = dedup.exact_dedup(docs_df(spark), ["text"], "ord").collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [1, 3, 4]


def test_exact_dedup_by_digest_matches_exact(spark):
    df = docs_df(spark)
    a = sorted(r["id"] for r in dedup.exact_dedup(df, ["text"], "ord").collect())
    b = sorted(r["id"] for r in dedup.exact_dedup_by_digest(df, "text", "ord").collect())
    assert a == b


def test_minhash_candidates_find_near_dup_pair(spark):
    pairs = dedup.minhash_candidates(
        docs_df(spark), "id", "text", shingle_len=2, num_hashes=16, bands=8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found            # identical docs always collide
    assert (1, 3) in found or (2, 3) in found  # near-dup shares bands
    assert not any(4 in p for p in found)      # unrelated doc never pairs


def test_jaccard_exact_value(spark):
    # doc1 vs doc3, 2-shingles: 8 each, 6 shared -> J = 6/10 = 0.6
    df = docs_df(spark).where(F.col("id").isin(1, 3))
    pairs = dedup.jaccard_pairs(df, "id", "text", shingle_len=2, threshold=0.0).collect()
    assert len(pairs) == 1
    assert abs(pairs[0]["jaccard"] - 0.6) < 1e-9


def test_jaccard_threshold_filters(spark):
    df = docs_df(spark)
    pairs = dedup.jaccard_pairs(df, "id", "text", shingle_len=2, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_jaccard_pairs_posting_and_semi_paths_agree(spark):
    """The capped posting-list shape and the uncapped semi-join shape
    must produce identical pairs when the cap exceeds every shingle's
    document frequency (so the cap prunes nothing)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "a completely different document about spark plans"),
        (4, "the quick brown fox jumps over the lazy dog again"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    capped = sorted(
        map(
            tuple,
            dedup.jaccard_pairs(
                df, "id", "text", shingle_len=2, threshold=0.1, max_doc_freq=100
            ).collect(),
        )
    )
    uncapped = sorted(
        map(
            tuple,
            dedup.jaccard_pairs(
                df, "id", "text", shingle_len=2, threshold=0.1
            ).collect(),
        )
    )
    assert capped == uncapped and len(capped) >= 3


def test_minhash_signature_table_identical_docs_agree(spark):
    sigs = dedup.minhash_signature_table(
        docs_df(spark), "id", "text", shingle_len=2, num_hashes=8
    )
    rows = {r["id"]: tuple(r[c] for c in sigs.columns if c != "id")
            for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_simhash_identical_docs_equal(spark):
    df = docs_df(spark).select(
        "id", dedup.simhash64(F.col("text")).alias("sh")
    )
    rows = {r["id"]: r["sh"] for r in df.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_connected_components_and_keep_one(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], ["id_a", "id_b"]
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # driver-side union-find fast path (default) and the distributed
    # min-label propagation fallback must agree exactly
    labels = dedup.connected_components(pairs)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == expected
    dist = dedup.connected_components(pairs, driver_threshold=0)
    got_dist = {r["node"]: r["label"] for r in dist.collect()}
    assert got_dist == expected

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 5, 10, 11, 22)], ["doc_id", "text"]
    )
    kept = dedup.keep_one_per_component(docs, labels, "doc_id")
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    # 1 survives its component, 5 has no duplicates, 10 survives, and
    # 22's component root (20) is absent from docs so 22 is dropped
    assert kept_ids == [1, 5, 10]


def test_minhash_bucket_cap_drops_boilerplate(spark):
    # 6 identical boilerplate docs form one giant bucket; capping at 4
    # suppresses their pairs while a genuine near-dup pair survives
    rows = [(i, "the same boilerplate text repeated here") for i in range(6)]
    rows += [(10, "a unique document about distributed query engines and joins"),
             (11, "a unique document about distributed query engines and join")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dedup.minhash_candidates(df, "doc_id", "text")
    capped = dedup.minhash_candidates(df, "doc_id", "text", max_bucket_size=4)
    unc = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cap = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (10, 11) in unc and (10, 11) in cap
    assert (0, 1) in unc and (0, 1) not in cap


def test_incremental_near_dedup_drops_corpus_near_dups(spark):
    df = docs_df(spark)
    existing = df.where(F.col("id") == 1)
    new = df.where(F.col("id") != 1)
    kept = dedup.incremental_near_dedup(
        new, existing, "id", "text", shingle_len=2, num_hashes=16, bands=8
    ).collect()
    ids = sorted(r["id"] for r in kept)
    # 2 is an exact dup of corpus doc 1, 3 a near dup sharing bands;
    # 4 is unrelated and survives.
    assert ids == [4]


def test_incremental_near_dedup_keeps_all_against_disjoint_corpus(spark):
    df = docs_df(spark)
    existing = df.where(F.col("id") == 4)
    new = df.where(F.col("id").isin(1, 3))
    kept = dedup.incremental_near_dedup(
        new, existing, "id", "text", shingle_len=2, num_hashes=16, bands=8
    ).collect()
    assert sorted(r["id"] for r in kept) == [1, 3]


def test_duplicated_spans_counts_and_coverage(spark):
    # docs 1 and 2 are identical (9 tokens -> 5 five-grams, all
    # duplicated, covering all 9 token positions); doc 3 shares the
    # 7-token prefix "the quick brown fox jumps over the" with them ->
    # grams at positions 1-3 duplicated, covering tokens 1..7; doc 4
    # shares nothing and must be absent.
    out = {
        r["id"]: (r["n_grams"], r["n_dup_grams"], r["dup_tokens"])
        for r in dedup.duplicated_spans(
            docs_df(spark), "id", "text", gram_len=5, min_docs=2
        ).collect()
    }
    assert out[1] == (5, 5, 9)
    assert out[2] == (5, 5, 9)
    assert out[3] == (5, 3, 7)
    assert 4 not in out


def test_duplicated_spans_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], ["id", "text"]
    )
    # both docs are shorter than the gram length: no grams, no rows
    assert dedup.duplicated_spans(df, "id", "text", gram_len=5).count() == 0


def test_semantic_dedup_keeps_id_minimal_elements(spark):
    # block 1: vectors 1 and 2 identical (cos=1), 3 orthogonal;
    # block 2: vector 4 alone. Drop 2 (smaller neighbor 1 exists).
    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [2.0, 0.0], "a"),   # same direction as 1 -> cos 1.0
        (3, [0.0, 1.0], "a"),
        (4, [1.0, 0.0], "b"),   # same direction but different block
    ]
    df = spark.createDataFrame(rows, ["id", "vec", "blk"])
    kept = sorted(
        r["id"]
        for r in dedup.semantic_dedup(
            df, "id", "vec", block_col="blk", threshold=0.95
        ).collect()
    )
    assert kept == [1, 3, 4]


def test_keep_best_per_component(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
        ["id", "score"],
    )
    # component {1,2,3}: best = max score 30, tie -> lowest id = 2.
    # doc 4 labeled alone (self component) -> kept; doc 9 unlabeled.
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], ["node", "label"]
    )
    kept = sorted(
        r["id"]
        for r in dedup.keep_best_per_component(
            docs, labels, "id", score_col=F.col("score")
        ).collect()
    )
    assert kept == [2, 4, 9]


def test_keep_best_keep_score_preserves_computed_score(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 99)], ["id", "base"]
    )
    labels = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], ["node", "label"])
    out = dedup.keep_best_per_component(
        docs, labels, "id", score_col=F.col("base") * 2, keep_score="sc"
    )
    got = {r["id"]: r["sc"] for r in out.collect()}
    # winner of {1,2,3} is id 2 (score tie 60, lowest id); 9 unlabeled
    assert got == {2: 60, 9: 198}
    assert "sc" in out.columns and "_score" not in out.columns


def test_keep_best_matches_keep_one_on_uniform_scores(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(i, 7) for i in range(10)], ["id", "score"])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (5, 5), (6, 5)], ["node", "label"]
    )
    # uniform scores -> tie-break to min id == keep_one semantics
    a = sorted(
        r["id"]
        for r in dedup.keep_best_per_component(
            docs, labels, "id", score_col=F.col("score")
        ).collect()
    )
    b = sorted(
        r["id"] for r in dedup.keep_one_per_component(docs, labels, "id").collect()
    )
    assert a == b == [0, 2, 3, 4, 5, 7, 8, 9]


def test_bloom_no_false_negatives_and_exact_bits(spark):
    from pyspark.sql import functions as F

    items = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["k"])
    bitmap = dedup.bloom_build(items, F.col("k"), num_hashes=3, num_bits=1024)
    words = dedup.bloom_dense_words(bitmap, 1024)
    assert len(words) == 32
    # every inserted key must test positive (no false negatives)
    hits = items.where(
        dedup.bloom_might_contain(F.col("k"), words, num_hashes=3, num_bits=1024)
    ).count()
    assert hits == 50
    # bits are md5-derived: rebuilding gives identical words
    words2 = dedup.bloom_dense_words(
        dedup.bloom_build(items, F.col("k"), num_hashes=3, num_bits=1024), 1024
    )
    assert words == words2


def test_bloom_rejects_most_absent_keys(spark):
    from pyspark.sql import functions as F

    items = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["k"])
    words = dedup.bloom_dense_words(
        dedup.bloom_build(items, F.col("k"), num_hashes=3, num_bits=4096), 4096
    )
    absent = spark.createDataFrame([(f"x{i}",) for i in range(200)], ["k"])
    fp = absent.where(
        dedup.bloom_might_contain(F.col("k"), words, num_hashes=3, num_bits=4096)
    ).count()
    # 150 bits set of 4096 -> FP rate ~ (150/4096)^3 ~ 5e-5; allow slack
    assert fp <= 3


def test_scrub_duplicated_spans_removes_shared_grams(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon unique1 tail1 one two"),
            (2, "alpha beta gamma delta epsilon unique2 tail2 three"),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r["clean"]
        for r in dedup.scrub_duplicated_spans(
            df, "id", "text", gram_len=5, min_docs=2, out_col="clean"
        ).collect()
    }
    # the shared 5-gram covers tokens 1-5; the rest survives
    assert out[1] == "unique1 tail1 one two"
    assert out[2] == "unique2 tail2 three"


def test_scrub_leaves_unique_docs_verbatim(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], ["id", "text"]
    )
    out = {
        r["id"]: r["clean"]
        for r in dedup.scrub_duplicated_spans(
            df, "id", "text", gram_len=5, min_docs=2, out_col="clean"
        ).collect()
    }
    assert out[1] == "a b c d e f g"
    assert out[2] == "h i j k l m n"


def test_passage_dedup_keep_first(spark):
    from arc_jupyter_spark.operators import dedup as dd

    # passage_len=2: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [c d]
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "c d")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in dd.passage_dedup(df, "doc_id", "text", passage_len=2).collect()
    }
    assert rows[1]["n_passages"] == 2 and rows[1]["n_kept"] == 2
    # doc2 loses its [a b] to doc1, keeps [x y]
    assert rows[2]["n_passages"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["kept_tokens"] == 2
    # doc3's [c d] already seen in doc1
    assert rows[3]["n_kept"] == 0


def test_passage_dedup_ragged_tail(spark):
    from arc_jupyter_spark.operators import dedup as dd

    # 5 tokens at len 2 -> chunks [a b][c d][e]; all unique
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    r = dd.passage_dedup(df, "doc_id", "text", passage_len=2).first()
    assert r["n_passages"] == 3 and r["n_kept"] == 3 and r["kept_tokens"] == 5


def test_fuzzy_pairs_lossless_across_bands(spark):
    from arc_jupyter_spark.operators import dedup as dd

    # "ab"(len 2, band 0) vs "abc"(len 3, band 1): crosses bands, and
    # the longer name sorts LARGER; "zc"(2) vs "bzc"(3): longer sorts
    # SMALLER than "zc" — the orientation trap. Both must surface.
    df = spark.createDataFrame(
        [("ab",), ("abc",), ("zc",), ("bzc",), ("unrelated-long",)], ["n"]
    )
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in dd.fuzzy_pairs(df, "n", max_dist=2, band_width=3).collect()
    }
    assert got[("ab", "abc")] == 1
    assert got[("bzc", "zc")] == 1
    assert all(a < b for a, b in got)


def test_fuzzy_pairs_no_dupes_no_selfpairs(spark):
    from arc_jupyter_spark.operators import dedup as dd

    df = spark.createDataFrame([("aa",), ("aa",), ("ab",)], ["n"])
    rows = dd.fuzzy_pairs(df, "n", max_dist=2, band_width=3).collect()
    assert len(rows) == 1 and rows[0]["name_a"] == "aa" and rows[0]["name_b"] == "ab"


def test_fuzzy_pairs_band_width_guard(spark):
    from arc_jupyter_spark.operators import dedup as dd
    import pytest as _pt

    df = spark.createDataFrame([("x",)], ["n"])
    with _pt.raises(ValueError):
        dd.fuzzy_pairs(df, "n", max_dist=3, band_width=3)


def test_passage_dedup_huge_ids_keep_first(spark):
    from arc_jupyter_spark.operators import dedup as dd

    # 64-bit-hash-scale ids: the struct order key must still keep the
    # SMALLEST (id, idx) — an id*2^20 arithmetic encoding would wrap
    big1, big2 = (1 << 61) + 5, (1 << 61) + 7
    df = spark.createDataFrame(
        [(big1, "a b"), (big2, "a b")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in dd.passage_dedup(df, "doc_id", "text", passage_len=2).collect()
    }
    assert rows[big1]["n_kept"] == 1 and rows[big2]["n_kept"] == 0


def test_boilerplate_chunks_removes_all_occurrences_within_group(spark):
    # "f1 f2 f3 f4 f5" is a footer chunk shared by docs 1 and 2 of
    # group g1 -> removed from BOTH (not keep-first); the same chunk
    # in group g2 appears once -> kept there.
    footer = "f1 f2 f3 f4 f5"
    rows = [
        (1, "a1 a2 a3 a4 a5 " + footer, "g1"),
        (2, "b1 b2 b3 b4 b5 " + footer, "g1"),
        (3, "c1 c2 c3 c4 c5 " + footer, "g2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in dedup.boilerplate_chunks(
            df, "doc_id", "text", "source", passage_len=5, min_docs=2
        ).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["kept_tokens"] == 5
    assert out[2]["n_removed"] == 1 and out[2]["kept_tokens"] == 5
    # unique in g2 -> nothing removed
    assert out[3]["n_removed"] == 0 and out[3]["kept_tokens"] == 10


def test_boilerplate_chunks_threshold(spark):
    # min_docs=3: a chunk in only 2 docs survives
    footer = "f1 f2 f3 f4 f5"
    rows = [
        (1, footer, "g1"),
        (2, footer, "g1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = dedup.boilerplate_chunks(
        df, "doc_id", "text", "source", passage_len=5, min_docs=3
    ).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_connected_components_distributed_long_chain(spark):
    # a 12-hop chain whose ids are NOT ordered along the path (the
    # worst layout for label forwarding) must still reach the exact
    # min-label fixpoint on the distributed path
    import random

    rng = random.Random(7)
    perm = list(range(13))
    rng.shuffle(perm)
    pairs = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(12)], ["id_a", "id_b"]
    )
    dist = dedup.connected_components(pairs, driver_threshold=0)
    got = {r["node"]: r["label"] for r in dist.collect()}
    assert got == {n: 0 for n in range(13)}


def test_containment_detects_subdocument(spark):
    """A short doc pasted inside a long one: containment ~1.0 while
    jaccard stays small — the signal the operator exists for."""
    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "intro words here now " + short + " then lots of trailing filler "
        "tokens one two three four five six seven eight nine ten"
    )
    df = spark.createDataFrame([(1, short), (2, long)], ["id", "text"])
    cont = dedup.containment_pairs(
        df, "id", "text", shingle_len=3, threshold=0.9
    ).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = dedup.jaccard_pairs(
        df, "id", "text", shingle_len=3, threshold=0.0
    ).collect()
    assert jac[0]["jaccard"] < 0.2


def test_containment_capped_and_uncapped_agree(spark):
    df = docs_df(spark)
    def rows(cap):
        return sorted(
            (r["id_a"], r["id_b"], round(r["containment"], 9))
            for r in dedup.containment_pairs(
                df, "id", "text", shingle_len=2, threshold=0.0,
                max_doc_freq=cap,
            ).collect()
        )
    assert rows(None) == rows(10_000)


# -- d18: maximal cross-document matches (suffix-array semantics) -----

def _matches(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["id", "text"])
    return sorted(
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["match_len"])
        for r in dedup.maximal_match_pairs(df, "id", "text", **kw).collect()
    )


def test_maximal_match_single_embedded_run(spark):
    # doc 2 embeds doc 1's full 10-token text at token position 3
    rows = _matches(
        spark,
        [(1, "a b c d e f g h i j"), (2, "x x a b c d e f g h i j y y")],
        seed_len=3, min_len=5,
    )
    assert rows == [(1, 2, 1, 3, 10)]


def test_maximal_match_split_runs(spark):
    # one inserted token splits the match into two maximal 5-token runs
    rows = _matches(
        spark,
        [(1, "a b c d e f g h i j"), (2, "a b c d e q f g h i j")],
        seed_len=3, min_len=5,
    )
    assert rows == [(1, 2, 1, 1, 5), (1, 2, 6, 7, 5)]


def test_maximal_match_min_len_filters(spark):
    rows = _matches(
        spark,
        [(1, "a b c d e f g h i j"), (2, "a b c d e q f g h i j")],
        seed_len=3, min_len=6,
    )
    assert rows == []


def test_maximal_match_doc_freq_cap_drops_boilerplate(spark):
    # the shared 6-token run appears in 5 docs; cap=3 prunes every seed
    boiler = "alpha beta gamma delta epsilon zeta"
    docs = [(i, f"u{i} v{i} {boiler} w{i}") for i in range(1, 6)]
    assert _matches(spark, docs, seed_len=3, min_len=6) != []
    assert _matches(spark, docs, seed_len=3, min_len=6, max_doc_freq=3) == []


def test_maximal_match_min_len_below_seed_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.maximal_match_pairs(
            spark.createDataFrame([(1, "a b c")], ["id", "text"]),
            "id", "text", seed_len=5, min_len=3,
        )


# -- d19: keep-first substring scrub ----------------------------------

def test_scrub_maximal_keeps_first_copy(spark):
    # doc 2 embeds doc 1's text: doc 1 must stay verbatim, doc 2 loses
    # exactly the embedded run
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x x a b c d e f g h i j y y")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["clean_text"]
        for r in dedup.scrub_maximal_matches(
            df, "id", "text", seed_len=3, min_len=5
        ).collect()
    }
    assert out[1] == "a b c d e f g h i j"
    assert out[2] == "x x y y"


def test_scrub_maximal_one_pass_no_reexposure(spark):
    # docs 2 and 3 both copy doc 1: matches are computed on the
    # ORIGINAL corpus, so both higher-id copies are scrubbed (the
    # 2-vs-3 match also exists but its coverage coincides)
    base = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, base), (2, "p p " + base), (3, base + " q q")], ["id", "text"]
    )
    out = {
        r["id"]: r["clean_text"]
        for r in dedup.scrub_maximal_matches(
            df, "id", "text", seed_len=3, min_len=5
        ).collect()
    }
    assert out[1] == base
    assert out[2] == "p p"
    assert out[3] == "q q"


def test_scrub_maximal_untouched_doc_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "Completely   Unrelated Words here")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["clean_text"]
        for r in dedup.scrub_maximal_matches(
            df, "id", "text", seed_len=3, min_len=5
        ).collect()
    }
    # pass-through modulo tokenization normalization (lowercase,
    # single-space)
    assert out[2] == "completely unrelated words here"


# -- d20: intra-document maximal self-repeats --------------------------

def _self_stats(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["id", "text"])
    return {
        r["id"]: (r["n_rep_matches"], r["max_len"], r["rep_tokens"])
        for r in dedup.self_repeat_stats(df, "id", "text", **kw).collect()
    }


def test_self_repeats_single_block(spark):
    # "a b c d" repeated once with a separator: one maximal 4-run
    out = _self_stats(
        spark, [(1, "a b c d x a b c d")], seed_len=2, min_len=4
    )
    assert out == {1: (1, 4, 4)}


def test_self_repeats_periodic_chains(spark):
    # six identical tokens: diag-1 run of len 5 and diag-2 run of
    # len 4 (diag >= 3 falls under min_len); later-occurrence union
    # covers positions 2..6
    out = _self_stats(spark, [(1, "a a a a a a")], seed_len=2, min_len=4)
    assert out == {1: (2, 5, 5)}


def test_self_repeats_no_repeat_doc_absent(spark):
    out = _self_stats(
        spark, [(1, "all tokens here are distinct words")],
        seed_len=2, min_len=4,
    )
    assert out == {}


def test_self_repeats_occurrence_cap(spark):
    # "a b" occurs 4x: with the cap at 2 every seed is pruned
    docs = [(1, "x a b a b a b a b y")]
    assert _self_stats(spark, docs, seed_len=2, min_len=4) != {}
    assert _self_stats(
        spark, docs, seed_len=2, min_len=4, max_gram_occ=2
    ) == {}


def test_substring_removal_counts_match_scrub(spark):
    # the accounting variant must agree with counting the scrubbed text
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x x a b c d e f g h i j y y"),
        (3, "p q r s t u v w"),
        (4, "a b c d e f g h i j p q r s t u v w"),
    ]
    df = spark.createDataFrame(docs, ["id", "text"])
    kw = dict(seed_len=3, min_len=5, max_doc_freq=None)
    counts = {
        r["id"]: (r["n_tokens"], r["removed_tokens"])
        for r in dedup.substring_removal_counts(df, "id", "text", **kw).collect()
    }
    scrub = {
        r["id"]: (
            len(r["text"].lower().split()),
            len(r["text"].lower().split()) - len(r["clean_text"].split()),
        )
        for r in dedup.scrub_maximal_matches(df, "id", "text", **kw).collect()
    }
    assert counts == scrub
    assert counts[1][1] == 0          # lowest id keeps everything
    assert counts[2][1] == 10         # embedded copy fully removed
    assert counts[4][1] == 18         # both runs removed


# -- t41: cross-corpus maximal matches (contamination) ------------------

def _cross(spark, probe, corpus, **kw):
    pa = spark.createDataFrame(probe, ["id", "text"])
    ca = spark.createDataFrame(corpus, ["id", "text"])
    return sorted(
        (r["id_probe"], r["id_corpus"], r["start_probe"],
         r["start_corpus"], r["match_len"])
        for r in dedup.cross_match_pairs(pa, ca, "id", "text", **kw).collect()
    )


def test_cross_match_detects_leak(spark):
    # corpus doc 10 embeds eval doc 1's full text at token position 3
    rows = _cross(
        spark,
        [(1, "a b c d e f g h i j")],
        [(10, "x x a b c d e f g h i j y y"), (11, "unrelated words only")],
        seed_len=3, min_len=5,
    )
    assert rows == [(1, 10, 1, 3, 10)]


def test_cross_match_no_id_ordering_requirement(spark):
    # probe id LARGER than corpus id still pairs (cross-table, not
    # ordered-pair, semantics)
    rows = _cross(
        spark,
        [(99, "a b c d e f")],
        [(1, "a b c d e f")],
        seed_len=3, min_len=5,
    )
    assert rows == [(99, 1, 1, 1, 6)]


def test_cross_match_corpus_df_cap(spark):
    # the shared run sits in 4 corpus docs; cap=3 prunes every seed
    probe = [(1, "alpha beta gamma delta epsilon zeta")]
    corpus = [(i, f"u{i} alpha beta gamma delta epsilon zeta w{i}")
              for i in range(10, 14)]
    assert _cross(spark, probe, corpus, seed_len=3, min_len=6) != []
    assert _cross(
        spark, probe, corpus, seed_len=3, min_len=6, max_doc_freq=3
    ) == []
