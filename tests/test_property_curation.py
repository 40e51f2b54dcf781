"""Property-based invariants for the round-3 operators (bounded
example counts — each example runs Spark jobs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=3),
    budgets=st.lists(st.integers(0, 40), min_size=3, max_size=3),
    max_epochs=st.integers(1, 4),
)
@SETTINGS
def test_epoch_mixture_count_formula(spark, sizes, budgets, max_epochs):
    """Emitted rows per source == min(budget, n_src * max_epochs)."""
    from arc_jupyter_spark.operators import sampling

    rows, sid = [], 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((sid, f"s{s}"))
            sid += 1
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    bmap = {f"s{s}": budgets[s % len(budgets)] for s in range(len(sizes))}
    out = sampling.epoch_mixture(df, "source", "doc_id", bmap, max_epochs)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for s, n in enumerate(sizes):
        want = min(bmap[f"s{s}"], n * max_epochs)
        assert got.get(f"s{s}", 0) == want, (s, n, bmap, got)


@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    nbins=st.integers(2, 16),
)
@SETTINGS
def test_hist_quantile_brackets_exact_percentile(spark, vals, nbins):
    """The reported bin must BRACKET the exact rank-ceil(q*n) value:
    bin(exact) == reported bin, and bin_lo <= exact value."""
    from arc_jupyter_spark.operators import sketch

    lo, hi = 0, 1000
    span = hi - lo + 1
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    h = sketch.hist_build(df, F.col("v"), lo, hi, nbins)
    out = sketch.hist_quantile_bins(
        h, [("p50", 1, 2), ("p90", 9, 10)], lo, hi, nbins
    ).collect()
    n = len(vals)
    sv = sorted(vals)
    for r in out:
        qn, qd = (1, 2) if r["q_label"] == "p50" else (9, 10)
        exact = sv[(n * qn + qd - 1) // qd - 1]
        assert (exact - lo) * nbins // span == r["bin"], (vals, nbins, r)
        assert r["bin_lo"] <= exact
        assert r["n_total"] == n


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
)
@SETTINGS
def test_exact_median_matches_sorted_middle(spark, vals):
    """median_x2 == middle value *2 (odd) or sum of two middles."""
    from arc_jupyter_spark.operators import sketch

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v bigint, id bigint"
    )
    row = sketch.exact_grouped_median_x2(
        df.withColumn("g", F.lit("x")), "g", F.col("v"), [F.col("id")],
        lo=-50, hi=50, nbins=8,
    ).first()
    sv = sorted(vals)
    n = len(sv)
    want = sv[(n - 1) // 2] + sv[n // 2]
    assert (row["n"], row["median_x2"]) == (n, want), (vals, row)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=3,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=6,
    ),
    cap=st.integers(2, 6),
)
@SETTINGS
def test_jaccard_capped_path_matches_semi_path(spark, texts, cap):
    """For any corpus, the capped posting-list shape equals the
    uncapped semi-join shape with the cap applied as a post-hoc
    document-frequency rule: pairs and values agree whenever the cap
    exceeds every shingle's df; with a binding cap the posting path's
    pairs are a subset with jaccard <= the uncapped value (the
    documented conservative-underestimate contract)."""
    from arc_jupyter_spark.operators import dedup

    df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            df, "id", "text", shingle_len=2, threshold=0.0
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            df, "id", "text", shingle_len=2, threshold=0.0, max_doc_freq=cap
        ).collect()
    }
    big = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            df, "id", "text", shingle_len=2, threshold=0.0, max_doc_freq=10_000
        ).collect()
    }
    assert big == uncapped  # non-binding cap: identical pairs + values
    assert set(capped) <= set(uncapped)
    for k, v in capped.items():
        assert v <= uncapped[k] + 1e-12  # binding cap only removes evidence


@given(
    sizes=st.lists(st.integers(1, 60), min_size=1, max_size=4),
    budget_den=st.integers(1, 8),
)
@SETTINGS
def test_cluster_balanced_sample_invariants(spark, sizes, budget_den):
    """Kept rows are a subset of the input; a cluster whose size is
    within the equal share survives whole; thresholds reproduce the
    integer quota formula exactly."""
    from arc_jupyter_spark.operators import sampling

    rows, nid = [], 0
    for cid, n in enumerate(sizes):
        for _ in range(n):
            rows.append((nid, cid))
            nid += 1
    df = spark.createDataFrame(rows, "id bigint, cluster bigint")
    total = sum(sizes)
    share = total // budget_den
    kept = sampling.cluster_balanced_sample(
        df, "cluster", "id", budget_den=budget_den
    )
    got = {r["cluster"]: r["n"] for r in kept.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    ids = {r["id"] for r in kept.collect()}
    assert ids <= set(range(nid))
    for cid, n in enumerate(sizes):
        thr = min(4096, (4096 * share) // n)
        if thr >= 4096:  # share covers the cluster: kept whole
            assert got.get(cid, 0) == n, (cid, n, share)
        else:
            assert got.get(cid, 0) <= n
