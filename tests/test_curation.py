"""Round-3 curation operators: URL canonicalization, HTML cleaning,
code detection, triangle counting, DQ expectations."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from arc_jupyter_spark.operators import graph, quality, text, urls


# ------------------------------------------------------------------ urls
def test_canonical_url_rules(spark):
    cases = {
        # host/scheme lowercased, default https port stripped,
        # tracking params dropped, params sorted, trailing slash + frag
        "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1#frag":
            "https://www.ex.com/A/b?a=1&b=2",
        # http default port; path case preserved
        "http://Host.ORG:80/Path": "http://host.org/Path",
        # non-default port kept
        "https://h.io:8443/x": "https://h.io:8443/x",
        # fbclid/gclid dropped; empty query drops '?'
        "https://h.io/p?gclid=1&fbclid=2": "https://h.io/p",
        # bare host, no path
        "https://h.io": "https://h.io",
        # root slash stripped (treated same as bare host)
        "https://h.io/": "https://h.io",
        # utm prefix must not over-match non-tracking params
        "https://h.io/p?autm_x=1&c=3": "https://h.io/p?autm_x=1&c=3",
    }
    df = spark.createDataFrame(
        [Row(i=i, url=u) for i, u in enumerate(cases)],
    )
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", urls.canonical_url(F.col("url")).alias("canon")
        ).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"


def test_url_dedup_keeps_first(spark):
    rows = [
        Row(id=3, url="https://A.com/x?utm_source=1"),
        Row(id=1, url="https://a.com/x/"),
        Row(id=2, url="https://a.com/x?b=1"),
    ]
    kept = urls.url_dedup(spark.createDataFrame(rows), "url", "id").collect()
    ids = sorted(r["id"] for r in kept)
    assert ids == [1, 2]  # 3 collapses into 1's canonical group


# ------------------------------------------------------------------ html
def test_html_text_strips_and_decodes(spark):
    html = (
        '<html><head><style>p{color:red}</style>'
        "<script>if (a < b) { x = '&amp;'; }</script></head>"
        '<body><p>Hello &amp;&nbsp;<b>world</b>&lt;tag&gt;</p></body></html>'
    )
    df = spark.createDataFrame([Row(h=html)])
    out = df.select(text.html_text(F.col("h")).alias("t")).first()["t"]
    # tags become spaces (word-separating) before entity decode
    assert out == "Hello & world <tag>"


def test_html_double_escaped_entity(spark):
    # &amp;lt; is the LITERAL text "&lt;" — decoding &amp; last keeps it
    df = spark.createDataFrame([Row(h="<p>&amp;lt;</p>")])
    assert df.select(text.html_text(F.col("h")).alias("t")).first()["t"] == "&lt;"


def test_anchor_char_count(spark):
    html = '<a href="/">Home</a><p>body</p><a x=1>A &amp; B</a>'
    df = spark.createDataFrame([Row(h=html)])
    n = df.select(text.anchor_char_count(F.col("h")).alias("n")).first()["n"]
    assert n == len("Home") + len("A & B")


# ------------------------------------------------------------------ code
def test_code_score_and_route(spark):
    code = 'def f(x): import os; return { "n": 1 };'
    prose = "the quick brown fox jumps over the lazy dog " * 3
    df = spark.createDataFrame([Row(t=code), Row(t=prose)])
    rows = df.select(
        "t",
        text.code_score(F.col("t")).alias("s"),
        text.is_code(F.col("t")).alias("c"),
    ).collect()
    by = {r["t"]: r for r in rows}
    assert by[code]["c"] and by[code]["s"] >= 10
    assert not by[prose]["c"] and by[prose]["s"] == 0


# ------------------------------------------------------------------ graph
def test_triangle_count_toy(spark):
    # K4 minus one edge: nodes 1-4, edges of K4 except (3,4):
    # triangles (1,2,3) and (1,2,4)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (4, 2), (2, 1)],  # dup + reversed
        "src bigint, dst bigint",
    )
    row = graph.triangle_count(edges).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 5, 2)


def test_triangle_count_no_triangles(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    assert graph.triangle_count(edges).first()["n_triangles"] == 0


# ------------------------------------------------------------------ quality
def test_expectation_report(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, v=5.0, s="ok"),
            Row(id=2, v=50.0, s="bad"),
            Row(id=2, v=None, s="ok"),
        ]
    )
    dim = spark.createDataFrame([Row(k=1), Row(k=2)])
    rules = [
        {"name": "v_not_null", "kind": "not_null", "column": "v"},
        {"name": "id_unique", "kind": "unique", "column": "id"},
        {"name": "v_range", "kind": "range", "column": "v", "lo": 0, "hi": 10},
        {"name": "s_set", "kind": "in_set", "column": "s", "values": ["ok"]},
        {"name": "s_re", "kind": "regex", "column": "s", "pattern": "o.*"},
        {
            "name": "id_ref",
            "kind": "ref",
            "column": "id",
            "dim_df": dim,
            "dim_col": "k",
        },
    ]
    rep = {
        r["rule_name"]: r
        for r in quality.expectation_report(df, rules).collect()
    }
    assert rep["v_not_null"]["n_violations"] == 1
    assert rep["id_unique"]["n_violations"] == 1  # id=2 twice
    assert rep["v_range"]["n_violations"] == 2  # 50.0 out of range + null
    assert rep["s_set"]["n_violations"] == 1
    assert rep["s_re"]["n_violations"] == 1  # "bad"
    assert rep["id_ref"]["n_violations"] == 0
    assert all(r["n_rows"] == 3 for r in rep.values())
    assert rep["id_ref"]["passed"] and not rep["v_range"]["passed"]


# ------------------------------------------------------------- phash
def test_phash_near_dup_guarantee(spark):
    from arc_jupyter_spark.operators import multimodal

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0b111),           # hamming 3 -> must be found
        (3, base ^ (3 * (1 + (1 << 16) + (1 << 32) + (1 << 48)))),  # 2/band
        (4, 0x7EDCBA9876543210),     # unrelated
    ]
    df = spark.createDataFrame(rows, "id bigint, ph bigint")
    pairs = multimodal.phash_near_dup(df, "id", "ph", bands=4, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got == {(1, 2): 3}


def test_phash_near_dup_rejects_low_bands(spark):
    from arc_jupyter_spark.operators import multimodal
    import pytest

    df = spark.createDataFrame([(1, 2)], "id bigint, ph bigint")
    with pytest.raises(ValueError):
        multimodal.phash_near_dup(df, "id", "ph", bands=2, max_hamming=3)


# ------------------------------------------------------------- epochs
def test_epoch_mixture_budgets(spark):
    from arc_jupyter_spark.operators import sampling

    rows = [(i, "small" if i < 3 else "big") for i in range(13)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = sampling.epoch_mixture(
        df, "source", "doc_id", {"small": 100, "big": 4}, max_epochs=2
    )
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    # small: 3 docs, budget 100 -> capped at 2 epochs = 6 rows
    # big: 10 docs, budget 4 -> 1 partial epoch of 4
    assert by == {"small": 6, "big": 4}
    # epochs labelled 0..k-1 and deterministic reruns
    assert sorted(
        r["epoch"] for r in out.where("source='small'").select("epoch").collect()
    ) == [0, 0, 0, 1, 1, 1]
    again = sampling.epoch_mixture(
        df, "source", "doc_id", {"small": 100, "big": 4}, max_epochs=2
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_epoch_mixture_zero_budget_drops_source(spark):
    from arc_jupyter_spark.operators import sampling

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, source string")
    out = sampling.epoch_mixture(df, "source", "doc_id", {"a": 1})
    assert [r["source"] for r in out.collect()] == ["a"]


# ---------------------------------------------------- url properties
def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over a structured URL corpus —
    canonical form must be a fixed point (otherwise dedup keys depend
    on how many times a pipeline normalizes)."""
    from itertools import product

    schemes = ["http", "HTTPS"]
    hosts = ["Ex.COM", "a.b.org:443", "h.io:80", "h.io:8080"]
    paths = ["", "/", "/P/q/", "/x"]
    queries = ["", "?b=2&a=1", "?utm_source=s&z=9", "?gclid=1", "?a=%20&A=2"]
    frags = ["", "#f"]
    corpus = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in product(schemes, hosts, paths, queries, frags)
    ]
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(url=u) for u in corpus])
    once = df.select(urls.canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", urls.canonical_url(F.col("c1")).alias("c2")
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in twice if r["c1"] != r["c2"]]
    assert not bad, f"non-idempotent canonicalization: {bad[:5]}"


def test_canonical_url_malformed_passthrough(spark):
    """Scheme-less / relative / mailto URLs must pass through unchanged
    — NOT collapse into one degenerate '://' key that would make
    url_dedup silently merge unrelated documents."""
    raws = ["foo.html", "mailto:a@b.org", "/relative/path?x=1", "bar.html"]
    df = spark.createDataFrame([Row(id=i, url=u) for i, u in enumerate(raws)])
    got = {r["url"]: r["c"] for r in df.select(
        "url", urls.canonical_url(F.col("url")).alias("c")).collect()}
    assert got == {u: u for u in raws}
    kept = urls.url_dedup(df, "url", "id")
    assert kept.count() == 4  # nothing merged


def test_html_text_preserves_raw_angle_text(spark):
    df = spark.createDataFrame(
        [Row(h="<p>price < 100 and qty > 5</p><!-- note --><b>ok</b>")]
    )
    out = df.select(text.html_text(F.col("h")).alias("t")).first()["t"]
    assert out == "price < 100 and qty > 5 ok"
