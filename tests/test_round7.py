"""Round-7 operators: CDC chunking, integer HITS, WAV PCM round trip,
epoch drift / KMV overlap invariants."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SF_DIR = "/root/testdata/sf0.001"


# -- CDC chunking ------------------------------------------------------

def _py_cuts(text: str, window: int = 8, mask: int = 64) -> list[int]:
    """Independent pure-Python mirror of the cut rule (1-based i)."""
    n = len(text)
    cuts = []
    for i in range(window, n):  # i in [window, n-1]
        h = sum(ord(text[i - 1 - j]) * (31 ** j) for j in range(window))
        if h % mask == 0:
            cuts.append(i)
    return cuts


def _py_chunks(text: str, window: int = 8, mask: int = 64) -> list[str]:
    bounds = [0] + _py_cuts(text, window, mask) + [len(text)]
    return [text[bounds[k]:bounds[k + 1]] for k in range(len(bounds) - 1)]


def _spark_chunks(spark, texts: list[str]) -> dict[int, list[str]]:
    from arc_jupyter_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = cdc_chunks(df, id_col="doc_id", text_col="text").collect()
    out: dict[int, list[str]] = {i: [] for i in range(len(texts))}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        out[r.doc_id].append(r.chunk)
    return out


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=400,
)


@SETTINGS
@given(st.lists(ascii_text, min_size=1, max_size=6))
def test_cdc_matches_python_mirror_and_reassembles(spark, texts):
    got = _spark_chunks(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _py_chunks(t)
        assert "".join(got[i]) == t  # chunks partition the text


def test_cdc_shift_invariance(spark):
    """The CDC property fixed-width chunking lacks: an insertion near
    the start leaves the tail chunks' digests unchanged."""
    base = ("the quick brown fox jumps over the lazy dog " * 40).strip()
    shifted = "XY " + base
    a = _py_chunks(base)
    b = _py_chunks(shifted)
    # all but the first few chunks must be identical
    assert len(set(a[2:]) & set(b)) >= len(a) - 4
    # and the Spark side agrees with the mirror on both
    got = _spark_chunks(spark, [base, shifted])
    assert got[0] == a and got[1] == b


def test_cdc_short_and_empty_docs(spark):
    got = _spark_chunks(spark, ["", "tiny", "exactly8"])
    assert got[0] == [""]          # empty text -> one empty chunk
    assert got[1] == ["tiny"]      # < window+1 chars -> whole doc
    assert got[2] == ["exactly8"]


# -- integer HITS ------------------------------------------------------

EDGES = [  # two hubs pointing at a shared authority + a chain
    (1, 10), (1, 11), (2, 10), (2, 12), (3, 12), (10, 20),
]


def _py_hits(edges, iterations):
    hubs = {u: 1 for u, _ in edges}
    auth = {}
    for _ in range(iterations):
        auth = {}
        for u, v in edges:
            if u in hubs:
                auth[v] = auth.get(v, 0) + hubs[u]
        hubs = {}
        for u, v in edges:
            if v in auth:
                hubs[u] = hubs.get(u, 0) + auth[v]
    return auth, hubs


def test_hits_matches_reference_loop(spark):
    from arc_jupyter_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: (r.authority, r.hub) for r in hits(df, iterations=2).collect()}
    auth, hubs = _py_hits(EDGES, 2)
    for node, (a, h) in got.items():
        assert a == auth.get(node, 0), node
        assert h == hubs.get(node, 0), node
    assert set(got) == set(auth) | set(hubs)


def test_hits_ranking_matches_normalized_float_hits(spark):
    """Unnormalized integer HITS must rank authorities exactly like
    the classic L1-normalized float iteration (linearity argument in
    the operator docstring)."""
    from arc_jupyter_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = sorted(
        ((r.authority, r.node) for r in hits(df, iterations=2).collect()
         if r.authority > 0),
        reverse=True,
    )
    h = {u: 1.0 for u, _ in EDGES}
    a = {}
    for _ in range(2):
        a = {}
        for u, v in EDGES:
            if u in h:
                a[v] = a.get(v, 0.0) + h[u]
        s = sum(a.values())
        a = {k: v / s for k, v in a.items()}
        h = {}
        for u, v in EDGES:
            if v in a:
                h[u] = h.get(u, 0.0) + a[v]
        s = sum(h.values())
        h = {k: v / s for k, v in h.items()}
    want = sorted(((v, k) for k, v in a.items()), reverse=True)
    assert [n for _, n in got] == [n for _, n in want]


def test_hits_authority_only_matches_full_positive_rows(spark):
    """authority_only must return exactly the full output's rows with
    authority > 0 (the dst-node rows), with identical values — the
    mode only skips the final hub update + full-outer stitch."""
    from arc_jupyter_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    for iters in (1, 2, 3):
        full = {
            r.node: r.authority
            for r in hits(df, iterations=iters).collect()
            if r.authority > 0
        }
        only = {
            r.node: r.authority
            for r in hits(
                df, iterations=iters, authority_only=True
            ).collect()
        }
        assert only == full, iters
        assert set(
            hits(df, iterations=iters, authority_only=True).columns
        ) == {"node", "authority"}


def test_hits_rejects_zero_iterations(spark):
    from arc_jupyter_spark.operators.graph import hits

    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, iterations=0)


# -- WAV PCM round trip ------------------------------------------------

def test_wav_pcm_roundtrip_exact():
    import array

    from arc_jupyter_spark.operators.media_codecs import (
        decode_wav_pcm,
        encode_wav,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    pcm = array.array("h", samples)
    payload = encode_wav(8000, 1, pcm.tobytes())
    rate, channels, got = decode_wav_pcm(payload)
    assert (rate, channels) == (8000, 1)
    assert got == samples


def test_wav_pcm_rejects_non_wav():
    from arc_jupyter_spark.operators.media_codecs import decode_wav_pcm

    assert decode_wav_pcm(b"\x89PNG\r\n\x1a\nnotawav") is None
    assert decode_wav_pcm(b"RIFF\x00\x00\x00\x00JUNK") is None


def test_audio_energy_stats_matches_synth(spark):
    from arc_jupyter_spark.operators.multimodal import (
        audio_energy_stats,
        synthesize_wav,
    )

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    wavs = synthesize_wav(ids, id_col="doc_id")
    rows = audio_energy_stats(
        wavs, binary_col="value", threshold=89_000_000
    ).collect()
    assert len(rows) == 8
    for r in rows:
        i = r.doc_id
        n = 192 + (i % 4) * 64
        samples = [((i * 31 + 7 * k * k) % 4096) - 2048 for k in range(n)]
        frames = [samples[f * 64:(f + 1) * 64] for f in range(n // 64)]
        energies = [sum(s * s for s in fr) for fr in frames]
        st_ = r.audio_stats
        assert st_.n_samples == n
        assert st_.n_frames == n // 64
        assert st_.energy_sum == sum(energies)
        assert st_.n_voiced == sum(e >= 89_000_000 for e in energies)


def test_audio_energy_stats_null_for_undecodable(spark):
    from arc_jupyter_spark.operators.multimodal import audio_energy_stats

    df = spark.createDataFrame(
        [(1, bytearray(b"not audio")), (2, None)],
        "doc_id long, value binary",
    )
    rows = {r.doc_id: r.audio_stats
            for r in audio_energy_stats(df, binary_col="value").collect()}
    assert rows[1] is None and rows[2] is None


# -- t42 / t43 invariants ----------------------------------------------

def test_t42_bounds_and_split(spark):
    from arc_jupyter_spark.workloads import queries

    rows = queries()["t42_epoch_drift"](spark, SF_DIR).collect()
    assert rows, "drift report must not be empty"
    for r in rows:
        assert r.n_a > 0 and r.n_b > 0  # the split actually splits
        assert 0 <= r.tv_e6 <= 1_000_000


def test_t43_bounds(spark):
    from arc_jupyter_spark.workloads import queries

    rows = queries()["t43_kmv_overlap"](spark, SF_DIR).collect()
    n_src = len({r.src_a for r in rows} | {r.src_b for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2  # every pair present
    for r in rows:
        assert 1 <= r.k_eff <= 128
        assert 0 <= r.n_common <= r.k_eff
        assert 0 <= r.jacc_est_e6 <= 1_000_000


def test_affine_alphabets_distinct_and_caesar_compatible():
    """(data-independent, lives here to avoid test_gen_scaled's
    sf1-presence skip) The affine cipher must give 312 pairwise-distinct permutations
    and reduce to the original Caesar rotation for replicas 0..25
    (keeps the committed sf1 fixture byte-identical across rounds)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_scaled", "/root/repo/tools/gen_scaled.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    src = "abcdefghijklmnopqrstuvwxyz"
    alphas = [m._affine_alphabet(i) for i in range(312)]
    assert len(set(alphas)) == 312
    for i in range(26):
        caesar = "".join(chr(ord("a") + (i + j) % 26) for j in range(26))
        assert alphas[i] == caesar, i
    assert all(sorted(a) == list(src) for a in alphas)


# -- m11 resize kernel -------------------------------------------------

def test_png_resize_roundtrip_matches_kernel(spark):
    from arc_jupyter_spark.operators.multimodal import (
        png_resize_roundtrip_stats,
        synthesize_png,
    )

    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    rows = png_resize_roundtrip_stats(
        synthesize_png(ids, id_col="doc_id"), binary_col="value",
        width=3, height=2,
    ).collect()
    for r in rows:
        i = r.doc_id
        w, h = 4 + i % 5, 3 + i % 4
        total = 0
        for y in range(2):
            sy = min(h - 1, (y * h) // 2)
            for x in range(3):
                sx = min(w - 1, (x * w) // 3)
                for c in range(3):
                    total += (i * 7 + 13 * ((sy * w + sx) * 3 + c)) % 256
        st_ = r.resized_stats
        assert (st_.width, st_.height) == (3, 2)
        assert st_.pixel_sum == total, i


def test_p11_reassembly_is_lossless_without_dups(spark):
    """A corpus with NO repeated chunks must reassemble byte-identically
    (keep-first drops nothing), and one with an exact duplicate doc
    must drop the duplicate's full length."""
    from arc_jupyter_spark.workloads import queries  # noqa: F401
    from arc_jupyter_spark.operators.dedup import cdc_chunks, base_hash28
    from pyspark.sql import functions as F

    # high-entropy texts (verified chunk-collision-free): low-entropy
    # or repetitive text creates identical chunks WITHIN a doc — tiny
    # fragments between close cut points — which keep-first correctly
    # drops (that is CDC's point); this test isolates the
    # no-duplicate case
    import hashlib

    uniq = [
        " ".join(hashlib.md5(f"a{i}".encode()).hexdigest()
                 for i in range(30)),
        " ".join(hashlib.md5(f"b{i}".encode()).hexdigest()
                 for i in range(32)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(uniq + [uniq[0]])],
        "doc_id long, text string",
    )
    ch = cdc_chunks(df, id_col="doc_id", text_col="text")
    dg = ch.withColumn("dg", F.md5("chunk"))
    firsts = dg.select("dg", "doc_id", "chunk_idx").groupBy("dg").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("f")
    ).select("dg", F.col("f.doc_id").alias("doc_id"),
             F.col("f.chunk_idx").alias("chunk_idx"))
    kept = dg.join(firsts, ["dg", "doc_id", "chunk_idx"], "left_semi")
    rebuilt = {
        r.doc_id: r.clean
        for r in kept.groupBy("doc_id").agg(
            F.concat_ws("", F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda x: x["chunk"])).alias("clean")
        ).collect()
    }
    assert rebuilt[0] == uniq[0]          # first occurrence intact
    assert rebuilt[1] == uniq[1]
    assert rebuilt.get(2, "") == ""       # exact dup fully scrubbed


def test_cdc_adversarial_identical_corpus(spark):
    """Worst-case chunk skew: N identical documents — every chunk
    digest's posting list is corpus-sized. The keep-first decision
    must stay a map-side partial MIN (no per-digest row explosion)
    and the profile/scrub semantics must hold exactly: distinct
    chunks == one document's chunk set, and only doc 0 keeps text."""
    import hashlib

    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators.dedup import cdc_chunks

    text = " ".join(hashlib.md5(f"x{i}".encode()).hexdigest()
                    for i in range(40))
    n_docs = 200
    df = spark.createDataFrame(
        [(i, text) for i in range(n_docs)], "doc_id long, text string"
    )
    ch = cdc_chunks(df, id_col="doc_id", text_col="text")
    dg = ch.withColumn("dg", F.md5("chunk"))
    per_doc_chunks = dg.where(F.col("doc_id") == 0).count()
    assert dg.count() == n_docs * per_doc_chunks
    # distinct digests collapse to ONE document's chunk set
    assert dg.select("dg").distinct().count() == per_doc_chunks
    # keep-first: every digest's first occurrence is doc 0
    firsts = dg.groupBy("dg").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("f")
    )
    assert firsts.where(F.col("f.doc_id") != 0).count() == 0
