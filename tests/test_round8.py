"""Round-8 additions (VERDICT r7 items):

- multi-batch directory streams: the st15 CDC-dedup shape driven
  through >= 3 micro-batches via maxFilesPerTrigger, cross-batch
  exactly-once asserted against the batch ground truth (item 4);
- per-pipeline stage frames: every composed pipeline exposes its
  stages as separate DataFrames consumed by BOTH the headline query
  and bench.py's attribution breakdown (item 2).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
SF2_DIR = "/root/testdata/sf0.01"


def test_multibatch_cdc_ingest_exactly_once(spark):
    """Each distinct (source, digest) chunk reaches the append sink
    exactly once ACROSS micro-batches — the dropDuplicates state must
    suppress a digest that re-arrives in a later batch, which a
    single-batch drain (every st-suite run before round 8) never
    exercises."""
    from arc_jupyter_spark.streaming.probe import multibatch_cdc_ingest_probe

    rep = multibatch_cdc_ingest_probe(
        spark, SF_DIR, n_files=6, max_files_per_trigger=2
    )
    assert rep["n_batches"] >= 3, rep
    assert rep["exactly_once"], rep
    assert rep["duplicates_in_sink"] == 0
    assert rep["sink_rows"] == rep["distinct_expected"] > 0


def test_multibatch_state_actually_crosses_batches(spark):
    """Negative control for the probe: the fixture must contain
    digests that occur in MORE than one input file, otherwise
    'exactly once across batches' is vacuously true (no digest ever
    re-arrives and the dedup state is never consulted cross-batch)."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators.dedup import cdc_chunks
    from arc_jupyter_spark.workloads._duck_sql import CDC_MASK, CDC_WINDOW

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    # replicate the probe's file split: repartition(6) is hash-round-
    # robin on the row, so a digest's occurrences spread across files
    with_file = docs.repartition(6).withColumn(
        "file_id", F.spark_partition_id()
    )
    ch = cdc_chunks(with_file, id_col="doc_id", text_col="text",
                    window=CDC_WINDOW, mask=CDC_MASK)
    spanning = (
        ch.select("source", F.md5("chunk").alias("dg"), "file_id")
        .groupBy("source", "dg")
        .agg(F.countDistinct("file_id").alias("nf"))
        .where(F.col("nf") > 1)
        .count()
    )
    assert spanning > 0, (
        "no chunk digest spans two input files — the multibatch probe "
        "would not be testing cross-batch dedup state"
    )


def test_read_table_stream_honors_max_files_per_trigger(spark, tmp_path):
    """Directory-shaped table + maxFilesPerTrigger → multiple
    availableNow batches; row totals must still match the batch read
    (the round-7 bug class: a layout/option change silently dropping
    rows)."""
    from arc_jupyter_spark.workloads.base import read_table_stream

    src = spark.range(300).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS source"
    )
    table_dir = str(tmp_path / "docs.parquet")
    src.repartition(5).write.parquet(table_dir)
    stream = read_table_stream(
        spark, str(tmp_path), "docs", src.schema, max_files_per_trigger=2
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mb_rt_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    try:
        assert len(batches) >= 3  # 5 files / 2 per trigger
        assert spark.table("mb_rt_probe").count() == 300
    finally:
        spark.catalog.dropTempView("mb_rt_probe")


PIPELINE_FRAMES = {
    "p01": ("gate", "exact", "sample", "budget"),
    "p04": ("scrub", "exact", "shard"),
    "p07": ("url_dedup", "clean_gate", "cap", "shard"),
    "p08": ("gate", "best", "assign", "balance", "shard"),
    "p10": ("gate", "exact", "fuzzy", "counts"),
    "p11": ("chunk", "keep_first", "rebuild"),
}


@pytest.mark.parametrize("pipe", sorted(PIPELINE_FRAMES))
def test_pipeline_stage_frames_contract(spark, pipe):
    """Every composed pipeline's stage-frames function returns the
    documented stages in dependency order (bench.py attributes cost
    per stage by persisting them in insertion order), and each frame
    is a materializable DataFrame whose row count is monotonically
    non-increasing through the filtering stages that share a row
    grain (each later stage only ever drops rows)."""
    from arc_jupyter_spark.workloads.curation import p07_stage_frames
    from arc_jupyter_spark.workloads.llmops import (
        p01_stage_frames,
        p04_stage_frames,
        p08_stage_frames,
        p10_stage_frames,
        p11_stage_frames,
    )

    fns = {
        "p01": p01_stage_frames, "p04": p04_stage_frames,
        "p07": p07_stage_frames, "p08": p08_stage_frames,
        "p10": p10_stage_frames, "p11": p11_stage_frames,
    }
    frames = fns[pipe](spark, SF2_DIR)
    assert tuple(frames) == PIPELINE_FRAMES[pipe]
    counts = {name: df.count() for name, df in frames.items()}
    assert all(c > 0 for c in counts.values()), counts
    # same-grain filtering prefixes: later stage never adds rows
    same_grain = {
        "p01": ("gate", "exact", "sample", "budget"),
        "p04": ("scrub", "exact", "shard"),
        "p07": ("url_dedup", "clean_gate", "cap", "shard"),
        "p10": ("gate", "exact", "fuzzy"),
    }.get(pipe, ())
    seq = [counts[n] for n in same_grain]
    assert all(a >= b for a, b in zip(seq, seq[1:])), counts


# -- round-8 new operators (g07 / d22 / s16 / m12 / t44 / p12) --------


def test_kcore_matches_bruteforce_on_random_graph(spark):
    """The distributed peel must agree with a driver-side reference
    peel on random graphs, including the within-core degrees (the
    k-core is unique, so any correct peel converges to the same
    subgraph)."""
    import random

    from arc_jupyter_spark.operators.graph import kcore

    rng = random.Random(8)
    for trial, k in ((0, 2), (1, 3), (2, 4)):
        n = 40
        edges = set()
        for _ in range(150):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
        # reference: iterative deletion to fixpoint
        adj = {u: set() for u in range(n)}
        for a, b in edges:
            adj[a].add(b)
        alive = {u for u in adj if adj[u]}
        while True:
            weak = {u for u in alive if len(adj[u] & alive) < k}
            if not weak:
                break
            alive -= weak
        expect = sorted(
            (u, len(adj[u] & alive)) for u in alive
            if len(adj[u] & alive) >= k
        )
        df = spark.createDataFrame(list(edges), ["src", "dst"])
        got = sorted(
            (r["node"], r["degree"]) for r in kcore(df, k=k).collect()
        )
        assert got == expect, (trial, k, got[:5], expect[:5])


def test_kcore_empty_core(spark):
    from arc_jupyter_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2), (2, 1), (2, 3), (3, 2)],
                               ["src", "dst"])
    assert kcore(df, k=5).count() == 0


def test_kcore_oracle_round_budget(spark):
    """The g07 oracle unrolls 6 peel rounds; the Spark loop must
    converge within that budget at the oracle's gate scale (sf0.01) or
    the chained-CTE fixpoint argument breaks."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.operators.graph import kcore
    from arc_jupyter_spark.workloads.llmops import _G07_EDGES, _G07_K

    for t in ("orders", "lineitem"):
        spark.read.parquet(f"{SF2_DIR}/{t}.parquet").createOrReplaceTempView(t)
    pairs = spark.sql(_G07_EDGES)
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    full = {tuple(r) for r in kcore(edges, k=_G07_K).collect()}
    budget = {tuple(r) for r in kcore(edges, k=_G07_K, max_rounds=6).collect()}
    assert full == budget and full


def test_edit_verified_pairs_confirms_and_rejects(spark):
    """The verify stage must keep a small-edit pair and reject a
    word-shuffle pair that shares every shingle-set element but has a
    large edit distance (the false-positive class Jaccard can't see)."""
    from arc_jupyter_spark.operators.dedup import edit_verified_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "s"),
        (2, base + " mu", "s"),                      # near-edit of 1
        (3, "kappa iota theta eta zeta epsilon delta gamma beta alpha", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["id_a"], r["id_b"]): r["rel_e6"]
        for r in edit_verified_pairs(
            df, "doc_id", "text", shingle_len=1,
            candidate_threshold=0.5, block_col="source",
            max_rel_e6=1_000_000,
        ).collect()
    }
    # (1,2) and (1,3)/(2,3) are all shingle-candidates at n=1, but
    # only (1,2) survives a 30% relative-edit gate
    assert (1, 2) in got and got[(1, 2)] <= 300_000
    assert (1, 3) in got and got[(1, 3)] > 300_000


def test_range_neighbors_matches_bruteforce(spark):
    import math
    import random

    from arc_jupyter_spark.operators.similarity import range_neighbors

    rng = random.Random(16)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    tau = 300_000
    got = {
        (r["query_id"], r["vec_id"]): r["cosine_e6"]
        for r in range_neighbors(
            df,
            df.where("vec_id < 2").selectExpr(
                "vec_id as query_id", "embedding"
            ),
            tau_e6=tau,
        ).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    expect = {}
    for qid in (0, 1):
        for vid, v in vecs:
            e6 = math.floor(cos(vecs[qid][1], v) * 1_000_000 + 0.5)
            if e6 >= tau:
                expect[(qid, vid)] = e6
    assert got == expect and len(expect) > 2


def test_audio_resample_roundtrip_exact(spark):
    """Hand-replay the decode → decimate → encode → decode chain for
    one id and compare every reported stat."""
    from arc_jupyter_spark.operators.multimodal import (
        audio_resample_stats,
        synthesize_wav,
    )

    i = 7
    df = spark.createDataFrame([(i,)], ["doc_id"])
    row = (
        audio_resample_stats(synthesize_wav(df, id_col="doc_id"))
        .select("resample_stats.*")
        .first()
    )
    n = 192 + (i % 4) * 64
    smp = [((i * 31 + 7 * k * k) % 4096) - 2048 for k in range(n)]
    res = [(smp[2 * j] + smp[2 * j + 1]) // 2 for j in range(n // 2)]
    assert row["rate_out"] == 4000
    assert row["n_out"] == n // 2
    assert row["checksum"] == sum((j + 1) * s for j, s in enumerate(res))
    assert row["energy_out"] == sum(s * s for s in res)


def test_p12_stage_frames_contract(spark):
    """Stages in dependency order; the dedup stage only drops rows;
    the cap stage enforces the per-source quota."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.workloads.llmops import _P12_CAP, p12_stage_frames

    frames = p12_stage_frames(spark, SF2_DIR)
    assert list(frames) == ["diff", "dedup", "cap"]
    n_diff = frames["diff"].count()
    n_dedup = frames["dedup"].count()
    n_cap = frames["cap"].count()
    assert n_diff >= n_dedup >= n_cap > 0
    worst = (
        frames["cap"].groupBy("source").count()
        .agg(F.max("count")).first()[0]
    )
    assert worst <= _P12_CAP
