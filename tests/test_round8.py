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
