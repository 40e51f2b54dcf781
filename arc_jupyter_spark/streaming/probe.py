"""Streaming micro-benchmark: rate-source throughput and batch latency.

The st-suite is correctness-only (availableNow-drained, deterministic
results); nothing there would notice a 5x streaming-throughput
regression. This probe runs a REAL unbounded micro-batch query — rate
source → event-time window + watermark → stateful aggregate → memory
sink — for a few seconds and reports the engine's own progress
metrics (StreamingQueryProgress): processed rows/s and trigger
(end-to-end micro-batch) latency. bench.py records it in
BENCH_DETAIL.json so regressions become visible round over round.

The workload shape is the canonical production one (watermarked
windowed aggregation, update mode); the rate source generates rows
JVM-side so the number measures the engine, not a parquet scan.
"""

from __future__ import annotations

import statistics
import time
import uuid

from pyspark.sql import SparkSession, functions as F


def rate_throughput_probe(
    spark: SparkSession,
    rows_per_second: int = 500_000,
    seconds: float = 10.0,
    partitions: int = 4,
) -> dict:
    """Run the probe; return {"rows_per_sec", "batch_latency_ms",
    "n_batches"} (medians over post-warmup batches; zeros if the run
    was too short to produce them — callers treat that as 'no data',
    not an error)."""
    name = f"bench_stream_{uuid.uuid4().hex[:8]}"
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )
    agg = (
        src.withWatermark("timestamp", "2 seconds")
        .groupBy(
            F.window("timestamp", "1 second").alias("w"),
            (F.col("value") % 16).alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + seconds
        while time.time() < deadline:
            time.sleep(0.25)
        progress = list(q.recentProgress)
    finally:
        q.stop()
        spark.catalog.dropTempView(name)

    # first two batches pay stream-initialization + state-store open;
    # steady state is what a long-running job delivers
    stats = [
        (
            p["processedRowsPerSecond"],
            p["durationMs"].get("triggerExecution", 0),
        )
        for p in progress[2:]
        if p.get("numInputRows", 0) > 0
    ]
    if not stats:
        return {"rows_per_sec": 0.0, "batch_latency_ms": 0.0, "n_batches": 0}
    return {
        "rows_per_sec": round(statistics.median(s[0] for s in stats), 1),
        "batch_latency_ms": round(
            statistics.median(s[1] for s in stats), 1
        ),
        "n_batches": len(stats),
    }
