"""Streaming: rate source + bounded memory-sink preview loop
(reference semantics: Common.scala:171-222)."""

import pytest

from arc_jupyter_spark.plans.pipeline import parse_pipeline, run_pipeline
from arc_jupyter_spark.streaming.preview import preview_stream


def test_preview_rejects_batch_df(spark):
    with pytest.raises(ValueError, match="streaming"):
        preview_stream(spark.range(3))


def test_rate_extract_preview_bounded(ctx):
    stages = parse_pipeline(
        [{"type": "RateExtract", "name": "r",
          "rowsPerSecond": 50, "outputView": "rate_stream"}]
    )
    run_pipeline(stages, ctx)
    df = ctx.table("rate_stream")
    assert df.isStreaming
    out = preview_stream(df, num_rows=10, duration_s=15.0, frequency_ms=200)
    # loop must stop on the row-count condition well before duration
    assert out.count() > 10
    assert set(out.columns) == {"timestamp", "value"}
