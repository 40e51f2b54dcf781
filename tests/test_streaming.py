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


def test_interpreter_streaming_cell_bounded_preview(ctx):
    """A streaming pipeline cell renders through the bounded preview:
    the result the user sees is a batch snapshot of the memory sink."""
    from arc_jupyter_spark.interpreter import Interpreter

    interp = Interpreter(ctx=ctx)
    res = interp.execute(
        '%arc numRows=5 streamingDuration=10\n'
        '[{"type": "RateExtract", "name": "r", "rowsPerSecond": 50,'
        ' "outputView": "rate_cell_stream"}]'
    )
    assert res.df is not None and not res.df.isStreaming
    assert res.df.count() > 5  # stopped by row-count, drained sink returned
    assert "value" in res.text.splitlines()[1]


def test_streaming_session_flag_flips_extract(ctx, tmp_path):
    """%conf streaming=true makes file extracts use readStream
    (reference: ArcInterpreter.scala:300, 357)."""
    from arc_jupyter_spark.interpreter import Interpreter

    src = ctx.spark.range(20).selectExpr("id", "id * 2 AS dbl")
    path = str(tmp_path / "stream_src")
    src.write.parquet(path)
    schema = ctx.spark.read.parquet(path).schema

    interp = Interpreter(ctx=ctx)
    interp.execute("%conf streaming=true")
    stages = parse_pipeline(
        [{"type": "ParquetExtract", "name": "e", "inputURI": path,
          "outputView": "stream_view", "schema": schema}]
    )
    df = stages[0].load(ctx)
    assert df.isStreaming
    interp.execute("%conf streaming=false")
    assert not stages[0].load(ctx).isStreaming
