"""Bounded streaming preview: run a streaming DataFrame into an
in-memory sink, poll, stop on duration or row-count.

Reference semantics (Common.scala:171-222): memory sink, ``append``
output mode, random query name; poll every ``frequency_ms`` (default
1000, ArcInterpreter.scala:82); stop when ``duration_s`` elapses
(default 10, ArcInterpreter.scala:81) or the sink holds more than
``num_rows`` rows; final render from the memory table.
"""

from __future__ import annotations

import time
import uuid
from typing import Callable

from pyspark.sql import DataFrame


def preview_stream(
    df: DataFrame,
    num_rows: int = 20,
    duration_s: float = 10.0,
    frequency_ms: int = 1000,
    on_tick: Callable[[DataFrame], None] | None = None,
) -> DataFrame:
    """Run *df* (streaming) into a memory sink; return the collected
    batch DataFrame when the bounded preview finishes.

    The memory sink holds rows on the driver — previews must stay
    small (num_rows-bounded), which is exactly the reference's
    guardrail. Never use this as a production sink.
    """
    if not df.isStreaming:
        raise ValueError("preview_stream requires a streaming DataFrame")
    query_name = f"preview_{uuid.uuid4().hex[:12]}"
    query = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
    spark = df.sparkSession
    deadline = time.monotonic() + duration_s
    try:
        while time.monotonic() < deadline:
            time.sleep(frequency_ms / 1000.0)
            table = spark.table(query_name)
            if on_tick is not None:
                on_tick(table.limit(num_rows))
            if table.count() > num_rows:
                break
    finally:
        query.stop()
    # Materialize the preview and drop the sink table: the memory sink
    # pins its rows on the driver for the session's lifetime, so
    # repeated preview cells would leak driver memory otherwise. The
    # preview is row-bounded (the loop stops just past num_rows), so
    # collecting the drained sink is small by construction.
    sink = spark.table(query_name)
    rows = sink.collect()
    schema = sink.schema
    spark.catalog.dropTempView(query_name)
    return spark.createDataFrame(rows, schema)
