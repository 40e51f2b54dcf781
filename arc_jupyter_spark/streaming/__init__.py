"""Structured-streaming surface: bounded preview loop + helpers."""

from arc_jupyter_spark.streaming.preview import preview_stream  # noqa: F401
