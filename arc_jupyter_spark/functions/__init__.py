"""Scalar function surface.

Every Spark SQL built-in passes through untouched (the reference adds
no function layer of its own — SURVEY.md §2.C). This package supplies
the Arc UDF plugin set (reference: ArcInterpreter.scala:378-381
registers them once per session).
"""

from arc_jupyter_spark.functions.udfs import register_udfs  # noqa: F401
