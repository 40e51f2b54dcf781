"""Driver-facing workload registry.

Each named query is a ``(spark, sf_dir) -> DataFrame`` callable paired
(when SQL-expressible) with an ANSI-SQL oracle string DuckDB runs on
the same parquet tables. Column names and rounding are mirrored on both
sides so the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arc_jupyter_spark.workloads import (  # noqa: F401
    curation,
    llmops,
    relational,
    stage_queries,
    streaming_queries,
)
from arc_jupyter_spark.workloads.base import ORACLES, QUERIES
from arc_jupyter_spark.workloads.oracle_casts import apply_oracle_casts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # apply_oracle_casts closes the DuckDB HUGEINT -> pandas float64
    # channel in the driver's oracle fetch (see oracle_casts.py)
    return {name: apply_oracle_casts(name, sql) for name, sql in ORACLES.items()}
