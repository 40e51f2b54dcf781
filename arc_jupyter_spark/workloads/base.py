"""Workload registry plumbing + shared table loading."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload query (and optionally its DuckDB oracle)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def exact_sum(col, scale: int = 6):
    """Order-independent SUM over a double column, returned as DOUBLE.

    Per-row cast to DECIMAL(25, scale) is deterministic; the decimal
    SUM is exact, so the result cannot depend on partitioning or
    summation order (the driver's plain session partitions differently
    from build_session — round-1 q15/t05 hash flips came from exactly
    that). Mirror with CAST(SUM(CAST(x AS DECIMAL(25,s))) AS DOUBLE)
    in the DuckDB oracle.
    """
    return F.sum(col.cast(f"decimal(25,{scale})")).cast("double")


def load_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the parquet fixtures as temp views (explicit schemas come
    from the parquet footers; scans stay pushdown-able).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; it is read as raw int64 nanos
    (``nanosAsLong``) and converted to a microsecond TimestampType
    column — a pure projection, pushdown-safe.
    """
    for name in names or TABLES:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
