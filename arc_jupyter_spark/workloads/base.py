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

    Scaled-long recipe: quantize per row at 10^scale
    (``FLOOR(x * S + 0.5)`` — identical IEEE ops in Spark and DuckDB,
    sign-independent), SUM as BIGINT (exact), divide back. The result
    cannot depend on partitioning or summation order (the driver's
    plain session partitions differently from build_session — round-1
    q15/t05 hash flips came from exactly that), and long sums codegen
    ~3x faster than the equivalent DECIMAL sums and ~1.2x faster than
    plain double sums. Mirror with
    ``CAST(SUM(CAST(FLOOR(x * S + 0.5) AS BIGINT)) AS DOUBLE) / S``
    in the DuckDB oracle.

    Overflow headroom: keep S * |x| * rowcount below ~9e18 (Spark
    wraps silently past 2^63; DuckDB's HUGEINT doesn't, so they would
    diverge). scale=6 with |x|<=1e5 holds to ~1e8 rows per group;
    pick a smaller scale for larger magnitudes.
    """
    s = 10 ** scale
    return F.sum(F.floor(col * s + F.lit(0.5)).cast("bigint")).cast("double") / s


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events fixture with ``ts`` normalized to TimestampType.

    The fixture generator has shipped ``ts`` as parquet TIMESTAMP(NANOS)
    (which Spark's vectorized reader only accepts as raw int64 via
    ``nanosAsLong``) and as TIMESTAMP(MICROS) (read natively as
    TIMESTAMP_NTZ). Both normalize to a microsecond TimestampType column
    with identical values — a pure projection, pushdown-safe.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the ntz→ltz cast below and epoch arithmetic (unix_micros) are the
    # one session-timezone-sensitive spot in the workloads; DuckDB
    # treats naive timestamps as UTC, so pin the session to match on
    # whatever session the driver brings
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type == "long":  # int64 nanos under nanosAsLong
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":  # timestamp_ntz → session-tz timestamp
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_table_stream(
    spark: SparkSession, sf_dir: str, table: str, schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream read of ONE fixture table, robust to both layouts.

    The file-stream source requires a DIRECTORY path. The driver's
    testdata ships each table as a single file
    ``<sf_dir>/<table>.parquet``, which must be selected out of
    ``sf_dir`` with a pathGlobFilter; the generated ``.scaledata``
    fixtures ship tables as Spark-written DIRECTORIES of part files,
    where that same filter silently matches nothing (pathGlobFilter
    applies to leaf FILE names — ``part-*.parquet`` — so the stream
    read 0 rows; caught by the round-7 sf10 probe). Branch on the
    actual layout.

    ``max_files_per_trigger`` bounds each micro-batch to that many
    files (``Trigger.AvailableNow`` honors it, splitting a drain into
    multiple batches) — on a directory-shaped table this is how a
    bounded fixture exercises CROSS-batch stateful semantics instead
    of collapsing to one batch (VERDICT r7 item 4)."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    if schema is None:
        schema = spark.read.parquet(path).schema
    rs = spark.readStream.schema(schema)
    if max_files_per_trigger:
        rs = rs.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isdir(path):
        return rs.parquet(path)
    return rs.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream read of the events fixture, ``ts`` normalized to
    TimestampType (same nanos/micros tolerance as :func:`read_events`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = read_table_stream(spark, sf_dir, "events", schema)
    ts_type = schema["ts"].dataType.typeName()
    if ts_type == "long":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def load_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the parquet fixtures as temp views (explicit schemas come
    from the parquet footers; scans stay pushdown-able)."""
    for name in names or TABLES:
        if name == "events":
            df = read_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
