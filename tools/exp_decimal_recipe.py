"""Experiment: verify order-independent aggregate recipes agree
bit-for-bit between Spark (any partitioning) and DuckDB.

Two recipes:
- decimal: CAST(x AS DECIMAL(p,s)) -> SUM (exact) -> CAST AS DOUBLE
- scaled-long (the fast path used in the workloads):
  CAST(FLOOR(x * S + 0.5) AS BIGINT) -> SUM (exact long) -> / S
  The per-row quantization is identical double math in both engines,
  the long SUM is exact, and long sums codegen ~3x faster than
  decimal sums (and ~1.2x faster than plain double sums). DuckDB's
  SUM(BIGINT) returns HUGEINT while Spark wraps at 2^63 — keep
  S * |x| * rowcount below ~9e18 (documented per call site).
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"


def slong(expr: str, scale: int) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE) / {scale}"


EXPRS = [
    ("sum_price_dec", "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE), 2)"),
    ("sum_price_sl", f"ROUND({slong('l_extendedprice', 100)}, 2)"),
    ("avg_price_sl", f"ROUND({slong('l_extendedprice', 100)} / COUNT(*), 4)"),
    ("sum_disc_price_sl", f"ROUND({slong('l_extendedprice * (1 - l_discount)', 1000000)}, 2)"),
    ("sum_charge_sl", f"ROUND({slong('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)}, 2)"),
    ("sum_sqrt_sl", f"ROUND({slong('SQRT(l_quantity)', 100000000)}, 4)"),
    ("avg_negbal_sl", f"ROUND({slong('0 - l_extendedprice', 100)} / COUNT(*), 4)"),
    (
        "std_qty_sl",
        "ROUND(SQRT((CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)"
        " * CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000"
        " - (CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100)"
        " * (CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100) / COUNT(*))"
        " / (COUNT(*) - 1)), 4)",
    ),
]

sel = ", ".join(f"{e} AS {n}" for n, e in EXPRS)
sql = f"SELECT l_returnflag, {sel} FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "7")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet(f"{SF}/lineitem.parquet")
results = {}
for label, df in [
    ("p1", base.coalesce(1)),
    ("p32", base.repartition(32)),
    ("p5", base.repartition(5, "l_suppkey")),
]:
    df.createOrReplaceTempView("lineitem")
    results[label] = [tuple(r) for r in spark.sql(sql).collect()]

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
results["duck"] = con.execute(sql).fetchall()

ok = True
ref = results["p1"]
for label, rows in results.items():
    same = rows == ref
    ok &= same
    print(f"{label}: {'MATCH' if same else 'DIFFER'}")
    if not same:
        for a, b in zip(ref, rows):
            if a != b:
                print("  ref :", a)
                print("  got :", b)
print("ALL AGREE" if ok else "MISMATCH", flush=True)
spark.stop()
