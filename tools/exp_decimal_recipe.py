"""Experiment: verify the order-independent aggregate recipe agrees
bit-for-bit between Spark (any partitioning) and DuckDB.

Recipe: per-row CAST(x AS DECIMAL(p,s)) -> SUM (exact) -> CAST AS
DOUBLE -> (optional / COUNT) -> ROUND. If both engines agree exactly
and Spark agrees with itself across partitionings, the driver's value
hash can never flip on summation order.
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"

EXPRS = [
    ("sum_price", "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE), 2)"),
    ("avg_price", "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_extendedprice), 4)"),
    ("sum_disc_price", "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2)"),
    ("sum_charge", "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE), 2)"),
    ("avg_disc", "ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_discount), 6)"),
    ("sum_sqrt", "ROUND(CAST(SUM(CAST(SQRT(l_quantity) AS DECIMAL(25,10))) AS DOUBLE), 4)"),
    ("sum_pow", "ROUND(CAST(SUM(CAST(POWER(l_discount, 2) AS DECIMAL(25,10))) AS DOUBLE), 4)"),
    (
        "std_qty",
        "ROUND(SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(25,2)) * CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)"
        " - CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*))"
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
print("exact repr spot:", [f"{v!r}" for v in ref[0][1:3]])
print("ALL AGREE" if ok else "MISMATCH", flush=True)
spark.stop()
