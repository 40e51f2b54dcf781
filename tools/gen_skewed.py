"""Generate a ZIPFIAN-SKEWED variant of the sf0.1 test tables.

All scaling evidence so far (SCALING.md's 3-point sweep) runs on
uniform-ish TPC-H-shaped data; the salted operators (q42/q55) and the
``max_doc_freq`` stop-shingle cap exist precisely for skew, but
nothing measured them under a hot key. This writes
``/root/repo/.scaledata/skew01`` — same schema and scale as
``/root/testdata/sf0.1`` with deliberate hot-key mass:

- ``events``: ~40% of all events remapped to ONE hot user_id (the
  smallest c_custkey, so the q55 join still hits a dim row). The
  remap key is ``xxhash64(event_id)`` — deterministic, reproducible.
- ``documents``: a fixed 8-word sentence appended to ~50% of docs
  (one shingle with corpus-scale doc-frequency — the d03/d17
  stop-shingle cap must absorb it), and ``source`` rewritten to one
  hot value on ~60% of docs (t17's per-source cap window must bound
  it via WindowGroupLimit, not ship the hot source's full mass).
- every other table: copied unchanged (selfcheck registers all ten
  as DuckDB views up front, so the full set must exist).

Correctness on the skewed data is still oracle-checkable: the DuckDB
oracles are plain SQL over whatever parquet sits in the sf dir, so
``python tools/selfcheck.py /root/repo/.scaledata/skew01 <query...>``
closes the loop.

Usage: python tools/gen_skewed.py [--src /root/testdata/sf0.1] [--out DIR]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

HOT_SENTENCE = (
    " the quick brown fox jumps over the lazy dog"
)  # 9 words -> one guaranteed-hot 8-shingle


def main() -> int:
    from pyspark.sql import functions as F

    from arc_jupyter_spark.session import build_session

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scaledata/skew01")
    ap.add_argument("--minimal", action="store_true",
                    help="write only the probe tables (events, documents, "
                         "lineitem, customer) — enough for skew_probe.py, "
                         "NOT for selfcheck (which views all ten tables)")
    args = ap.parse_args()

    spark = build_session(app_name="gen-skewed")

    customer = spark.read.parquet(f"{args.src}/customer.parquet")
    hot_user = customer.agg(F.min("c_custkey")).first()[0]

    events = spark.read.parquet(f"{args.src}/events.parquet")
    skew_events = events.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(5)) < 2, F.lit(hot_user)
        ).otherwise(F.col("user_id")),
    )
    skew_events.write.mode("overwrite").parquet(f"{args.out}/events.parquet")

    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    skew_docs = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0,
            F.concat(F.col("text"), F.lit(HOT_SENTENCE)),
        ).otherwise(F.col("text")),
    ).withColumn(
        "source",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 3, F.lit("hot_source")
        ).otherwise(F.col("source")),
    )
    skew_docs.write.mode("overwrite").parquet(f"{args.out}/documents.parquet")

    copy_tables = ("lineitem", "customer") if args.minimal else (
        "lineitem", "customer", "orders", "supplier", "part",
        "region", "nation", "embeddings")
    for t in copy_tables:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")

    n_ev = spark.read.parquet(f"{args.out}/events.parquet")
    hot_n = n_ev.filter(F.col("user_id") == hot_user).count()
    total = n_ev.count()
    print(
        f"wrote {args.out}: hot user {hot_user} holds {hot_n}/{total} events "
        f"({100*hot_n/total:.0f}%)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
