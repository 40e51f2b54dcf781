"""Per-query wall decomposition: plan-build (driver-side Python /
DataFrame construction) vs execution (collect), plus stage count and
shuffle totals per executed query.

The bench wall for one query = build + analyze/optimize + execute.
This tool separates those so optimization effort lands where the time
actually goes (guide §1: measure first).

Usage: python tools/profile_queries.py [--passes N] [--out FILE]
         [sf_dir] [query ...]
Defaults: sf0.1, bench.py HEADLINE set, 2 passes (best-of).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default="/tmp/profile_queries.json")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from arc_jupyter_spark.metrics import SegmentMeter
    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries
    from bench import HEADLINE

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(master=f"local[{cpus}]", app_name="profile",
                          extra_conf={"spark.ui.enabled": "true"})
    spark.sql("SELECT 1").collect()
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    qs = queries()
    names = args.names or HEADLINE

    warm_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf_dir
    for name in names:
        qs[name](spark, warm_dir).collect()

    meter = SegmentMeter(spark)
    report: dict[str, dict] = {}
    for name in names:
        best = None
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            meter.segment()  # reset stage snapshot (build may run jobs)
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            seg = meter.segment()
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round((t1 - t0) + (t3 - t2), 3),
                "n_stages": seg["n_stages"],
                "shuffle_write_mb": seg["shuffle_write_mb"],
                "input_mb": seg["input_mb"],
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        report[name] = best
        print(f"{name:34s} build={best['build_s']:6.3f} "
              f"exec={best['exec_s']:6.3f} stages={best['n_stages']}")
        spark.sparkContext.setJobDescription(None)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
