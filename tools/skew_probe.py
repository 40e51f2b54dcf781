"""Measure skew resilience: wall time AND per-task straggler ratio
under the zipfian fixture (tools/gen_skewed.py).

For each skew-relevant query the probe runs the query on the uniform
sf0.1 data and on the skewed variant, and — via the Spark UI REST
API — pulls the task ``duration`` quantiles of every stage the run
executed. The headline number per query is the worst stage's
max/median task-duration ratio over stages whose median is >= 100 ms
(sub-100 ms stages are scheduling noise; a 40 ms max over a 5 ms
median is not a straggler). The bar (VERDICT r5): no single-task
straggler > 4x median, and skewed wall <= ~2x uniform wall for the
mitigated operators.

What each target exercises:
- q42_salted_agg  — salted two-phase agg (3-value group domain), at
  the sf1-scale skew fixture;
- q55_salted_join — content-salted fact-dim join vs a 40%-hot user.
  Measured at sf1 scale with ``autoBroadcastJoinThreshold=-1`` AND
  AQE skew-join mitigation OFF: in local mode the 150k-row dim always
  broadcasts and a broadcast join is skew-immune by construction, so
  forcing the shuffle join simulates exactly the 100 TB case the salt
  exists for (dim too big to broadcast, one reducer owns the hot key);
- q55_unsalted    — the SAME join WITHOUT salting under the same
  forced-shuffle confs (A/B evidence that the salt is load-bearing);
- d03_ngram_jaccard / d17_containment_pairs — the max_doc_freq
  stop-shingle cap vs a shingle present in ~50% of all docs (sf0.1
  documents — the multi-second family);
- t17_source_cap  — WindowGroupLimit vs one source holding ~60% of
  docs.

Prints one JSON line per query and writes SKEW.json; merge the table
into SCALING.md's skew section by hand (the numbers are host-load
sensitive — record loadavg when publishing).

Usage: python tools/skew_probe.py
(fixtures: tools/gen_skewed.py writes .scaledata/skew01 from sf0.1,
 and --src .scaledata/sf1 --out .scaledata/skew1 --minimal)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

API = "http://localhost:4040/api/v1/applications"


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _completed_stage_keys(app_id: str) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in _get(f"{API}/{app_id}/stages?status=COMPLETE")
    }


def _worst_straggler(app_id: str, new_stages: set[tuple[int, int]]) -> dict:
    """Max over qualifying stages of max/median task duration."""
    worst = {"ratio": 0.0, "stage": None, "median_ms": 0, "max_ms": 0}
    for sid, att in new_stages:
        try:
            q = _get(
                f"{API}/{app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.0,0.5,1.0"
            )["duration"]
        except Exception:  # noqa: BLE001 - 1-task stages have no summary
            continue
        median, mx = q[1], q[2]
        if median < 100:  # scheduling noise, not data skew
            continue
        ratio = mx / median
        if ratio > worst["ratio"]:
            worst = {
                "ratio": round(ratio, 2), "stage": sid,
                "median_ms": int(median), "max_ms": int(mx),
            }
    return worst


def q55_unsalted(spark, sf_dir: str):
    """q55's join WITHOUT the salt — the A/B control."""
    from pyspark.sql import functions as F

    from arc_jupyter_spark.workloads.base import load_views
    from arc_jupyter_spark.workloads.base import exact_sum

    load_views(spark, sf_dir, "events", "customer")
    fact = spark.table("events").select("user_id", "value")
    dim = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        fact.join(dim, "user_id")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum(F.col("value")), 2).alias("sum_value"),
        )
        .orderBy("segment")
    )


def main() -> int:
    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries

    ap = argparse.ArgumentParser()
    ap.add_argument("--best-of", type=int, default=2)
    args = ap.parse_args()

    spark = build_session(app_name="skew-probe", extra_conf={
        "spark.ui.enabled": "true",
    })
    app_id = spark.sparkContext.applicationId
    qs = queries()

    SF01, SKEW01 = "/root/testdata/sf0.1", "/root/repo/.scaledata/skew01"
    SF1, SKEW1 = "/root/repo/.scaledata/sf1", "/root/repo/.scaledata/skew1"
    # (name, fn, uniform_dir, skew_dir, force_shuffle_join)
    targets = [
        ("q42_salted_agg", qs["q42_salted_agg"], SF1, SKEW1, False),
        ("q55_salted_join", qs["q55_salted_join"], SF1, SKEW1, True),
        ("q55_unsalted", q55_unsalted, SF1, SKEW1, True),
        ("d03_ngram_jaccard", qs["d03_ngram_jaccard"], SF01, SKEW01, False),
        ("d17_containment_pairs", qs["d17_containment_pairs"], SF01, SKEW01, False),
        ("t17_source_cap", qs["t17_source_cap"], SF01, SKEW01, False),
    ]

    def run_one(fn, sf_dir):
        best_wall, best_straggler = None, None
        for _ in range(args.best_of):
            spark.catalog.clearCache()
            before = _completed_stage_keys(app_id)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            wall = time.time() - t0
            strag = _worst_straggler(
                app_id, _completed_stage_keys(app_id) - before
            )
            if best_wall is None or wall < best_wall:
                best_wall, best_straggler = wall, strag
        return {"wall_s": round(best_wall, 3), "straggler": best_straggler}

    report = {}
    for name, fn, uni_dir, skew_dir, force_shuffle in targets:
        if force_shuffle:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
            )
        try:
            entry = {
                "uniform": run_one(fn, uni_dir),
                "skew": run_one(fn, skew_dir),
                "forced_shuffle_join": force_shuffle,
            }
        finally:
            if force_shuffle:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
                spark.conf.unset(
                    "spark.sql.adaptive.autoBroadcastJoinThreshold"
                )
        entry["skew_factor"] = round(
            entry["skew"]["wall_s"] / max(entry["uniform"]["wall_s"], 1e-3), 2
        )
        report[name] = entry
        print(json.dumps({name: entry}))

    with open("/root/repo/SKEW.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote SKEW.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
