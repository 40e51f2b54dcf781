"""Measure how headline-query wall time scales with data size.

Times each query (best-of-N, warm) at up to three scale points —
sf0.01, sf0.1 (driver-generated), and sf1 (replica-shifted 10x of
sf0.1, built by ``tools/gen_scaled.py``) — and fits the scaling
exponent k where wall ~ data^k. Two-point fits can hide a quadratic
term inside fixed overhead; the third point exposes it: for each
query the report carries the pairwise exponents (k_small: 0.01→0.1,
k_large: 0.1→1) and the 3-point log-log least-squares k_fit.
k <= ~0.3 is fixed-overhead-dominated at these sizes, k = 1 linear,
k > 1.3 flags a super-linear shape (pair blowup, global sort) that
would not survive a 100 TB run. A healthy query has k_large <= ~1.1:
at the largest pair the fixed overhead is most amortized, so
k_large is the most honest upper bound on the asymptotic exponent.

Usage:
  python tools/scale_probe.py                 # 2-point, all headline
  python tools/scale_probe.py --sf1           # 3-point (needs gen_scaled)
  python tools/scale_probe.py --sf1 q79_interval_range_frame g01_pagerank
Prints one JSON line:
  {"query": {"s001": s, "s01": s, "s1": s, "k_small": x,
             "k_large": x, "k_fit": x}, ...}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

POINTS = [
    ("s001", "/root/testdata/sf0.01", 0.01),
    ("s01", "/root/testdata/sf0.1", 0.1),
    ("s1", "/root/repo/.scaledata/sf1", 1.0),
    # 4th decade for the substring family (VERDICT r6 item 6):
    # documents-only fixture (gen_scaled --replicas 100 --tables
    # documents), so only documents-only queries can use --sf10
    ("s10", "/root/repo/.scaledata/sf10", 10.0),
    # 5th point (VERDICT r7 item 5): pins t41's POST-broadcast-flip
    # slope directly — at sf10 the probe gram table has already
    # flipped BHJ→SMJ, so sf10→sf20 measures the pure post-flip
    # exponent instead of bounding it via d18/d19
    # (gen_scaled --replicas 200 --tables documents --out .../sf20)
    ("s20", "/root/repo/.scaledata/sf20", 20.0),
]


def _fit_k(sizes: list[float], times: list[float]) -> float:
    """Least-squares slope of log(time) on log(size)."""
    xs = [math.log(s) for s in sizes]
    ys = [math.log(max(t, 1e-3)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", action="store_true",
                    help="include the replica-shifted sf1 point")
    ap.add_argument("--sf10", action="store_true",
                    help="also include the documents-only sf10 point "
                         "(implies --sf1; documents-only queries)")
    ap.add_argument("--sf20", action="store_true",
                    help="also include the documents-only sf20 point "
                         "(implies --sf10; pins the post-flip slope)")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("queries", nargs="*",
                    help="subset of headline queries (default: all)")
    args = ap.parse_args()

    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries
    from bench import HEADLINE

    n_points = 5 if args.sf20 else (4 if args.sf10 else
                                    (3 if args.sf1 else 2))
    points = POINTS[:n_points]
    for _, path, _r in points[2:]:
        if not os.path.isdir(path):
            print(f"missing {path}; run tools/gen_scaled.py first",
                  file=sys.stderr)
            return 1

    names = args.queries or list(HEADLINE)
    spark = build_session(app_name="scale-probe")
    qs = queries()

    # warm every plan shape at every size
    for _, sf, _r in points:
        for name in names:
            qs[name](spark, sf).collect()

    out: dict[str, dict[str, float]] = {}
    import gc

    for name in names:
        # drop dead DataFrames' (local)checkpoint blocks between
        # queries: across a 70+-query sweep at sf1 they otherwise
        # accumulate in storage memory and the resulting GC/eviction
        # pressure inflated later queries up to 8x (q54: 20.1s under
        # pressure vs 2.56s fresh — measured round 5)
        gc.collect()
        spark.catalog.clearCache()
        times: list[float] = []
        rec: dict[str, float] = {}
        for label, sf, _r in points:
            best = None
            for _ in range(args.best_of):
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec[label] = round(best, 3)
            times.append(best)
        sizes = [r for _, _, r in points]
        rec["k_small"] = round(
            math.log(max(times[1], 1e-3) / max(times[0], 1e-3))
            / math.log(sizes[1] / sizes[0]),
            2,
        )
        if len(points) >= 3:
            rec["k_large"] = round(
                math.log(max(times[2], 1e-3) / max(times[1], 1e-3))
                / math.log(sizes[2] / sizes[1]),
                2,
            )
            rec["k_fit"] = round(_fit_k(sizes, times), 2)
        if len(points) >= 4:
            rec["k_xl"] = round(
                math.log(max(times[3], 1e-3) / max(times[2], 1e-3))
                / math.log(sizes[3] / sizes[2]),
                2,
            )
        if len(points) >= 5:
            # the post-flip slope: both endpoints share the SMJ plan
            rec["k_xxl"] = round(
                math.log(max(times[4], 1e-3) / max(times[3], 1e-3))
                / math.log(sizes[4] / sizes[3]),
                2,
            )
        out[name] = rec

    print(json.dumps(out))
    key = ("k_xxl" if len(points) >= 5
           else "k_xl" if len(points) >= 4
           else "k_large" if len(points) == 3 else "k_small")
    worst = max(out.items(), key=lambda kv: kv[1][key])
    print(f"# worst scaling ({key}): {worst[0]} {key}={worst[1][key]}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
