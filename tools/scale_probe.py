"""Measure how headline-query wall time scales with data size.

Runs each headline query at sf0.01 and sf0.1 (10× rows) after warmup
and reports the scaling exponent k where wall ≈ data^k. k ≈ 0-0.3
means fixed-overhead-dominated at these sizes; k ≈ 1 is linear; k > 1.3
flags super-linear shapes (quadratic pair blowups, global sorts) that
would not survive a 100 TB run.

Usage: python tools/scale_probe.py
Prints one JSON line: {"query": {"small": s, "large": s, "k": x}, ...}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SMALL = "/root/testdata/sf0.01"
LARGE = "/root/testdata/sf0.1"
RATIO = 10.0


def main() -> int:
    import math

    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries
    from bench import HEADLINE

    spark = build_session(app_name="scale-probe")
    qs = queries()

    # warm every plan shape at both sizes
    for sf in (SMALL, LARGE):
        for name in HEADLINE:
            qs[name](spark, sf).collect()

    out: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        times = {}
        for label, sf in (("small", SMALL), ("large", LARGE)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 3)
        k = math.log(max(times["large"], 1e-3) / max(times["small"], 1e-3)) / math.log(RATIO)
        out[name] = {**times, "k": round(k, 2)}

    print(json.dumps(out))
    worst = max(out.items(), key=lambda kv: kv[1]["k"])
    print(f"# worst scaling: {worst[0]} k={worst[1]['k']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
