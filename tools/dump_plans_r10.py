"""Dump .explain('formatted') for headline queries into plans/r10/.

Usage: python tools/dump_plans_r10.py <suffix> [query ...]
  suffix: 'before' or 'after'
With no query list, dumps every bench.py HEADLINE query.
Plan-only (no jobs run), so it is cheap and safe to run alongside
other Spark work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries
    from bench import HEADLINE

    spark = build_session(master="local[4]", app_name=f"plans-r10-{suffix}")
    qs = queries()
    if not names:
        names = HEADLINE

    outdir = "/root/repo/plans/r10"
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue().strip()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building plan: {exc}"
        with open(f"{outdir}/{name}_{suffix}.txt", "w", encoding="utf-8") as fh:
            fh.write(text + "\n")
        print(f"wrote {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
