"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given scale factor, then compares row count, column
names, and order-insensitive values (floats compared exactly after the
queries' own rounding — if this passes, any value hash matches).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; canonicalize cell values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            # collapse -0.0 / 0.0 and format at 9 significant decimals
            if v == 0:
                v = 0.0
            return ("f", f"{v:.9g}")
        if isinstance(v, int):
            return ("i", v)
        if v is None:
            return ("n",)
        if isinstance(v, (list, tuple)):
            return ("l", tuple(canon(x) for x in v))
        return ("s", str(v))

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import oracle_sql, queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="selfcheck")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            if sn != on:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sn, on)) if a != b
                )
                problems.append(f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
