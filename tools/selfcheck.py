"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given scale factor, then compares row count, column
names, and order-insensitive values. Floats are compared EXACTLY
(full repr) — the driver value-hashes exact values, so a 1-ulp
difference fails there; 9-significant-digit normalization masked the
round-1 q15/t05 hash flips.

By default the Spark side runs on a PLAIN SparkSession (mirroring the
driver, which does NOT use build_session — round 1 proved that plain
vs tuned sessions partition differently and can flip order-dependent
float aggregates). Pass --tuned to use build_session instead.

Besides the fetchall() value comparison, each oracle is ALSO fetched
via ``duckdb .df()`` (pandas) and every shared column's numeric dtype
family is asserted against the Spark result schema. The driver hashes
through the pandas path, where DuckDB's HUGEINT (``SUM(<integer>)``)
and nullable BIGINT columns surface as float64 while Spark stays
int64 — bit-identical values, divergent hashes. fetchall() yields
Python ints either way, so without this mirror selfcheck is
structurally blind to the exact channel that burned rounds 1 and 3.

Usage: python tools/selfcheck.py [--tuned] [--loose] [--emit FILE]
       [--sample-complement] [sf_dir] [query ...]

``--sample-complement`` restricts the run (when no explicit query
list is given) to queries never sampled by any committed driver
round — cheap per-round insurance that the never-sampled tail's
green status is re-derived, not inherited.

``--emit FILE`` additionally writes the per-query results as JSON in
the driver's CORRECTNESS format ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}), so the full 195-query
matrix can be committed per round (SELFCHECK_r{N}.json) and diffed by
the judge instead of sampled. Queries with no oracle entry are
recorded rows-only (hash_match/schema_match null), mirroring the
driver's weaker check.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

LOOSE = False


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; canonicalize cell values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            # collapse -0.0 / 0.0
            if v == 0:
                v = 0.0
            return ("f", f"{v:.9g}" if LOOSE else repr(v))
        if isinstance(v, int):
            return ("i", v)
        if v is None:
            return ("n",)
        if isinstance(v, (list, tuple)):
            return ("l", tuple(canon(x) for x in v))
        return ("s", str(v))

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def dtype_mismatches(sdf, odf) -> list[str]:
    """Driver-fetch dtype mirror: compare the Spark result schema with
    the pandas dtypes of the oracle fetched via ``.df()``; return
    numeric-family mismatches (int vs float in either direction)."""
    import pandas as pd
    from pyspark.sql import types as T

    def spark_family(dt):
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return "int"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "float"
        if isinstance(dt, T.DecimalType):
            return "decimal"
        return "other"

    def pandas_family(series):
        if pd.api.types.is_bool_dtype(series.dtype):
            return "other"
        if pd.api.types.is_integer_dtype(series.dtype):
            return "int"
        if pd.api.types.is_float_dtype(series.dtype):
            return "float"
        if series.dtype == object:
            nn = series.dropna()
            if len(nn) and isinstance(nn.iloc[0], int):
                return "int"
            if len(nn) and isinstance(nn.iloc[0], float):
                return "float"
        return "other"

    sfam = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
    out = []
    for col in odf.columns:
        if col not in sfam:
            continue
        pfam = pandas_family(odf[col])
        if {sfam[col], pfam} <= {"int", "float", "decimal"} and sfam[col] != pfam:
            out.append(f"{col}: spark={sfam[col]} oracle_df={pfam}")
    return out


def _driver_sample_complement() -> set[str]:
    """Query names NEVER sampled by any committed driver round
    (CORRECTNESS_r*.json at the repo root)."""
    import glob
    import json
    import os

    from arc_jupyter_spark.workloads import queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                sampled.update(json.load(fh).keys())
        except (OSError, json.JSONDecodeError):
            continue
    comp = set(queries()) - sampled
    print(f"sample-complement: {len(comp)} never-driver-sampled queries "
          f"(driver has covered {len(sampled)})")
    return comp


def main() -> int:
    global LOOSE
    import duckdb

    from pyspark.sql import SparkSession

    from arc_jupyter_spark.workloads import oracle_sql, queries

    args = sys.argv[1:]
    tuned = "--tuned" in args
    LOOSE = "--loose" in args
    complement = "--sample-complement" in args
    emit_path = None
    if "--emit" in args:
        emit_path = args[args.index("--emit") + 1]
        args.remove(emit_path)
    args = [a for a in args if not a.startswith("--")]

    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if complement:
        # VERDICT r6 item 7: prioritize queries the DRIVER has never
        # sampled (union of all committed CORRECTNESS_r*.json keys),
        # so the never-sampled tail's green status is re-derived each
        # round instead of inherited. With no explicit query list the
        # run is restricted to that complement; an explicit list still
        # wins. Wire into CI as:
        #   python tools/selfcheck.py --sample-complement
        if not only:
            complement_set = _driver_sample_complement()
            if not complement_set:
                # ADVICE r7: an empty complement must not silently
                # fall through to the FULL suite
                print("sample-complement: driver has sampled every "
                      "query; nothing to re-derive")
                return 0
            only = complement_set

    if tuned:
        from arc_jupyter_spark.session import build_session

        spark = build_session(app_name="selfcheck")
    else:
        spark = SparkSession.builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    report: dict[str, dict] = {}
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
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark error: {exc}",
            }
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            report[name] = {
                "rows_match": len(srows) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": None,
            }
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None, "err": f"duckdb error: {exc}",
            }
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = dtype_mismatches(sdf, odf)
        schema_ok = sorted(scols) == sorted(ocols)
        if not schema_ok:
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        rows_ok = len(srows) == len(orows)
        if not rows_ok:
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        values_ok = False
        if not problems:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            values_ok = sn == on
            if not values_ok:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sn, on)) if a != b
                )
                problems.append(f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
        report[name] = {
            "rows_match": rows_ok,
            # the driver's schema/hash checks fold the dtype channel in:
            # a dtype-family mismatch flips its value hash even on
            # bit-identical values, so mirror that here
            "schema_match": schema_ok and not dtype_mismatches(sdf, odf),
            "hash_match": not problems and values_ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    if emit_path:
        import json

        with open(emit_path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {emit_path} ({len(report)} queries)")
    n_checked = len([n for n in qs if not only or n in only])
    print(f"\n{n_checked - len(failures)}/{n_checked} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
