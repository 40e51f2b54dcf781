"""Consistency gates on the driver contract surface: the things the
grading driver assumes about `__spark_entry__` and `bench.py` that no
single query test would catch drifting."""

from __future__ import annotations

import json


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"queries without oracle SQL: {missing}"
    stale = sorted(set(osql) - set(qs))
    assert not stale, f"oracles for unknown queries: {stale}"


def test_headline_is_a_subset_of_queries():
    import __spark_entry__ as e
    from bench import HEADLINE, SHARED_18

    qs = set(e.queries())
    assert set(HEADLINE) <= qs, sorted(set(HEADLINE) - qs)
    assert set(SHARED_18) <= set(HEADLINE)
    assert len(HEADLINE) == len(set(HEADLINE)), "duplicate headline entry"


def test_bench_summary_line_fits_driver_capture():
    """Round 3 was lost to a 2.5 KB final line the driver truncated;
    the compact summary (worst case: every SHARED_18 timing printed at
    4-digit seconds) must stay under the 1.4 KB guard bench.py also
    asserts at runtime."""
    from bench import HEADLINE, SHARED_18

    fake = {
        "metric": "headline_total_sec",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "n": len(HEADLINE),
        "first_pass_total": 9999.999,
        "shared18": 9999.999,
        "shared18_first_pass": 9999.999,
        "queries": {q: 9999.999 for q in SHARED_18},
    }
    assert len(json.dumps(fake)) < 1400


def test_oracles_only_reference_registered_views():
    """Every oracle must run against the driver's pre-registered view
    set — a stray table name would error only at driver time."""
    import re

    import __spark_entry__ as e

    views = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    # FROM/JOIN targets that are plain identifiers (CTE names are fine:
    # they are defined in the same statement and collected first; the
    # optional (...) after the name covers WITH RECURSIVE r(a, b) AS)
    pat = re.compile(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b(?!\s*\.)", re.I)
    cte_pat = re.compile(
        r"\b([a-z_][a-z0-9_]*)\s*(?:\([^()]*\))?\s+AS\s*"
        r"(?:(?:NOT\s+)?MATERIALIZED\s*)?\(",
        re.I,
    )
    extract_pat = re.compile(
        r"EXTRACT\s*\(\s*\w+\s+FROM\s+[^)]*\)", re.I
    )
    bad = {}
    for name, sql in e.oracle_sql().items():
        sql = extract_pat.sub(" ", sql)  # EXTRACT(year FROM col)
        ctes = {m.lower() for m in cte_pat.findall(sql)}
        refs = {m.lower() for m in pat.findall(sql)}
        unknown = refs - views - ctes - {"unnest", "generate_series", "read_blob"}
        if unknown:
            bad[name] = sorted(unknown)
    assert not bad, f"oracles referencing unregistered tables: {bad}"
