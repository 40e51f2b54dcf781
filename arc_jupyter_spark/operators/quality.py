"""Data-quality expectation suite (Great-Expectations-shaped).

A warehouse/pipeline gate: declare per-column expectations, get back
one row per rule with its violation count. The whole single-table rule
set compiles into ONE aggregate projection (``SUM(CASE WHEN ...)`` per
rule), so a 50-rule suite over 100 TB is a single scan with map-side
partial aggregation — adding rules adds columns, not passes.
Referential rules (``ref``) need the dimension table and run as one
broadcast anti-join count each.

Rule kinds:
  ``not_null``       — value IS NULL
  ``unique``         — suite-level: n_rows - n_distinct violations
  ``range``          — value outside [lo, hi] (either bound optional)
  ``regex``          — value doesn't fully match the pattern
  ``in_set``         — value not in the allowed literal set
  ``ref``            — value has no match in ``dim_df[dim_col]``

Every count is integer — engine-exact, oracle-able as UNION ALL SQL.

Reference parity: the reference's validation surface is SQLValidate /
MetadataValidate (single-predicate, fail-the-pipeline —
`operators/execute.py` here); this adds the report-shaped multi-rule
gate a warehouse runs nightly, beyond the reference per the brief.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F


def _violation_flag(rule: dict[str, Any]) -> F.Column | None:
    """CASE-WHEN flag (1 = violation) for single-pass rule kinds."""
    col = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        cond = col.isNull()
    elif kind == "range":
        cond = F.lit(False)
        if "lo" in rule:
            cond = cond | (col < F.lit(rule["lo"]))
        if "hi" in rule:
            cond = cond | (col > F.lit(rule["hi"]))
        cond = col.isNull() | cond
    elif kind == "regex":
        cond = col.isNull() | ~col.rlike("^(?:" + rule["pattern"] + ")$")
    elif kind == "in_set":
        cond = col.isNull() | ~col.isin(*rule["values"])
    else:
        return None
    # COALESCE: SUM over zero rows is NULL, and an empty partition is
    # routine at scale — an empty table violates nothing
    return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast(
        "bigint"
    )


def expectation_report(
    df: DataFrame,
    rules: list[dict[str, Any]],
) -> DataFrame:
    """Run *rules* against *df* → ``[rule_name, col_name, n_violations,
    n_rows, passed]`` (one output row per rule, stable tiny result).

    ONE scan regardless of rule count: single-pass kinds fold into one
    aggregate projection; ``unique`` adds a ``count_distinct`` to the
    same aggregate (exact — a second shuffle internally, still one
    scan); ``ref`` rules become broadcast LEFT joins whose miss flag
    (dim key IS NULL) folds into the same aggregate — a 50-rule suite
    with 3 dimension checks is still one pass over the fact table.
    """
    # ref rules: broadcast-left-join each (small, distinct) dim side
    # once up front so the membership flag is an ordinary column
    probe = df
    ref_flags: dict[int, str] = {}
    for i, rule in enumerate(rules):
        if rule["kind"] != "ref":
            continue
        marker = f"__dq_ref_{i}"
        dim = (
            rule["dim_df"]
            .select(F.col(rule["dim_col"]).alias(rule["column"]))
            .distinct()
            .withColumn(marker, F.lit(1))
        )
        probe = probe.join(F.broadcast(dim), rule["column"], "left")
        ref_flags[i] = marker

    aggs: list[F.Column] = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    names: list[str] = []
    for i, rule in enumerate(rules):
        kind = rule["kind"]
        if kind == "unique":
            aggs.append(
                (
                    F.count(rule["column"])
                    - F.count_distinct(F.col(rule["column"]))
                )
                .cast("bigint")
                .alias(f"_v{i}")
            )
        elif kind == "ref":
            miss = (
                F.col(rule["column"]).isNotNull()
                & F.col(ref_flags[i]).isNull()
            )
            aggs.append(
                F.coalesce(F.sum(F.when(miss, 1).otherwise(0)), F.lit(0))
                .cast("bigint")
                .alias(f"_v{i}")
            )
        else:
            flag = _violation_flag(rule)
            if flag is None:
                raise ValueError(f"unknown rule kind: {kind!r}")
            aggs.append(flag.alias(f"_v{i}"))
        names.append(f"_v{i}")

    summary = probe.agg(*aggs).collect()[0]
    n_rows = summary["_n_rows"]

    rows = []
    for i, rule in enumerate(rules):
        n_viol = summary[names[i]]
        rows.append(
            (rule["name"], rule["column"], int(n_viol), int(n_rows), n_viol == 0)
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "rule_name string, col_name string, n_violations bigint, "
        "n_rows bigint, passed boolean",
    )
