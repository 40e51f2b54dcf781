"""Property-based differential testing: random scalar-expression trees
over lineitem evaluated by Spark AND DuckDB must agree (SURVEY.md §5
item 5). Expressions are generated in the dialect intersection; sums
are rounded to absorb float last-bit noise."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import SF_DIR

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    return con


def exprs(depth: int):
    base = st.sampled_from(NUM_COLS) | st.integers(1, 9).map(str)
    if depth == 0:
        return base
    sub = exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"ABS({e})"),
        sub.map(lambda e: f"ROUND({e}, 2)"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE(NULLIF({t[0]}, 0), {t[1]})"),
        st.tuples(sub, st.integers(1, 40), sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} > {t[1]} THEN {t[2]} ELSE {t[3]} END)"
        ),
        st.tuples(sub, sub).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=exprs(2))
def test_random_numeric_expression_agrees(spark, duck, expr):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    sql = f"SELECT ROUND(SUM({expr}), 1) AS v, COUNT(*) AS n FROM lineitem"
    srow = spark.sql(sql).first()
    drow = duck.execute(sql).fetchone()
    assert srow["n"] == drow[1]
    sv, dv = srow["v"], float(drow[0]) if drow[0] is not None else None
    if sv is None or dv is None:
        assert sv == dv
    else:
        # rounded sums over ~6k doubles agree to the displayed digit
        assert abs(sv - dv) <= max(1e-6 * abs(sv), 0.2)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=exprs(1), threshold=st.integers(1, 50))
def test_random_predicate_count_agrees(spark, duck, expr, threshold):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    sql = f"SELECT COUNT(*) AS n FROM lineitem WHERE {expr} > {threshold}"
    assert spark.sql(sql).first()["n"] == duck.execute(sql).fetchone()[0]


STR_FUNCS = [
    "UPPER({c})",
    "LOWER({c})",
    "SUBSTR({c}, 2, 5)",
    "TRIM({c})",
    "REPLACE({c}, '1', 'x')",
    "CONCAT({c}, '_', {c})",
    "REVERSE({c})",
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    f1=st.sampled_from(STR_FUNCS),
    f2=st.sampled_from(STR_FUNCS),
    col=st.sampled_from(["c_name", "c_mktsegment"]),
)
def test_random_string_expression_agrees(spark, duck, f1, f2, col):
    """Composed string functions must agree exactly (MIN/MAX/LENGTH-sum
    are order-independent and string-exact — no float tolerance)."""
    spark.read.parquet(f"{SF_DIR}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    duck.execute(
        f"CREATE OR REPLACE VIEW customer AS SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    expr = f2.format(c=f1.format(c=col))
    sql = (
        f"SELECT MIN({expr}) AS mn, MAX({expr}) AS mx,"
        f" SUM(LENGTH({expr})) AS ln, COUNT(DISTINCT {expr}) AS nd FROM customer"
    )
    srow = spark.sql(sql).first()
    drow = duck.execute(sql).fetchone()
    assert (srow["mn"], srow["mx"], srow["ln"], srow["nd"]) == (
        drow[0],
        drow[1],
        drow[2],
        drow[3],
    )


WIN_FUNCS = [
    "ROW_NUMBER()",
    "RANK()",
    "DENSE_RANK()",
    "NTILE(4)",
    "LAG(o_orderkey, 1, -1)",
    "LEAD(o_orderkey, 1, -1)",
]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=st.sampled_from(WIN_FUNCS), mod=st.integers(5, 50))
def test_random_window_function_agrees(spark, duck, fn, mod):
    """Window functions over a deterministic total order: the md5-free
    integer checksum of (value * key) must match exactly."""
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    duck.execute(
        f"CREATE OR REPLACE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    sql = f"""
    SELECT SUM(CAST(w AS BIGINT) * (o_orderkey % 97)) AS chk, COUNT(*) AS n
    FROM (
      SELECT o_orderkey,
             {fn} OVER (PARTITION BY o_custkey % {mod}
                        ORDER BY o_orderdate, o_orderkey) AS w
      FROM orders
    )
    """
    srow = spark.sql(sql).first()
    drow = duck.execute(sql).fetchone()
    assert (srow["chk"], srow["n"]) == (drow[0], drow[1])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10**6),
    k=st.integers(1, 40),
    wmod=st.integers(1, 500),
)
def test_priority_sample_agrees_with_duckdb(spark, seed, k, wmod):
    # priority sampling is integer arithmetic end to end, so the
    # selected id set must match DuckDB exactly for ANY weights
    # (including zero weights, which are excluded on both sides)
    from arc_jupyter_spark.operators.sampling import priority_sample

    rows = [(i + seed, (i * 7 + seed) % wmod) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = sorted(
        r["id"]
        for r in priority_sample(df, key_col="id", weight_col="w", k=k).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT id FROM (
              SELECT id,
                     CASE WHEN w > 0 THEN
                       (1000000 * (('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 7))::BIGINT)) // w
                     ELSE 9223372036854775807 END AS priority
              FROM t
            ) ORDER BY priority, id LIMIT ?
            """,
            [k],
        ).fetchall()
    )
    assert got == want
