"""TypingTransform semantics: per-row ``_errors`` capture instead of
job failure (reference: Arc TypingTransform, SURVEY.md §2.B)."""

import datetime

from arc_jupyter_spark.operators.typing import apply_typing, parse_schema


def rows_by_id(df, id_col="id"):
    return {r[id_col]: r for r in df.collect()}


def test_clean_rows_have_empty_errors(spark):
    df = spark.createDataFrame([("1", "42", "2020-01-02")], ["id", "n", "d"])
    specs = parse_schema(
        [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "integer"},
            {"name": "d", "type": "date", "formatters": ["yyyy-MM-dd"]},
        ]
    )
    out = apply_typing(df, specs).collect()
    assert out[0]["n"] == 42
    assert out[0]["d"] == datetime.date(2020, 1, 2)
    assert out[0]["_errors"] == []


def test_dirty_rows_capture_per_field_errors(spark):
    df = spark.createDataFrame(
        [("a", "42", "2020-01-02"), ("b", "xx", "not-a-date")], ["id", "n", "d"]
    )
    specs = parse_schema(
        [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "integer"},
            {"name": "d", "type": "date", "formatters": ["yyyy-MM-dd"]},
        ]
    )
    by_id = rows_by_id(apply_typing(df, specs))
    assert by_id["a"]["_errors"] == []
    errs = by_id["b"]["_errors"]
    assert {e["field"] for e in errs} == {"n", "d"}
    assert by_id["b"]["n"] is None and by_id["b"]["d"] is None


def test_nullable_values_and_replacement(spark):
    df = spark.createDataFrame([("a", ""), ("b", "NULL"), ("c", "7")], ["id", "n"])
    specs = parse_schema(
        [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "integer", "nullableValues": ["", "NULL"]},
        ]
    )
    by_id = rows_by_id(apply_typing(df, specs))
    assert by_id["a"]["n"] is None and by_id["a"]["_errors"] == []
    assert by_id["b"]["n"] is None and by_id["b"]["_errors"] == []
    assert by_id["c"]["n"] == 7


def test_non_nullable_null_is_an_error(spark):
    df = spark.createDataFrame([("a", "")], ["id", "n"])
    specs = parse_schema(
        [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "integer", "nullable": False},
        ]
    )
    errs = apply_typing(df, specs).first()["_errors"]
    assert len(errs) == 1 and "non-nullable" in errs[0]["message"]


def test_boolean_true_false_values(spark):
    df = spark.createDataFrame(
        [("a", "true"), ("b", "N"), ("c", "maybe")], ["id", "b"]
    )
    specs = parse_schema([{"name": "id", "type": "string"}, {"name": "b", "type": "boolean"}])
    by_id = rows_by_id(apply_typing(df, specs))
    assert by_id["a"]["b"] is True
    assert by_id["b"]["b"] is False
    assert by_id["c"]["b"] is None and len(by_id["c"]["_errors"]) == 1


def test_timestamp_formatters_tried_in_order(spark):
    df = spark.createDataFrame(
        [("a", "2020-01-02 03:04:05"), ("b", "02/01/2020 03:04:05")], ["id", "ts"]
    )
    specs = parse_schema(
        [
            {"name": "id", "type": "string"},
            {"name": "ts", "type": "timestamp",
             "formatters": ["yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy HH:mm:ss"]},
        ]
    )
    by_id = rows_by_id(apply_typing(df, specs))
    expect = datetime.datetime(2020, 1, 2, 3, 4, 5)
    assert by_id["a"]["ts"] == expect and by_id["b"]["ts"] == expect
