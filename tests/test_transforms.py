"""Transform stages: SQLTransform persist/placeholder, DiffTransform,
JSONTransform, SimilarityJoinTransform, EqualityValidate."""

import pytest

from arc_jupyter_spark.operators.execute import ValidationError
from arc_jupyter_spark.plans.pipeline import parse_pipeline, run_pipeline


def test_diff_transform_three_outputs(ctx):
    spark = ctx.spark
    ctx.register(spark.createDataFrame([(1,), (2,), (3,)], ["v"]), "diff_a")
    ctx.register(spark.createDataFrame([(2,), (3,), (4,)], ["v"]), "diff_b")
    stages = parse_pipeline(
        [{"type": "DiffTransform", "name": "d",
          "inputLeftView": "diff_a", "inputRightView": "diff_b",
          "outputIntersectionView": "diff_both",
          "outputLeftView": "diff_left", "outputRightView": "diff_right"}]
    )
    run_pipeline(stages, ctx)
    assert sorted(r["v"] for r in ctx.table("diff_both").collect()) == [2, 3]
    assert [r["v"] for r in ctx.table("diff_left").collect()] == [1]
    assert [r["v"] for r in ctx.table("diff_right").collect()] == [4]


def test_json_transform(ctx):
    ctx.register(ctx.spark.createDataFrame([(1, "x")], ["a", "b"]), "json_src")
    stages = parse_pipeline(
        [{"type": "JSONTransform", "name": "j",
          "inputView": "json_src", "outputView": "json_out"}]
    )
    run_pipeline(stages, ctx)
    out = ctx.table("json_out")
    assert out.columns == ["value"]
    assert out.first()["value"] == '{"a":1,"b":"x"}'


def test_equality_validate_passes_and_fails(ctx):
    spark = ctx.spark
    ctx.register(spark.createDataFrame([(1,), (2,)], ["v"]), "eq_a")
    ctx.register(spark.createDataFrame([(2,), (1,)], ["v"]), "eq_b")
    ctx.register(spark.createDataFrame([(1,), (3,)], ["v"]), "eq_c")
    ok = parse_pipeline(
        [{"type": "EqualityValidate", "name": "v",
          "leftView": "eq_a", "rightView": "eq_b"}]
    )
    run_pipeline(ok, ctx)  # order-insensitive equality: must not raise
    bad = parse_pipeline(
        [{"type": "EqualityValidate", "name": "v",
          "leftView": "eq_a", "rightView": "eq_c"}]
    )
    with pytest.raises(ValidationError):
        run_pipeline(bad, ctx)


def test_similarity_join_transform(ctx):
    spark = ctx.spark
    left = spark.createDataFrame(
        [(1, "123 Main Street Springfield"), (2, "742 Evergreen Terrace")],
        ["id", "addr"],
    )
    right = spark.createDataFrame(
        [(10, "123 Main St Springfield"), (20, "1600 Pennsylvania Avenue")],
        ["rid", "raddr"],
    )
    ctx.register(left, "sim_left")
    ctx.register(right, "sim_right")
    stages = parse_pipeline(
        [{"type": "SimilarityJoinTransform", "name": "s",
          "leftView": "sim_left", "rightView": "sim_right",
          "leftFields": ["addr"], "rightFields": ["raddr"],
          "threshold": 0.5, "outputView": "sim_out"}]
    )
    run_pipeline(stages, ctx)
    rows = ctx.table("sim_out").collect()
    pairs = {(r["id"], r["rid"]) for r in rows}
    assert (1, 10) in pairs
    assert (2, 20) not in pairs


def test_config_execute_merges_params(ctx):
    stages = parse_pipeline(
        [{"type": "ConfigExecute", "name": "c",
          "sql": "SELECT to_json(named_struct('region_filter', 'EUROPE')) AS parameters"}]
    )
    run_pipeline(stages, ctx)
    assert ctx.env.get("region_filter") == "EUROPE"
