"""Pipeline parsing, stage registry, and end-to-end runs
(reference: ArcInterpreter.scala:398-457 cell → stages → run)."""

import json

import pytest

from arc_jupyter_spark.operators.execute import ValidationError
from arc_jupyter_spark.plans.pipeline import (
    _snake,
    parse_pipeline,
    run_pipeline,
    stage_from_config,
)

from tests.conftest import SF_DIR


def test_snake_case_handles_acronyms():
    assert _snake("inputURI") == "input_uri"
    assert _snake("outputView") == "output_view"
    assert _snake("sqlParams") == "sql_params"
    assert _snake("numPartitions") == "num_partitions"
    assert _snake("persist") == "persist"


def test_unknown_stage_lists_known_types():
    with pytest.raises(ValueError, match="ParquetExtract"):
        stage_from_config({"type": "NopeStage", "name": "x"})


def test_parse_pipeline_accepts_json_text_dict_and_list():
    cfg = {"type": "SQLTransform", "name": "t", "sql": "SELECT 1 AS one"}
    assert len(parse_pipeline(json.dumps({"stages": [cfg]}))) == 1
    assert len(parse_pipeline({"stages": [cfg, cfg]})) == 2
    assert len(parse_pipeline([cfg])) == 1


def test_extract_sql_validate_end_to_end(ctx):
    stages = parse_pipeline(
        {
            "stages": [
                {
                    "type": "ParquetExtract",
                    "name": "e",
                    "inputURI": f"{SF_DIR}/region.parquet",
                    "outputView": "pipe_region",
                },
                {
                    "type": "SQLTransform",
                    "name": "t",
                    "sql": "SELECT count(*) AS n FROM pipe_region",
                    "outputView": "pipe_cnt",
                },
                {
                    "type": "SQLValidate",
                    "name": "v",
                    "sql": "SELECT n = 5 AS valid, 'ok' AS message FROM pipe_cnt",
                },
            ]
        }
    )
    run_pipeline(stages, ctx)
    assert ctx.table("pipe_cnt").first()["n"] == 5


def test_failing_sqlvalidate_raises(ctx):
    stages = parse_pipeline(
        [{"type": "SQLValidate", "name": "v",
          "sql": "SELECT false AS valid, 'boom' AS message"}]
    )
    with pytest.raises(ValidationError, match="boom"):
        run_pipeline(stages, ctx)


def test_missing_input_uri_is_a_clear_error(ctx):
    stages = parse_pipeline([{"type": "ParquetExtract", "name": "e"}])
    with pytest.raises(ValueError, match="inputURI is required"):
        run_pipeline(stages, ctx)


def test_environments_filtering(ctx):
    stages = parse_pipeline(
        [
            {"type": "SQLTransform", "name": "always",
             "sql": "SELECT 1 AS v", "outputView": "env_always"},
            {"type": "SQLTransform", "name": "prod_only",
             "environments": ["production"],
             "sql": "SELECT 2 AS v", "outputView": "env_prod"},
        ]
    )
    run_pipeline(stages, ctx, environment="test")
    assert "env_always" in ctx.view_names()
    assert "env_prod" not in ctx.view_names()


def test_param_substitution_in_sql(ctx):
    ctx.env["threshold"] = "3"
    stages = parse_pipeline(
        [{"type": "SQLTransform", "name": "t",
          "sql": "SELECT ${threshold} AS v, ${missing=9} AS d",
          "outputView": "param_out"}]
    )
    run_pipeline(stages, ctx)
    row = ctx.table("param_out").first()
    assert (row["v"], row["d"]) == (3, 9)
