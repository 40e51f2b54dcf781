"""HOCON cell-config parsing (the reference's actual cell language:
ArcInterpreter.scala:404 parses cells with ConfigFactory /
ConfigSyntax.CONF, so bare/%arc cells use unquoted keys, comments,
optional commas, triple-quoted strings and ${ENV} substitution)."""

import pytest

from arc_jupyter_spark.interpreter import Interpreter
from arc_jupyter_spark.plans.hocon import HoconError, parse_hocon
from arc_jupyter_spark.plans.pipeline import parse_pipeline

from tests.conftest import SF_DIR


def test_unquoted_keys_and_values_no_commas():
    got = parse_hocon(
        """
        {
          type = SQLTransform
          name = my stage
          persist = true
          numPartitions = 4
        }
        """
    )
    assert got == {
        "type": "SQLTransform",
        "name": "my stage",
        "persist": True,
        "numPartitions": 4,
    }


def test_comments_commas_and_colon_separators():
    got = parse_hocon(
        """
        # leading comment
        {
          "a": 1,           // trailing comment
          b: [1, 2, 3],     # another
          c = nested value  # unquoted string with spaces
        }
        """
    )
    assert got == {"a": 1, "b": [1, 2, 3], "c": "nested value"}


def test_triple_quoted_sql_preserved_verbatim():
    got = parse_hocon(
        '{ sql = """SELECT *\nFROM t -- not a # comment\nWHERE x = "y" """ }'
    )
    assert 'WHERE x = "y"' in got["sql"]
    assert "\n" in got["sql"]


def test_env_substitution_and_concatenation():
    got = parse_hocon(
        "{ uri = ${BASE}\"/data.csv\", opt = ${?MISSING_VALUE} }",
        env={"BASE": "/tmp/x"},
    )
    assert got == {"uri": "/tmp/x/data.csv"}  # optional missing key dropped


def test_missing_required_substitution_raises():
    with pytest.raises(HoconError, match="NOPE"):
        parse_hocon("{ a = ${NOPE} }", env={})


def test_dotted_keys_nest_and_objects_merge():
    got = parse_hocon(
        """
        a.b = 1
        a { c = 2 }
        a.b = 3
        """
    )
    assert got == {"a": {"b": 3, "c": 2}}


def test_multiple_root_objects_become_list():
    got = parse_hocon("{ type = A }\n{ type = B }")
    assert got == [{"type": "A"}, {"type": "B"}]


def test_parse_pipeline_accepts_hocon_stage():
    stages = parse_pipeline(
        """
        {
          type = SQLTransform
          name = hocon stage
          sql = \"\"\"SELECT 1 AS one\"\"\"
          outputView = hocon_probe_out
        }
        """
    )
    assert len(stages) == 1
    assert stages[0].name == "hocon stage"


def test_arc_cell_hocon_end_to_end(ctx):
    """A verbatim Arc-style HOCON cell (unquoted keys, comments, no
    commas, environments list, triple-quoted SQL) through
    Interpreter.execute registers the output view."""
    ctx.environment = "test"
    interp = Interpreter(ctx=ctx)
    cell = f"""%arc
{{
  type = ParquetExtract
  name = "extract nation"          // reference-style stage
  environments = [production, test]
  inputURI = "{SF_DIR}/nation.parquet"
  outputView = hocon_nation_raw
}}
{{
  type = SQLTransform
  name = top nations
  environments = [production, test]
  sql = \"\"\"
    SELECT n_name    -- inline SQL comment survives
    FROM hocon_nation_raw
    WHERE n_regionkey = 0
  \"\"\"
  outputView = hocon_nation_out
}}
"""
    res = interp.execute(cell)
    assert res.df is not None
    assert interp.ctx.table("hocon_nation_out").count() > 0
    assert set(interp.ctx.table("hocon_nation_out").columns) == {"n_name"}
