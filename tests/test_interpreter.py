"""Cell-language tests: magic dispatch, options, env/secret/conf,
placeholder view lifecycle (reference semantics per SURVEY.md §2.A)."""

import pytest

from arc_jupyter_spark.context import PLACEHOLDER_VIEW
from arc_jupyter_spark.interpreter import Interpreter, completions, parse_args
from arc_jupyter_spark.operators.execute import ValidationError

from tests.conftest import SF_DIR


@pytest.fixture()
def interp(ctx):
    return Interpreter(ctx=ctx, input_fn=lambda key: f"value-of-{key}")


def test_parse_args_quote_aware():
    got = parse_args('outputView=out name="My Stage" numRows=5')
    assert got == {"outputView": "out", "name": "My Stage", "numRows": "5"}


def test_sql_registers_output_view(interp):
    res = interp.execute('%sql outputView=two\nSELECT 1 AS a UNION ALL SELECT 2')
    assert res.df.count() == 2
    assert interp.ctx.table("two").count() == 2
    assert "<table" in res.html


def test_sql_placeholder_view_dropped(interp):
    interp.execute("%sql\nSELECT 1 AS a")
    assert PLACEHOLDER_VIEW not in interp.ctx.view_names()


def test_sql_env_substitution(interp):
    interp.execute("%env\nN=3")
    res = interp.execute("%sql outputView=n3\nSELECT ${N} AS n")
    assert res.df.first()["n"] == 3


def test_sql_param_default(interp):
    res = interp.execute("%sql\nSELECT ${MISSING=7} AS n")
    assert res.df.first()["n"] == 7


def test_sqlvalidate_pass_and_fail(interp):
    ok = interp.execute(
        "%sqlvalidate\nSELECT TRUE AS valid, "
        "to_json(named_struct('message','fine')) AS message"
    )
    assert ok.data == {"message": "fine"}
    with pytest.raises(ValidationError):
        interp.execute(
            "%sqlvalidate\nSELECT FALSE AS valid, "
            "to_json(named_struct('message','bad')) AS message"
        )


def test_configexecute_merges_env(interp):
    interp.execute(
        "%configexecute\nSELECT to_json(named_struct('REGION','EUROPE')) AS parameters"
    )
    assert interp.ctx.env["REGION"] == "EUROPE"


def test_secret_masked_and_stored(interp):
    res = interp.execute("%secret\nAPI_KEY")
    assert interp.ctx.secrets["API_KEY"] == "value-of-API_KEY"
    assert "value-of" not in res.text
    assert "******" in res.text


def test_plaintext_secret_rejected(interp):
    with pytest.raises(ValueError, match="secret"):
        interp.execute('%sql\nSELECT \'{"secret": "hunter2"}\' AS j')


def test_conf_updates_session(interp):
    interp.execute("%conf numRows=7 truncate=99 monospace=true")
    assert interp.ctx.conf.num_rows == 7
    assert interp.ctx.conf.truncate == 99
    assert interp.ctx.conf.monospace is True
    with pytest.raises(ValueError, match="unknown %conf key"):
        interp.execute("%conf nosuch=1")


def test_schema_and_printschema(interp):
    interp.execute(f'%sql outputView=r\nSELECT * FROM parquet.`{SF_DIR}/region.parquet`')
    schema = interp.execute("%schema\nr")
    assert schema.data["type"] == "struct"
    tree = interp.execute("%printschema\nr")
    assert "r_name" in tree.text


def test_metadata_magic(interp):
    interp.execute(f'%sql outputView=rm\nSELECT * FROM parquet.`{SF_DIR}/region.parquet`')
    res = interp.execute("%metadata outputView=rm_meta\nrm")
    names = {r["name"] for r in res.df.collect()}
    assert {"r_regionkey", "r_name"} <= names
    assert "rm_meta" in interp.ctx.view_names()


def test_printmetadata(interp):
    interp.execute('%sql outputView=pm\nSELECT 1 AS a, CAST(1.5 AS DOUBLE) AS b')
    res = interp.execute("%printmetadata\npm")
    types = {e["name"]: e["type"] for e in res.data}
    assert types == {"a": "integer", "b": "double"}


def test_list_magic(interp, tmp_path):
    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.txt").write_text("yy")
    res = interp.execute(f"%list outputView=files\n{tmp_path}")
    rows = res.df.collect()
    assert [r["name"] for r in rows] == ["a.txt", "b.txt"]
    assert rows[1]["bytes"] == 2
    assert "files" in interp.ctx.view_names()


def test_arc_pipeline_cell(interp):
    res = interp.execute(
        '[{"type": "ParquetExtract", "name": "e",'
        f' "inputURI": "{SF_DIR}/nation.parquet", "outputView": "arc_nation"}},'
        '{"type": "SQLTransform", "name": "t",'
        ' "sql": "SELECT COUNT(*) AS n FROM arc_nation", "outputView": "arc_out"}]'
    )
    assert res.df.first()["n"] == 25


def test_unknown_magic(interp):
    with pytest.raises(ValueError, match="unknown magic"):
        interp.execute("%nosuch\nx")


def test_version_and_help(interp):
    assert "spark" in interp.execute("%version").data
    assert "%sql" in interp.execute("%help").text


def test_completions_include_tables(interp):
    """Per-table completers mirror the reference (OutputTable.scala:
    98-146): '%sql <t>' carries a flattened-column SELECT snippet plus
    %metadata/%schema shortcuts; every item has the reference's
    completion payload fields."""
    interp.execute("%sql outputView=comp_t\nSELECT 1 AS a, named_struct('x', 2) AS s")
    items = completions(interp.ctx)
    by_text = {i["text"]: i for i in items}
    assert "%sql" in by_text
    assert "%sql comp_t" in by_text
    snippet = by_text["%sql comp_t"]["snippet"]
    # flattened (leaf) columns, one per line, comma-leading continuation
    assert "SELECT\n  a\n  ,s.x\nFROM comp_t" in snippet
    assert by_text["%sql comp_t"]["language"] == "sql"
    for magic in ("%metadata", "%printmetadata", "%schema", "%printschema"):
        assert f"{magic} comp_t" in by_text
    for item in items:
        assert {"text", "type", "snippet", "language", "documentation", "sortBy"} <= set(item)


def test_completions_dynamic_conf_and_env(interp):
    interp.execute("%env\nMY_KEY=abc")
    interp.ctx.secrets["TOKEN"] = "s3cr3t"
    by_text = {i["text"]: i["snippet"] for i in completions(interp.ctx)}
    assert "numRows=20" in by_text["%conf"]
    assert "MY_KEY=abc" in by_text["%env"]
    assert "TOKEN=******" in by_text["%env"]  # masked to length
    assert "s3cr3t" not in by_text["%env"]


def test_format_error_chain():
    from arc_jupyter_spark.interpreter import format_error

    try:
        try:
            raise KeyError("root cause")
        except KeyError as inner:
            raise ValueError("outer failure") from inner
    except ValueError as exc:
        short = format_error(exc)
        full = format_error(exc, extended=True)
    assert short == "ValueError: outer failure"
    assert "caused by: KeyError: 'root cause'" in full


def test_conf_master_restarts_kernel_session(spark):
    """Kernel-frontend parity (reference ArcInterpreter.scala:520-526):
    with restart_on_master_change the %conf master cell tears down the
    session and rebuilds on the new master, carrying conf/env/secrets
    but NOT temp views. A fake factory keeps the shared test JVM
    alive; the kernel wires Interpreter(restart_on_master_change=True)
    to the real stop-and-rebuild factory."""
    from arc_jupyter_spark.context import ArcContext
    from arc_jupyter_spark.interpreter import Interpreter

    calls = []

    def fake_factory(master):
        calls.append(master)
        return spark

    interp = Interpreter(
        ctx=ArcContext(spark=spark),
        restart_on_master_change=True,
        session_factory=fake_factory,
    )
    interp.execute("%env K=V")
    interp.ctx.secrets["tok"] = "s3cr3t-x"
    interp.execute("%conf numRows=9")
    old_ctx = interp.ctx
    interp.execute("%conf master=local[2]")
    assert calls == ["local[2]"]
    assert interp.ctx is not old_ctx
    assert interp.ctx.conf.master == "local[2]"
    # carried state
    assert interp.ctx.env["K"] == "V"
    assert interp.ctx.secrets["tok"] == "s3cr3t-x"
    assert interp.ctx.conf.num_rows == 9
    # same master again: no second restart
    interp.execute("%conf master=local[2]")
    assert calls == ["local[2]"]


def test_conf_master_library_mode_no_restart(interp):
    """Library sessions only record the master (documented deviation)."""
    old_ctx = interp.ctx
    interp.execute("%conf master=local[3]")
    assert interp.ctx is old_ctx
    assert interp.ctx.conf.master == "local[3]"


def test_conf_master_restart_stops_streams_and_old_session(spark):
    """ADVICE r5: the restart must (1) stop the interpreter's OWN
    session via the factory's old_session argument — not whatever
    getActiveSession() holds — and (2) stop tracked streaming queries
    BEFORE the context swap, so a JVM-preserving factory cannot leave
    them running untracked."""
    from arc_jupyter_spark.context import ArcContext
    from arc_jupyter_spark.interpreter import Interpreter

    seen = {}

    def fake_factory(master, old_session):
        seen["master"] = master
        seen["old"] = old_session
        return spark

    class FakeQuery:
        name, id, isActive = "q", "1", True

        def stop(self):
            self.isActive = False
            seen["stream_stopped"] = True

    ctx = ArcContext(spark=spark)
    q = FakeQuery()
    ctx.track_stream(q)
    interp = Interpreter(
        ctx=ctx, restart_on_master_change=True, session_factory=fake_factory
    )
    interp.execute("%conf master=local[7]")
    assert seen["master"] == "local[7]"
    assert seen["old"] is spark  # the ctx's session, passed explicitly
    assert seen.get("stream_stopped") is True
    assert not q.isActive
    # user_data (lastView, stream registry) does not survive a restart
    assert "streaming_queries" not in interp.ctx.user_data
