"""HTTP stages against a local in-process server; environment gating;
UDF auto-registration; JDBC extract roundtrip via in-memory Derby."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from arc_jupyter_spark.context import ArcContext
from arc_jupyter_spark.interpreter import Interpreter
from arc_jupyter_spark.plans.pipeline import parse_pipeline, run_pipeline


@pytest.fixture(scope="module")
def http_url():
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"status": "up"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"null")
            if isinstance(payload, list):
                out = json.dumps([f"echo:{p}" for p in payload]).encode()
            else:
                out = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *args):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_http_extract(ctx, http_url):
    run_pipeline(parse_pipeline(
        [{"type": "HTTPExtract", "name": "h", "uri": f"{http_url}/doc",
          "outputView": "http_v"}]), ctx)
    row = ctx.table("http_v").first()
    assert json.loads(row["body"]) == {"status": "up"}


def test_http_execute_2xx(ctx, http_url):
    run_pipeline(parse_pipeline(
        [{"type": "HTTPExecute", "name": "h", "uri": f"{http_url}/hook",
          "payload": {"ping": 1}}]), ctx)


def test_http_transform_batches(ctx, http_url):
    src = ctx.spark.createDataFrame([("a",), ("b",), ("c",)], ["value"])
    ctx.register(src, "http_in")
    run_pipeline(parse_pipeline(
        [{"type": "HTTPTransform", "name": "t", "inputView": "http_in",
          "outputView": "http_out", "uri": http_url, "batchSize": 2}]), ctx)
    got = {r["value"]: r["response"] for r in ctx.table("http_out").collect()}
    assert got == {"a": "echo:a", "b": "echo:b", "c": "echo:c"}


def test_environment_gates_stages(ctx):
    interp = Interpreter(ctx=ctx)
    interp.execute("%conf environment=production")
    interp.execute(json.dumps([
        {"type": "SQLTransform", "name": "always",
         "sql": "SELECT 1 AS a", "outputView": "ig_always"},
        {"type": "SQLTransform", "name": "prod_only", "environments": ["production"],
         "sql": "SELECT 2 AS a", "outputView": "ig_prod"},
        {"type": "SQLTransform", "name": "test_only", "environments": ["test"],
         "sql": "SELECT 3 AS a", "outputView": "ig_test"},
    ]))
    views = ctx.view_names()
    assert "ig_always" in views and "ig_prod" in views
    assert "ig_test" not in views


def test_arc_udfs_registered_by_build_session(spark):
    from arc_jupyter_spark.functions import register_udfs

    register_udfs(spark)  # idempotent; test session is built directly
    row = spark.sql(
        "SELECT get_json_double_array('{\"a\": {\"b\": [1.5, 2.5]}}', '$.a.b') AS arr,"
        " struct_keys(named_struct('x', 1, 'y', 2)) AS ks"
    ).first()
    assert row["arr"] == [1.5, 2.5]
    assert row["ks"] == ["x", "y"]


def test_jdbc_extract_roundtrip_derby(ctx, tmp_path):
    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    run_pipeline(parse_pipeline([
        {"type": "JDBCExecute", "name": "ddl", "jdbcUrl": url,
         "sql": "CREATE TABLE jt (id INT, name VARCHAR(20))"},
        {"type": "JDBCExecute", "name": "dml", "jdbcUrl": url,
         "sql": "INSERT INTO jt VALUES (1,'alpha'), (2,'beta')"},
        {"type": "JDBCExtract", "name": "read", "jdbcUrl": url,
         "tableName": "jt", "outputView": "jdbc_v"},
    ]), ctx)
    got = {(r["ID"], r["NAME"]) for r in ctx.table("jdbc_v").collect()}
    assert got == {(1, "alpha"), (2, "beta")}


def test_get_json_array_is_jvm_side(spark):
    """The get_json_*_array functions must compile to built-in
    expressions (SQL scalar functions) — no Python eval in the plan."""
    from arc_jupyter_spark.functions import register_udfs

    register_udfs(spark)
    df = spark.sql(
        "SELECT get_json_long_array('{\"xs\": [1, 2, 3]}', '$.xs') AS xs,"
        " get_json_integer_array('{\"a\": {\"b\": [4]}}', '$.a.b') AS b,"
        " get_json_double_array('not json', '$.a') AS bad"
    )
    row = df.first()
    assert row["xs"] == [1, 2, 3] and row["b"] == [4] and row["bad"] is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_random_udf_varies_across_partitions(spark):
    """A driver-seeded RNG ships identical state to every task; the
    fixed UDF must produce distinct streams per partition."""
    from arc_jupyter_spark.functions import register_udfs

    register_udfs(spark)
    vals = [
        r["r"]
        for r in spark.range(0, 8, 1, 8).selectExpr("random() AS r").collect()
    ]
    assert len(set(vals)) > 1, f"identical values across partitions: {vals}"
    assert all(0.0 <= v < 1.0 for v in vals)
