"""Session context: view registry, persist, immutable views, env/secret
merge (reference: ArcInterpreter.scala:93-104, 339-361, 500-518)."""

import pytest

from arc_jupyter_spark.context import ArcContext


def test_register_and_table(ctx):
    df = ctx.spark.createDataFrame([(1,)], ["a"])
    ctx.register(df, "ctx_v1")
    assert ctx.table("ctx_v1").first()["a"] == 1
    assert ctx.user_data["lastView"] == "ctx_v1"


def test_persist_pins_view(ctx):
    df = ctx.spark.createDataFrame([(1,)], ["a"])
    out = ctx.register(df, "ctx_persisted", persist=True)
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    out.unpersist()


def test_immutable_views_reject_replacement(spark):
    ctx = ArcContext(spark, immutable_views=True)
    df = spark.createDataFrame([(1,)], ["a"])
    ctx.register(df, "ctx_immutable")
    with pytest.raises(ValueError, match="immutable"):
        ctx.register(df, "ctx_immutable")
    ctx.drop_view("ctx_immutable")


def test_merged_params_precedence(ctx):
    ctx.env["k"] = "env"
    ctx.secrets["s"] = "secret"
    merged = ctx.merged_params({"k": "override"})
    assert merged["k"] == "override"
    assert merged["s"] == "secret"


def test_drop_view(ctx):
    df = ctx.spark.createDataFrame([(1,)], ["a"])
    ctx.register(df, "ctx_dropme")
    ctx.drop_view("ctx_dropme")
    assert "ctx_dropme" not in ctx.view_names()
