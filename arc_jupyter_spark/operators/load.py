"""Load stages (sinks): ``df.write`` / ``df.writeStream``.

Reference inventory: SURVEY.md §2.B Load. At scale the knobs that
matter are ``partitionBy`` (directory layout → partition pruning for
readers), ``numPartitions`` (output file count — avoid millions of tiny
files), and save mode.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from arc_jupyter_spark.context import ArcContext
from arc_jupyter_spark.plans.pipeline import PipelineStage, register_stage


class _FileLoad(PipelineStage):
    stage_kind = "load"
    format_name = ""

    def __init__(
        self,
        input_view: str = "",
        output_uri: str = "",
        save_mode: str = "overwrite",
        options: dict[str, str] | None = None,
        bucket_by: tuple[str, ...] = (),
        num_buckets: int = 0,
        table_name: str = "",
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.output_uri = output_uri
        self.save_mode = save_mode
        self.options = dict(options or {})
        self.bucket_by = tuple(bucket_by)
        self.num_buckets = num_buckets
        self.table_name = table_name

    def default_options(self) -> dict[str, str]:
        return {}

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = ctx.table(self.input_view)
        uri = self.substitute(self.output_uri, ctx)
        if df.isStreaming:
            return self._execute_streaming(ctx, df, uri)
        if self.num_partitions:
            df_out = df.repartition(self.num_partitions)
        else:
            df_out = df
        writer = df_out.write.format(self.format_name).mode(self.save_mode)
        opts = {**self.default_options(), **self.options}
        if opts:
            writer = writer.options(**opts)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        if self.bucket_by:
            # bucketed layout: co-locates downstream equi-joins/aggs on
            # the bucket key (no exchange at read time). Bucket metadata
            # lives in the catalog, so this goes through saveAsTable.
            if not self.table_name:
                raise ValueError(
                    f"{self.stage_type} '{self.name}': bucketBy requires tableName"
                )
            writer = writer.bucketBy(
                self.num_buckets or 8, *self.bucket_by
            ).sortBy(*self.bucket_by)
            if uri:
                writer = writer.option("path", uri)
            writer.saveAsTable(self.table_name)
        else:
            writer.save(uri)
        return df

    def _execute_streaming(
        self, ctx: ArcContext, df: DataFrame, uri: str
    ) -> DataFrame:
        """Streaming file sink (reference: file Loads accept streaming
        input): exactly-once append via the checkpointed file-sink
        commit log. The checkpoint lives beside the output unless
        overridden via the ``checkpointLocation`` option; the query is
        tracked with the same managed-stop contract as
        ConsoleLoad/MemoryLoad and drains with an availableNow trigger
        (bounded source snapshot; an unbounded deployment swaps the
        trigger and simply doesn't awaitTermination).
        """
        if self.bucket_by:
            raise ValueError(
                f"{self.stage_type} '{self.name}': bucketBy is a batch-only "
                "layout (catalog metadata); streaming sinks append files"
            )
        opts = {**self.default_options(), **self.options}
        checkpoint = opts.pop(
            "checkpointLocation", uri.rstrip("/") + "/_checkpoints"
        )
        writer = (
            df.writeStream.format(self.format_name)
            .outputMode("append")
            .queryName(f"load:{self.name}")
            .option("checkpointLocation", checkpoint)
        )
        if opts:
            writer = writer.options(**opts)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        query = writer.trigger(availableNow=True).start(uri)
        ctx.track_stream(query)
        query.awaitTermination()
        return df


@register_stage
class ParquetLoad(_FileLoad):
    stage_type = "ParquetLoad"
    format_name = "parquet"


@register_stage
class ORCLoad(_FileLoad):
    stage_type = "ORCLoad"
    format_name = "orc"


@register_stage
class AvroLoad(_FileLoad):
    stage_type = "AvroLoad"
    format_name = "avro"


@register_stage
class JSONLoad(_FileLoad):
    stage_type = "JSONLoad"
    format_name = "json"


@register_stage
class TextLoad(_FileLoad):
    stage_type = "TextLoad"
    format_name = "text"


@register_stage
class XMLLoad(_FileLoad):
    """Gated on an xml-capable datasource being present."""

    stage_type = "XMLLoad"
    format_name = "xml"


@register_stage
class DelimitedLoad(_FileLoad):
    stage_type = "DelimitedLoad"
    format_name = "csv"

    def __init__(self, header: bool = True, delimiter: str = ",", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.header = header
        self.delimiter = delimiter

    def default_options(self) -> dict[str, str]:
        return {"header": str(self.header).lower(), "sep": self.delimiter}


@register_stage
class JDBCLoad(PipelineStage):
    stage_type = "JDBCLoad"
    stage_kind = "load"

    def __init__(
        self,
        input_view: str = "",
        jdbc_url: str = "",
        table_name: str = "",
        save_mode: str = "append",
        options: dict[str, str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.jdbc_url = jdbc_url
        self.table_name = table_name
        self.save_mode = save_mode
        self.options = dict(options or {})

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = ctx.table(self.input_view)
        writer = (
            df.write.format("jdbc")
            .mode(self.save_mode)
            .option("url", self.substitute(self.jdbc_url, ctx))
            .option("dbtable", self.table_name)
        )
        for k, v in self.options.items():
            writer = writer.option(k, v)
        writer.save()
        return df


@register_stage
class ConsoleLoad(PipelineStage):
    """Streaming sink to the console (reference: SURVEY.md §2.B)."""

    stage_type = "ConsoleLoad"
    stage_kind = "load"

    def __init__(self, input_view: str = "", output_mode: str = "append", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.output_mode = output_mode

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = ctx.table(self.input_view)
        if not df.isStreaming:
            raise ValueError("ConsoleLoad requires a streaming input view")
        query = df.writeStream.format("console").outputMode(self.output_mode).start()
        ctx.track_stream(query)
        return df


@register_stage
class MemoryLoad(PipelineStage):
    """Streaming sink into an in-memory table (the preview mechanism;
    reference: Common.scala:177-181)."""

    stage_type = "MemoryLoad"
    stage_kind = "load"

    def __init__(
        self,
        input_view: str = "",
        query_name: str = "preview",
        output_mode: str = "append",
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.query_name = query_name
        self.output_mode = output_mode

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = ctx.table(self.input_view)
        # restarting the same-named sink: stop the old query first
        # (Spark rejects a second active query with the same name, and
        # the old memory sink would pin its rows on the driver)
        for active in ctx.spark.streams.active:
            if active.name == self.query_name:
                active.stop()
        query = (
            df.writeStream.format("memory")
            .queryName(self.query_name)
            .outputMode(self.output_mode)
            .start()
        )
        ctx.track_stream(query)
        return df
