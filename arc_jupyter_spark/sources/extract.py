"""Extract stage implementations.

Design notes for scale: every file extract goes through
``spark.read``/``spark.readStream`` so Catalyst controls split
planning, predicate pushdown, and vectorized decoding; schemas are
passed explicitly whenever known (inference is a full extra scan at
100 TB). ``numPartitions``/``partitionBy`` apply after the scan only
when asked for — an unconditional repartition would add a shuffle.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from arc_jupyter_spark.context import ArcContext
from arc_jupyter_spark.plans.pipeline import PipelineStage, register_stage


class _FileExtract(PipelineStage):
    """Shared plumbing for file-based extracts.

    Parameters: ``input_uri`` (glob ok), ``output_view``, ``schema``
    (StructType or DDL string), ``streaming`` (readStream over the same
    format — requires a schema), plus format-specific ``options``.
    """

    stage_kind = "extract"
    format_name: str = ""

    def __init__(
        self,
        input_uri: str = "",
        output_view: str = "",
        schema: Any = None,
        streaming: bool = False,
        options: dict[str, str] | None = None,
        add_filename: bool = False,
        add_index: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.input_uri = input_uri
        self.output_view = output_view
        self.schema = schema
        self.streaming = streaming
        self.options = dict(options or {})
        self.add_filename = add_filename
        self.add_index = add_index

    def default_options(self) -> dict[str, str]:
        return {}

    def reader(self, ctx: ArcContext):
        use_stream = self.streaming or ctx.conf.streaming
        reader = ctx.spark.readStream if use_stream else ctx.spark.read
        opts = {**self.default_options(), **self.options}
        if opts:
            reader = reader.options(**opts)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.format(self.format_name)

    def load(self, ctx: ArcContext) -> DataFrame:
        uri = self.substitute(self.input_uri, ctx)
        if not uri:
            raise ValueError(f"{self.stage_type} '{self.name}': inputURI is required")
        return self.reader(ctx).load(uri)

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = self.load(ctx)
        if self.add_filename or self.add_index:
            df = df.withColumn("_filename", F.input_file_name())
        if self.add_index:
            # per-file row index (Arc's _index). Needs a window over the
            # file — a shuffle on _filename. Only ask for it when row
            # order within a file is semantically meaningful.
            from pyspark.sql import Window

            w = Window.partitionBy("_filename").orderBy(
                F.monotonically_increasing_id()
            )
            df = df.withColumn("_index", F.row_number().over(w))
            if not self.add_filename:
                df = df.drop("_filename")
        df = self.repartition(df)
        return ctx.register(df, self.output_view, persist=self.persist)


@register_stage
class ParquetExtract(_FileExtract):
    """Parquet scan — the workhorse. Vectorized reader + pushdown come
    free; pass explicit schema to skip footer merging on huge dirs."""

    stage_type = "ParquetExtract"
    format_name = "parquet"


@register_stage
class ORCExtract(_FileExtract):
    stage_type = "ORCExtract"
    format_name = "orc"


@register_stage
class AvroExtract(_FileExtract):
    stage_type = "AvroExtract"
    format_name = "avro"


@register_stage
class DelimitedExtract(_FileExtract):
    """CSV/TSV. Arc params: header, delimiter, quote, inferSchema
    (SURVEY.md §2.B). Prefer explicit schema at scale — inference scans
    the data twice."""

    stage_type = "DelimitedExtract"
    format_name = "csv"

    def __init__(self, header: bool = True, delimiter: str = ",", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.header = header
        self.delimiter = delimiter

    def default_options(self) -> dict[str, str]:
        return {"header": str(self.header).lower(), "sep": self.delimiter}


@register_stage
class JSONExtract(_FileExtract):
    """JSON lines (or multiLine objects)."""

    stage_type = "JSONExtract"
    format_name = "json"

    def __init__(self, multi_line: bool = False, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.multi_line = multi_line

    def default_options(self) -> dict[str, str]:
        return {"multiLine": str(self.multi_line).lower()}


@register_stage
class TextExtract(_FileExtract):
    """Text lines; ``whole_text`` reads one row per file."""

    stage_type = "TextExtract"
    format_name = "text"

    def __init__(self, whole_text: bool = False, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.whole_text = whole_text

    def default_options(self) -> dict[str, str]:
        return {"wholetext": str(self.whole_text).lower()}


@register_stage
class BytesExtract(_FileExtract):
    """Whole files as binary rows — the multimodal on-ramp.

    ``binaryFile`` yields [path, modificationTime, length, content];
    projected to Arc's [value: binary, _filename] shape.
    """

    stage_type = "BytesExtract"
    format_name = "binaryFile"

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = self.load(ctx).select(
            F.col("content").alias("value"),
            F.col("path").alias("_filename"),
            F.col("length").alias("_length"),
        )
        return ctx.register(self.repartition(df), self.output_view, persist=self.persist)


@register_stage
class ImageExtract(_FileExtract):
    """Spark's built-in image source (struct column)."""

    stage_type = "ImageExtract"
    format_name = "image"


@register_stage
class XMLExtract(_FileExtract):
    """XML via spark-xml (``com.databricks:spark-xml`` / Spark 4 native
    ``xml``). Gated: raises a clear error if the format is unavailable."""

    stage_type = "XMLExtract"
    format_name = "xml"

    def __init__(self, row_tag: str = "row", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.row_tag = row_tag

    def default_options(self) -> dict[str, str]:
        return {"rowTag": self.row_tag}


@register_stage
class RateExtract(PipelineStage):
    """Synthetic stream source (streaming-only), for preview tests."""

    stage_type = "RateExtract"
    stage_kind = "extract"

    def __init__(
        self,
        output_view: str = "",
        rows_per_second: int = 10,
        num_source_partitions: int = 1,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.output_view = output_view
        self.rows_per_second = rows_per_second
        self.num_source_partitions = num_source_partitions

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = (
            ctx.spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .option("numPartitions", self.num_source_partitions)
            .load()
        )
        return ctx.register(df, self.output_view)


@register_stage
class HTTPExtract(PipelineStage):
    """HTTP GET body → single-row DataFrame [body: string].

    Driver-side fetch (one request), then parallelize — matches the
    reference's single-document semantics. Network access may be
    unavailable in the build sandbox; failures surface as exceptions.
    """

    stage_type = "HTTPExtract"
    stage_kind = "extract"

    def __init__(self, uri: str = "", output_view: str = "", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.uri = uri
        self.output_view = output_view

    def execute(self, ctx: ArcContext) -> DataFrame:
        import urllib.request

        uri = self.substitute(self.uri, ctx)
        with urllib.request.urlopen(uri) as resp:  # noqa: S310
            body = resp.read().decode("utf-8", errors="replace")
        df = ctx.spark.createDataFrame([(uri, body)], "uri string, body string")
        return ctx.register(df, self.output_view, persist=self.persist)


@register_stage
class JDBCExtract(PipelineStage):
    """JDBC table/query scan with optional partitioned reads.

    At scale: always set partitionColumn/lowerBound/upperBound/
    numPartitions or the whole table funnels through one task.
    """

    stage_type = "JDBCExtract"
    stage_kind = "extract"

    def __init__(
        self,
        jdbc_url: str = "",
        table_name: str = "",
        output_view: str = "",
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        options: dict[str, str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.jdbc_url = jdbc_url
        self.table_name = table_name
        self.output_view = output_view
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.options = dict(options or {})

    def execute(self, ctx: ArcContext) -> DataFrame:
        reader = (
            ctx.spark.read.format("jdbc")
            .option("url", self.substitute(self.jdbc_url, ctx))
            .option("dbtable", self.table_name)
        )
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load()
        return ctx.register(df, self.output_view, persist=self.persist)


@register_stage
class MetadataExtract(PipelineStage):
    """Schema-of-a-view as a dataset (reference kernel's own copy:
    Common.scala:46-70). Delegates to the metadata model."""

    stage_type = "MetadataExtract"
    stage_kind = "extract"

    def __init__(self, input_view: str = "", output_view: str = "", **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.output_view = output_view

    def execute(self, ctx: ArcContext) -> DataFrame:
        from arc_jupyter_spark.operators.metadata import metadata_dataframe

        df = metadata_dataframe(ctx.spark, ctx.table(self.input_view))
        return ctx.register(df, self.output_view, persist=self.persist)


@register_stage
class StatisticsExtract(PipelineStage):
    """Column statistics of a view (replaces the old %summary;
    reference: CHANGELOG.md:77). ``df.summary()`` computes count /
    mean / stddev / min / approx-percentiles / max in one distributed
    pass (approx percentiles — no full sort)."""

    stage_type = "StatisticsExtract"
    stage_kind = "extract"

    def __init__(
        self,
        input_view: str = "",
        output_view: str = "",
        statistics: tuple[str, ...] = (),
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.input_view = input_view
        self.output_view = output_view
        self.statistics = tuple(statistics)

    def execute(self, ctx: ArcContext) -> DataFrame:
        df = ctx.table(self.input_view)
        out = df.summary(*self.statistics) if self.statistics else df.summary()
        return ctx.register(out, self.output_view, persist=self.persist)
