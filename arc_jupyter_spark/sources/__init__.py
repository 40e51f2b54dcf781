"""Extract stages: file/stream/system sources → named views.

Every extract maps to ``spark.read`` / ``spark.readStream`` (reference
stage inventory: SURVEY.md §2.B, loaded via the arc 4.2.0 plugin
mechanism at ArcInterpreter.scala:309-336).
"""

from arc_jupyter_spark.sources.extract import (  # noqa: F401
    AvroExtract,
    BytesExtract,
    DelimitedExtract,
    HTTPExtract,
    ImageExtract,
    JDBCExtract,
    JSONExtract,
    MetadataExtract,
    ORCExtract,
    ParquetExtract,
    RateExtract,
    StatisticsExtract,
    TextExtract,
    XMLExtract,
)
from arc_jupyter_spark.sources.external import (  # noqa: F401
    DeltaLakeExtract,
    DeltaLakeLoad,
    KafkaCommitExecute,
    KafkaExtract,
    KafkaLoad,
)
