"""arc_jupyter_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of tripl-ai/arc-jupyter
(reference at /root/reference): named-view data model over the Spark
catalog, Arc-style pipeline stages (extract/transform/load/execute/
validate), metadata-aware schemas with typed parsing and per-row error
capture, a bounded streaming preview, plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from arc_jupyter_spark.context import ArcContext  # noqa: F401
from arc_jupyter_spark.session import build_session  # noqa: F401

# importing these packages registers every pipeline stage
from arc_jupyter_spark import operators  # noqa: E402,F401
from arc_jupyter_spark import sources  # noqa: E402,F401

# the cell-language entry point (imports back into this package, so it
# must come after __version__ and the stage registrations)
from arc_jupyter_spark.interpreter import Interpreter  # noqa: E402,F401
