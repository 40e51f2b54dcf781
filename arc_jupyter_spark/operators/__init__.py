"""Transform / load / execute / validate stages, plus the
training-data-pipeline operators (dedup, similarity, text analysis,
multimodal)."""

from arc_jupyter_spark.operators import (  # noqa: F401
    dedup,
    execute,
    layout,
    load,
    metadata,
    multimodal,
    quality,
    similarity,
    sketch,
    text,
    transform,
    typing,
    urls,
)
