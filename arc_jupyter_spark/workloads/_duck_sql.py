"""Shared DuckDB oracle-SQL fragments.

The tokenizer and shingle expressions must be byte-identical wherever
an oracle mirrors the Spark-side ``\\s+`` tokenization (llmops batch
queries AND the streaming oracles), so they live here rather than as
private helpers of one workload module — importing llmops internals
from streaming_queries coupled the modules and risked an import
cycle.
"""

from __future__ import annotations

#: DuckDB expression: lowercased whitespace tokens of ``text`` with
#: empties removed — mirrors the Spark-side
#: ``filter(split(lower(text), '\\s+'), t -> t != '')``.
DUCK_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)


def duck_shingles(n: int) -> str:
    """DuckDB expression for word n-gram shingles over a ``toks``
    column (1-based inclusive list slicing); short docs collapse to a
    single whole-document shingle, mirroring the Spark side."""
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"j -> array_to_string(toks[j:j + {n - 1}], ' ')) "
        f"ELSE [array_to_string(toks, ' ')] END"
    )
