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

#: Canonical CDC chunker parameters, shared by the d21 batch query,
#: the st15 streaming query, p11's scrub pipeline, and every oracle
#: that replays the cut rule. Both the Spark ``cdc_chunks(...)`` call
#: and ``duck_cdc_dist_cte(...)`` must receive THESE values explicitly
#: so a change to either side's defaults can never desynchronize a
#: query from its oracle (ADVICE r7).
CDC_WINDOW = 8
CDC_MASK = 64


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


def duck_cdc_dist_cte(window: int = 8, mask: int = 64) -> str:
    """CTE chain mirroring ``operators/dedup.cdc_chunks`` + the
    per-(source, digest) rollup: ``d → p → cutpos → cuts → b → chx →
    ch → dist`` where ``ch`` has (source, doc_id, chunk_idx, chunk)
    and ``dist`` has (source, dg, n_occ, ln). Shared by the d21 batch
    oracle, the st15 streaming oracle, and p11's keep-first scrub so
    the cut-rule arithmetic lives in exactly one place."""
    hash_sql = " + ".join(
        f"CAST(ord(d.text[p.i - {j}:p.i - {j}]) AS BIGINT) * {31 ** j}"
        for j in range(window)
    )
    return f"""d AS (
  SELECT source, doc_id, COALESCE(text, '') AS text,
         length(COALESCE(text, '')) AS n
  FROM documents
),
p AS (
  SELECT doc_id, unnest(generate_series({window}, n - 1)) AS i
  FROM d WHERE n >= {window + 1}
),
cutpos AS (
  SELECT p.doc_id, p.i
  FROM p JOIN d ON p.doc_id = d.doc_id
  WHERE ({hash_sql}) % {mask} = 0
),
cuts AS (SELECT doc_id, list_sort(list(i)) AS cs FROM cutpos GROUP BY doc_id),
b AS (
  SELECT d.source, d.doc_id, d.text,
         list_prepend(0, list_append(COALESCE(c.cs, []), d.n)) AS bs
  FROM d LEFT JOIN cuts c ON d.doc_id = c.doc_id
),
chx AS (
  SELECT source, doc_id, text, bs,
         unnest(generate_series(1, len(bs) - 1)) AS k
  FROM b
),
ch AS (
  SELECT source, doc_id, k - 1 AS chunk_idx,
         text[bs[k] + 1:bs[k + 1]] AS chunk
  FROM chx
),
dist AS (
  SELECT source, md5(chunk) AS dg, COUNT(*) AS n_occ,
         MAX(length(chunk)) AS ln
  FROM ch GROUP BY source, dg
)"""


#: Canonical MinHash parameters shared by the batch near-dedup family
#: (d02/d06/d07/d12, p12) and the streaming refresh screen (st16) —
#: in this module for the same reason as DUCK_TOKS: both llmops and
#: streaming_queries mirror them in oracles, and importing llmops
#: internals from streaming_queries would couple the modules.
MINHASH_NUM_HASHES = 16
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = MINHASH_NUM_HASHES // MINHASH_BANDS
MINHASH_SHINGLE_LEN = 3


def duck_banded_cte(src: str = "documents") -> str:
    """DuckDB CTE chain ending in ``banded(doc_id, band)`` — the exact
    truncated-md5 minhash band BIGINTs the Spark operators compute.
    ``src`` is the relation banded over (any CTE with doc_id + text;
    default the documents table)."""
    from arc_jupyter_spark.operators import dedup

    coeffs = dedup.minhash_coefficients(MINHASH_NUM_HASHES)
    sigs = ", ".join(
        f"list_min(list_transform(shingles, "
        f"s -> ({a} * ('0x' || substr(md5(s), 1, 7))::BIGINT + {b})"
        f" % {dedup._MERSENNE31})) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    bands = ", ".join(
        "('0x' || substr(md5('band{b}|' || {parts}), 1, 15))::BIGINT AS band{b}".format(
            b=b,
            parts=" || '|' || ".join(
                f"s{b * MINHASH_ROWS_PER_BAND + r}::VARCHAR"
                for r in range(MINHASH_ROWS_PER_BAND)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(MINHASH_BANDS))
    return f"""toks AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM {src}
),
sh AS (
  SELECT doc_id, {duck_shingles(MINHASH_SHINGLE_LEN)} AS shingles FROM toks
),
sigs AS (
  SELECT doc_id, {sigs} FROM sh
),
banded AS (
  SELECT doc_id, unnest([{band_list}]) AS band FROM ( SELECT doc_id, {bands} FROM sigs )
)"""
