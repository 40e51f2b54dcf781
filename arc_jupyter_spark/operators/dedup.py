"""Deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH near-dedup, SimHash, and n-gram Jaccard —
all expressed as DataFrame programs over built-in functions (no Python
UDFs in the hot path).

Scale design:
- Exact dedup: one shuffle on a fixed-width digest (not the full text).
- MinHash: signatures are computed per-row map-side with higher-order
  functions (``transform``/``array_min``) — no explode, no shuffle;
  only the tiny (id, band-hash) pairs shuffle for bucketing. Banding
  turns the O(n²) pair space into per-bucket joins.
- Hashes are md5-based (not Spark's murmur3 ``hash``) so results are
  engine-independent and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


# -- exact ------------------------------------------------------------

def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep one row per distinct ``key_cols`` (lowest ``order_col``).

    One shuffle (window on the key). For 100 TB, hash the key columns
    into a digest first so the shuffle carries 16 bytes per row instead
    of the full document text — see ``exact_dedup_by_digest``.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_by_digest(df: DataFrame, text_col: str, order_col: str) -> DataFrame:
    """Exact text dedup shuffling only (digest, order) — the scale path."""
    keyed = df.withColumn("_digest", F.md5(F.col(text_col).cast("binary")))
    w = Window.partitionBy("_digest").orderBy(F.col(order_col).asc())
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_digest")
    )


# -- shingling --------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of lowercased whitespace-tokenized text.

    Pure higher-order-function expression (map-side, codegen'd):
    ``transform(sequence(...), j -> concat_ws(' ', slice(tokens, j, n)))``.
    """
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda j: F.concat_ws(" ", F.slice(tokens, j, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))


# -- MinHash ----------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for seed i, ``min(md5(shingle || '#i'))``.

    md5 hex strings compare lexicographically the same in any engine —
    deterministic and portable (unlike murmur3 ``hash()``).
    """
    def one_hash(i: int) -> Column:
        return F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(f"#{i}")).cast("binary")))
        )

    return F.array(*[one_hash(i) for i in range(num_hashes)])


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band digests: md5 of each signature slice → LSH bucket keys."""
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"band{b}|"),
                    F.concat_ws("|", F.slice(signature, b * rows_per_band + 1, rows_per_band)),
                ).cast("binary")
            )
            for b in range(bands)
        ]
    )


def minhash_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-document MinHash signature as columns ``_s0.._sN``.

    Shape matters for performance: explode distinct shingles to rows,
    compute all N seed-hashes in ONE flat projection (whole-stage
    codegen'd — no nested higher-order functions, which Catalyst
    evaluates interpreted and re-inlines per reference), then
    ``groupBy(id).min(...)``. The min aggregation is partial (map-side
    combine), so the shuffle carries only num_hashes values per
    document regardless of document size — the 100 TB-safe shape.
    """
    shingles = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_len))).alias("_s"),
    )
    hashed = shingles.select(
        id_col,
        *[
            F.md5(F.concat(F.col("_s"), F.lit(f"#{i}")).cast("binary")).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_s{i}") for i in range(num_hashes)]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing ≥1 LSH band.

    Only (id, band-digest) pairs shuffle; the self-join happens per
    band bucket. Giant buckets (boilerplate documents) are the skew
    risk at scale — AQE skew-join handles moderate cases; pathological
    buckets should be capped upstream.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signature_table(df, id_col, text_col, shingle_len, num_hashes)
    band_digests = [
        F.md5(
            F.concat(
                F.lit(f"band{b}|"),
                F.concat_ws(
                    "|", *[F.col(f"_s{b * rows_per_band + j}") for j in range(rows_per_band)]
                ),
            ).cast("binary")
        )
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), F.explode(F.array(*band_digests)).alias("_band"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on="_band")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Scale shape: explode distinct shingles, equi-join on the shingle
    value (plus ``block_col``) so intersection sizes come from a
    counting aggregation — no document arrays ride through the
    shuffle, and pairs sharing zero shingles never materialize. Skew
    note: ultra-common shingles create hot join keys; at corpus scale,
    drop stop-shingles (document frequency above a cap) first.
    """
    block = [block_col] if block_col else []
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block],
        F.array_distinct(word_shingles(F.col(text_col), shingle_len)).alias("_sh"),
    )
    sizes = sh.select(id_col, F.size("_sh").alias("_n"))
    ex = sh.select(F.col(id_col), *[F.col(c) for c in block], F.explode("_sh").alias("_s"))
    a = ex.alias("a")
    b = ex.alias("b")
    cond = F.col("a._s") == F.col("b._s")
    for c in block:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# -- SimHash ----------------------------------------------------------

def simhash64(text: Column, num_bits: int = 64) -> Column:
    """SimHash fingerprint from word-level md5 hashes.

    For each bit position, sum ±1 contributions across tokens (bit set
    → +1, clear → -1); the fingerprint bit is 1 when the sum is
    positive. Bit b of a token is taken from its md5 hex nibble —
    portable, no murmur dependency. Map-side only (higher-order
    functions); returns an array of ``num_bits`` 0/1 bytes (portable
    across engines; pack to a bigint downstream if needed).
    """
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    hashes = F.transform(tokens, lambda t: F.md5(t.cast("binary")))

    def bit(h: Column, b: int) -> Column:
        nibble = F.conv(F.substring(h, b // 4 + 1, 1), 16, 10).cast("int")
        return F.when(nibble.bitwiseAND(1 << (3 - b % 4)) > 0, 1).otherwise(-1)

    def bit_sum(b: int) -> Column:
        return F.aggregate(hashes, F.lit(0), lambda acc, h: acc + bit(h, b))

    return F.array(
        *[F.when(bit_sum(b) > 0, 1).otherwise(0) for b in range(num_bits)]
    )


def simhash_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash bit arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


# -- embedding near-dup ----------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    With ``block_col`` (e.g. a cluster/LSH bucket id) the join is
    per-block; without it this is a full cross-join — only for small n.
    Cosine is computed JVM-side with ``zip_with``/``aggregate``.
    """
    from arc_jupyter_spark.operators.similarity import cosine_similarity

    base = df.select(
        F.col(id_col), F.col(vec_col),
        *( [F.col(block_col)] if block_col else [] ),
    )
    a = base.alias("a")
    b = base.alias("b")
    on = F.col(f"a.{block_col}") == F.col(f"b.{block_col}") if block_col else F.lit(True)
    sim = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, on)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
