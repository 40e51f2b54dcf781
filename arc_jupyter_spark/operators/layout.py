"""Data-layout operators: space-filling-curve (Z-order) clustering.

At 100 TB the dominant cost of many scans is files read, not rows
processed; multi-dimensional clustering narrows every file's min/max
envelope on EVERY clustered column so format-level zone maps (parquet
row-group stats, Delta file stats) prune scans with predicates on any
of them. Sorting by (a, b) only prunes on ``a``; interleaving the
bits of both ranks prunes on either.

The Morton code is plain integer arithmetic (unrolled shifts — no
UDF, fully codegen'd, reproducible in ANSI SQL), so layout keys are
engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) interleave of ``bits`` low bits of each column.

    Columns must already be non-negative integers in ``[0, 2^bits)``
    — normalize first (e.g. ``F.col(c) % 256``, or a rank/bucket id
    from ``ntile``/width_bucket-style binning). With ``k`` columns the
    key uses ``k * bits`` bits; bit ``i`` of column ``j`` lands at
    position ``i * k + j``.
    """
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """The identical Morton interleave as an ANSI-SQL expression
    (``>>``/``<<``/``&`` + addition) — for oracles and for pushing the
    layout key into engines that speak SQL only."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * k + j})")
    return " + ".join(terms)


def repartition_zordered(
    df: DataFrame, cols: list[Column], num_partitions: int, bits: int = 8
) -> DataFrame:
    """Range-repartition by the Morton key: each output partition (and
    so each written file) covers one contiguous Z-curve segment — a
    small tile in every clustered dimension, which is exactly what
    zone-map pruning wants. Drop the helper column after the exchange
    so the written schema is unchanged."""
    keyed = df.withColumn("_zorder", zorder_key(cols, bits))
    return keyed.repartitionByRange(num_partitions, "_zorder").drop("_zorder")
