"""One-call literal arrays for anchor/centroid vectors.

``F.array(*[F.lit(x) for x in vec])`` costs one py4j round trip PER
ELEMENT — ~2 ms each, so an 8-anchor × 64-dim centroid fold spends
~1.5 s of pure driver latency per loop round (measured in s14's Lloyd
trainer; guide §1 "first-principles": none of that work is on the
executors). Building the same literal as ONE ``F.expr("array(...)")``
string is a single round trip and parses in the JVM.

Exactness: integer literals use the ``L`` suffix (BIGINT, no
inference surprises — bare ``F.lit(int)`` infers INT for small
values). Double literals use Python ``repr`` + the ``D`` suffix:
repr is the shortest string that round-trips the IEEE double, and
Spark's parser (Java ``Double.parseDouble``) is correctly rounded, so
the parsed double is bit-identical to the Python value (verified
including subnormals, -0.0, max-double and ``e+NN`` forms). Non-finite
values are rejected — callers here never produce them, and SQL double
literals cannot express NaN/Inf.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import Column, functions as F


def long_array(values: Iterable[int]) -> Column:
    """``array<bigint>`` literal in one py4j call."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")


def double_array(values: Sequence[float]) -> Column:
    """``array<double>`` literal in one py4j call, bit-exact."""
    vals = [float(v) for v in values]
    if any(not math.isfinite(v) for v in vals):
        raise ValueError("double_array: non-finite values not supported")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
