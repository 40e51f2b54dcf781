"""Arc core UDF set, re-expressed for PySpark.

Reference set (SURVEY.md §2.C, arc 4.2.0 public docs):
``get_json_double_array / get_json_integer_array / get_json_long_array``
(JSONPath → arrays), ``get_uri / get_uri_array / get_uri_filename_array``
(fetch URI contents), ``random`` (deterministic-seeded), ``to_xml``,
``struct_keys``.

Where a built-in expression can carry the semantics we register a SQL
macro-style implementation (JVM-side, codegen'd); only the genuinely
imperative ones (URI fetch, XML serialize) are Python UDFs — they are
cold-path by nature (driver/side-channel I/O, not per-row analytics).
"""

from __future__ import annotations

import random as _random

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T


def _to_xml_fragment(value, name: str = "root") -> str:
    from xml.sax.saxutils import escape

    if isinstance(value, dict):
        inner = "".join(_to_xml_fragment(v, k) for k, v in value.items())
        return f"<{name}>{inner}</{name}>"
    if isinstance(value, (list, tuple)):
        return "".join(_to_xml_fragment(v, name) for v in value)
    if value is None:
        return f"<{name}/>"
    return f"<{name}>{escape(str(value))}</{name}>"


def register_udfs(spark: SparkSession, seed: int | None = None) -> None:
    """Register the Arc UDF set on *spark* (idempotent)."""

    # JSON array extraction stays entirely JVM-side: get_json_object
    # evaluates the JSONPath (it natively supports the dotted subset
    # plus [idx]/* that Arc paths use) and from_json casts the matched
    # array; malformed JSON / non-array matches / uncastable elements
    # all yield NULL, matching the arc UDF contract. SQL scalar
    # functions (Spark 4) keep the whole expression codegen-able — no
    # BatchEvalPython in the plan (asserted in tests).
    for fname, elem in (
        ("get_json_double_array", "double"),
        ("get_json_integer_array", "int"),
        ("get_json_long_array", "bigint"),
    ):
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}(js STRING, path STRING) "
            f"RETURNS ARRAY<{elem.upper()}> "
            f"RETURN from_json(get_json_object(js, path), 'array<{elem}>')"
        )

    # Per-task RNG: a driver-seeded Random would ship identical state
    # to every task, repeating the same values across partitions. With
    # no seed, each worker draws its stream from os.urandom; with a
    # seed, the stream is deterministic per partition (seed mixed with
    # the partition id at first use in that partition).
    holder: dict = {}

    def _task_random() -> float:
        import os

        from pyspark import TaskContext

        if seed is None:
            rng = holder.get("rng")
            if rng is None:
                rng = _random.Random(int.from_bytes(os.urandom(8), "little"))
                holder["rng"] = rng
        else:
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else -1
            rng = holder.get(pid)
            if rng is None:
                rng = _random.Random((seed << 16) ^ pid)
                holder[pid] = rng
        return rng.random()

    spark.udf.register("random", _task_random, T.DoubleType())

    def to_xml(value) -> str | None:
        if value is None:
            return None
        as_dict = value.asDict(recursive=True) if hasattr(value, "asDict") else value
        return _to_xml_fragment(as_dict)

    spark.udf.register("to_xml", to_xml, T.StringType())

    def struct_keys(value) -> list[str] | None:
        if value is None:
            return None
        if hasattr(value, "asDict"):
            return list(value.asDict().keys())
        if isinstance(value, dict):
            return list(value.keys())
        return None

    spark.udf.register("struct_keys", struct_keys, T.ArrayType(T.StringType()))

    def get_uri(uri: str | None) -> bytes | None:
        if uri is None:
            return None
        import urllib.request

        if uri.startswith("file://") or "/" == uri[0]:
            path = uri[len("file://"):] if uri.startswith("file://") else uri
            with open(path, "rb") as fh:
                return fh.read()
        with urllib.request.urlopen(uri) as resp:  # noqa: S310
            return resp.read()

    spark.udf.register("get_uri", get_uri, T.BinaryType())

    def get_uri_array(uris) -> list[bytes] | None:
        if uris is None:
            return None
        return [get_uri(u) for u in uris]

    spark.udf.register("get_uri_array", get_uri_array, T.ArrayType(T.BinaryType()))

    def get_uri_filename_array(uri: str | None):
        if uri is None:
            return None
        import glob
        import os

        path = uri[len("file://"):] if uri.startswith("file://") else uri
        return sorted(os.path.basename(p) for p in glob.glob(path))

    spark.udf.register(
        "get_uri_filename_array", get_uri_filename_array, T.ArrayType(T.StringType())
    )
