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


def _get_json_array(json_str: str | None, path: str | None, caster):
    import json as _json

    if json_str is None or path is None:
        return None
    # JSONPath subset: $.a.b selects nested key
    try:
        obj = _json.loads(json_str)
    except ValueError:
        return None
    if path.startswith("$"):
        path = path[1:]
    for part in [p for p in path.split(".") if p]:
        if isinstance(obj, dict) and part in obj:
            obj = obj[part]
        else:
            return None
    if not isinstance(obj, list):
        return None
    try:
        return [caster(v) for v in obj]
    except (TypeError, ValueError):
        return None


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

    spark.udf.register(
        "get_json_double_array",
        lambda s, p: _get_json_array(s, p, float),
        T.ArrayType(T.DoubleType()),
    )
    spark.udf.register(
        "get_json_integer_array",
        lambda s, p: _get_json_array(s, p, int),
        T.ArrayType(T.IntegerType()),
    )
    spark.udf.register(
        "get_json_long_array",
        lambda s, p: _get_json_array(s, p, int),
        T.ArrayType(T.LongType()),
    )

    rng = _random.Random(seed)
    spark.udf.register("random", lambda: rng.random(), T.DoubleType())

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
