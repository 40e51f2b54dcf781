"""URL canonicalization and canonical-URL dedup.

A crawl pipeline's first dedup pass is by URL, and raw crawl URLs are
messy: mixed-case hosts, default ports, tracking parameters, unstable
query-parameter order, fragments, trailing slashes. ``canonical_url``
normalizes all of those with pure JVM string/array expressions (no
Python UDF), and ``url_dedup`` keeps the first document per canonical
URL with the same digest-keyed shape as exact text dedup
(`dedup.exact_dedup`): the shuffle carries a 16-byte digest + id, not
the document.

Canonicalization rules (documented so the oracle/tests can mirror):
  1. scheme and host lowercased (path/query stay case-sensitive)
  2. fragment (``#...``) dropped
  3. default ports stripped (``:80`` for http, ``:443`` for https)
  4. tracking params dropped: ``utm_*``, ``fbclid``, ``gclid``
  5. remaining query params sorted bytewise
  6. a single trailing ``/`` stripped from the path
  7. empty query string drops the ``?``

Scale: every rule is a map-side column expression inside one
whole-stage-codegen projection; dedup shuffles only (digest, id).

Reference parity: no URL operator exists in the reference (checked
src/main — the arc stage set ends at transforms/loads); this extends
the LLM-pipeline surface per the build brief (crawl-curation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of *url* per the module rules (one projection).

    A URL that doesn't parse as ``scheme://host...`` (relative links,
    ``mailto:``, plain filenames) passes through UNCHANGED: mapping
    every malformed URL to one degenerate string would make
    ``url_dedup`` silently collapse unrelated documents.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(no_frag, _HOSTPORT_RE, 1))
    # strip the default port with an end-anchored regexp (the port is
    # always the suffix of host:port, so this can't touch anything else)
    host = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(
            hostport
        )
    )
    path = F.regexp_extract(no_frag, _PATH_RE, 1)
    path = F.regexp_replace(path, "/$", "")
    qs = F.regexp_extract(no_frag, _QUERY_RE, 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    canon_qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_qs)),
    )
    return F.when((scheme == "") | (host == ""), url).otherwise(canon)


def with_canonical_url(
    df: DataFrame, url_col: str, out_col: str = "canon_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    out_col: str = "canon_url",
) -> DataFrame:
    """Keep the lowest-*id_col* row per canonical URL.

    Delegates to `dedup.exact_dedup_by_digest` (the d01 path): one
    digest-keyed ``groupBy`` + ``min_by(struct, id)`` with map-side
    partial aggregation — no second join, and correct even when an id
    value repeats across rows (a semi-join on id alone would resurrect
    every row sharing a winning id).
    """
    from arc_jupyter_spark.operators.dedup import exact_dedup_by_digest

    canon = with_canonical_url(df, url_col, out_col)
    return exact_dedup_by_digest(canon, out_col, id_col)
