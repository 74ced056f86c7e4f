"""URL canonicalization — the crawl-dedup primitive that runs BEFORE
content dedup at web scale (two spellings of one URL must collide).

Pure column expressions (whole-stage codegen, no UDF, DuckDB-mirrorable):

* scheme and host lowercased; default ports stripped (``:80`` http,
  ``:443`` https);
* fragment dropped;
* tracking params removed (``utm_*``, ``gclid``, ``fbclid``), remaining
  query params SORTED (order-insensitive dedup key);
* empty path → ``/``; single trailing slash stripped from non-root
  paths; path case preserved (paths are case-sensitive, hosts are not).

``registered_domain`` is the last two host labels — an approximation
(no public-suffix list dependency: ``co.uk``-style suffixes collapse);
good enough for per-site grouping, documented as approximate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)(=|$)"


def canonical_url_col(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    after = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(after, r"^[^/?#]*", "")
    nofrag = F.regexp_replace(rest, r"(?s)#.*$", "")
    path = F.regexp_extract(nofrag, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(nofrag, r"(?s)\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def host_col(url: Column) -> Column:
    after = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    return F.regexp_replace(hostport, r":\d+$", "")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds canonical_url, host and (approximate) registered_domain."""
    u = F.col(url_col)
    host = host_col(u)
    return df.withColumns(
        {
            "canonical_url": canonical_url_col(u),
            "host": host,
            "registered_domain": F.when(
                host.rlike(r"[^.]+\.[^.]+$"),
                F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
            ).otherwise(host),
        }
    )


def url_duplicates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Groups of distinct raw URLs that canonicalize identically —
    hash-groupBy on the canonical key, one shuffle (same shape as
    content-level exact dedup)."""
    c = canonicalize_urls(df, url_col)
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min(url_col).alias("keep_url"),
        )
    )
