"""Page-level HTML metadata: the head-section signals an index or
curation pipeline reads before any content analysis.

(title, meta description, canonical URL, robots-meta noindex/nofollow,
declared language) — all pure column regexes over the raw HTML.
Attribute ORDER is not fixed in the wild (``name=.. content=..`` vs
``content=.. name=..``), so each meta/link field is extracted with both
orders and coalesced; tags and attribute names match case-insensitively;
values may use single or double quotes.

The canonical URL pairs with ``urls.canonicalize_urls`` for dedup-by-
canonical; ``noindex`` pairs with ``robots.robots_allowed`` for the
compliance verdict (robots META is page-level, robots.txt host-level —
a compliant pipeline honors both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_page_meta"]


def _attr_pair(tag: str, match_attr: str, match_val: str, want_attr: str) -> list:
    """Regexes for <tag ... match_attr=match_val ... want_attr="(v)">
    in BOTH attribute orders (single- or double-quoted values)."""
    q = "[\"']"
    return [
        rf"(?is)<{tag}[^>]*{match_attr}\s*=\s*{q}{match_val}{q}"
        rf"[^>]*{want_attr}\s*=\s*{q}([^\"']*){q}",
        rf"(?is)<{tag}[^>]*{want_attr}\s*=\s*{q}([^\"']*){q}"
        rf"[^>]*{match_attr}\s*=\s*{q}{match_val}{q}",
    ]


def _first(html, patterns: list):
    return F.coalesce(
        *[F.nullif(F.regexp_extract(html, p, 1), F.lit("")) for p in patterns]
    )


def extract_page_meta(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, title, description, canonical, noindex, nofollow, lang)."""
    html = F.col(html_col)
    if dict(df.dtypes).get(html_col) == "binary":
        html = F.decode(html, "UTF-8")
    title = F.nullif(
        F.trim(F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)),
        F.lit(""),
    )
    description = _first(html, _attr_pair("meta", "name", "description", "content"))
    canonical = _first(html, _attr_pair("link", "rel", "canonical", "href"))
    robots = F.lower(
        F.coalesce(
            _first(html, _attr_pair("meta", "name", "robots", "content")),
            F.lit(""),
        )
    )
    lang = F.nullif(
        F.regexp_extract(html, r"(?is)<html[^>]*\blang\s*=\s*[\"']([^\"']*)[\"']", 1),
        F.lit(""),
    )
    return df.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        description.alias("description"),
        canonical.alias("canonical"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        lang.alias("lang"),
    )
