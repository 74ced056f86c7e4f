"""Small shared column helpers used across the page-facing operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["html_string"]


def html_string(df: DataFrame, col: str) -> Column:
    """The HTML column as a string: binary columns are UTF-8 decoded.

    One shared implementation (links / sitemaps / structured / pagemeta
    all take either representation) so a future charset-handling change
    lands everywhere at once.
    """
    c = F.col(col)
    if dict(df.dtypes).get(col) == "binary":
        return F.decode(c, "UTF-8")
    return c
