"""Whole-column analogs of the scoped matching ops (SURVEY.md §2.1).

The interpreter runs `match-dimensions` / `within-every` / `match-every`
per document inside the UDF. When a workflow's structure is *regular*
(fixed row/cell patterns), the same result is expressible as pure column
functions — `regexp_extract_all` + `posexplode` — which keeps the whole
extraction inside whole-stage codegen, no Python at all:

* ``extract_table_cells``  — the cross-document ``cells(url, table_no,
  row, col, text)`` DataFrame (the survey's stated analog of
  match-dimensions output);
* ``extract_sections``     — ``within-every`` analog: one row per
  (url, section_no, body);
* ``extract_matches``      — ``match-every`` analog: one row per match
  occurrence with its 1-based counter.

Equivalence with the interpreter is test-enforced
(tests/test_tables.py): for the fixture table docs, the column-function
cells equal the match-dimensions walk exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_matches(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "url",
    group: int = 1,
) -> DataFrame:
    """match-every analog: (id, match_no, match) per occurrence."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), group)
        ).alias("idx", "match"),
    ).select("id", (F.col("idx") + 1).alias("match_no"), "match")


def extract_sections(
    df: DataFrame,
    section_pattern: str,
    text_col: str = "text",
    id_col: str = "url",
    group: int = 1,
) -> DataFrame:
    """within-every analog: (id, section_no, body) per scoped match."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(section_pattern), group)
        ).alias("idx", "body"),
    ).select("id", (F.col("idx") + 1).alias("section_no"), "body")


def extract_table_cells(
    df: DataFrame,
    table_pattern: str = r"(?s)<table>(.*?)</table>",
    row_pattern: str = r"(?s)<tr>(.*?)</tr>",
    cell_pattern: str = r"(?s)<t[dh]>(.*?)</t[dh]>",
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """match-dimensions analog: cells(id, table_no, row, col, cell).

    Three nested dimension regexes, each applied to group(1) of the
    parent match (exactly the interpreter's `_match_dim` recursion) —
    but as chained `regexp_extract_all` + `posexplode`, entirely inside
    codegen. Row/col numbering is 1-based like the interpreter's
    dimension counters.
    """
    tables = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(table_pattern), 1)
        ).alias("t_idx", "table_body"),
    )
    rows = tables.select(
        "id",
        (F.col("t_idx") + 1).alias("table_no"),
        F.posexplode(
            F.regexp_extract_all(F.col("table_body"), F.lit(row_pattern), 1)
        ).alias("r_idx", "row_body"),
    )
    # default pattern covers <td> and <th> via a character class so a
    # single capture group suffices (an alternation's group-1-xor-group-2
    # shape doesn't fit regexp_extract_all's one-group extraction)
    td = F.regexp_extract_all(F.col("row_body"), F.lit(cell_pattern), 1)
    cells = rows.select(
        "id",
        "table_no",
        (F.col("r_idx") + 1).alias("row"),
        F.posexplode(td).alias("c_idx", "cell"),
    )
    return cells.select(
        "id", "table_no", "row", (F.col("c_idx") + 1).alias("col"), "cell"
    )
