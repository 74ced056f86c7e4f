"""Stage 1 — text extraction: ``html:binary -> text:string``.

The reference extracts per document over HTTP to a Tika JVM (runner.py:36-65)
or via PyMuPDF table recognition for PDFs (runner.py:131-141). At scale both
become in-process pure functions executed inside one Arrow-batched
``mapInPandas`` stage, dispatched on content sniffing. The per-row invariant
is BYTE-IDENTICAL text per url: extraction is a deterministic pure function
of the input bytes, so any partitioning / parallelism / rerun yields the
same bytes (tested in tests/test_distributed_equivalence.py).

Semantics preserved from the reference:

* only the first ``</html>`` root is kept — Tika can emit trailing roots
  and the runner truncates after the first close tag (runner.py:126-127);
* PDF extraction is a separate dispatch branch. PyMuPDF is not available
  in this environment, so the geometric table recognizer
  (text_to_turtle_pdf_to_text.py:319-479, 7-stage pipeline) is stubbed
  behind an import-try; the Spark-side plumbing (dispatch, schema, error
  rows) is real and tested with a deterministic fake.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("extract_error", StringType(), True),
    ]
)

_HTML_CLOSE = "</html>"


def html_to_xhtml_text(data: bytes) -> str:
    """Deterministic HTML→text: UTF-8 decode (strict — malformed bytes are
    an error row, reference skips such docs at runner.py:333-339) and
    first-root truncation."""
    text = data.decode("utf-8")
    idx = text.find(_HTML_CLOSE)
    if idx >= 0:
        text = text[: idx + len(_HTML_CLOSE)]
    return text


def pdf_to_xhtml_text(data: bytes) -> str:
    """PDF → XHTML with geometric table recognition.

    The 7-stage recognizer (guiding lines → consolidate → borders →
    tables → cell regions → consolidate → render) is fully implemented
    in :mod:`.pdf_tables` as pure geometry; only the PDF *byte decoding*
    needs PyMuPDF. Without it this raises NotImplementedError and the
    row becomes an error row (the reference skips such docs too,
    runner.py:326-339).
    """
    from .pdf_tables import pdf_bytes_to_xhtml

    return pdf_bytes_to_xhtml(data)


def sniff_content_type(data: Optional[bytes]) -> str:
    if data is None or len(data) == 0:
        return "empty"
    if data[:5] == b"%PDF-":
        return "pdf"
    return "html"


# Oversized-document guard: one pathological page must not blow an Arrow
# batch / executor heap. 64 MB of raw bytes is far beyond any real page.
MAX_DOC_BYTES = 64 * 1024 * 1024


def extract_one(data: Optional[bytes]) -> tuple:
    """(text, content_type, error) for one document's raw bytes."""
    ctype = sniff_content_type(data)
    if ctype == "empty":
        return None, ctype, "empty document"
    if len(data) > MAX_DOC_BYTES:
        return None, ctype, f"document exceeds {MAX_DOC_BYTES} bytes ({len(data)})"
    try:
        if ctype == "pdf":
            return pdf_to_xhtml_text(data), ctype, None
        return html_to_xhtml_text(data), ctype, None
    except Exception as ex:
        return None, ctype, f"{type(ex).__name__}: {ex}"


def extract_text(pages: DataFrame, repartition_by_url: Optional[int] = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted text table.

    Rows whose ``text`` column is already populated (pre-textized corpora)
    skip extraction. The ``html`` column is dropped immediately after this
    stage — downstream stages never carry page bytes (column pruning is the
    single biggest scan saving at 100 TB).
    """
    if repartition_by_url:
        from pyspark.sql import functions as F

        pages = pages.repartition(repartition_by_url, F.xxhash64("url"))

    cols = ["url", "warc_ts", "html", "text", "lang"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, ctypes, errors = [], [], []
            for raw, pre in zip(pdf["html"], pdf["text"]):
                if isinstance(pre, str) and pre:
                    texts.append(pre)
                    ctypes.append("pretextized")
                    errors.append(None)
                    continue
                text, ctype, err = extract_one(
                    bytes(raw) if raw is not None else None
                )
                texts.append(text)
                ctypes.append(ctype)
                errors.append(err)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "text": texts,
                    "lang": pdf["lang"],
                    "content_type": ctypes,
                    "extract_error": errors,
                }
            )

    return pages.select(*cols).mapInPandas(run, schema=EXTRACTED_SCHEMA)
