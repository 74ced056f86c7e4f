"""WARC source: read Common-Crawl-style web archives into the pages
DataFrame.

Real crawl corpora arrive as WARC files (ISO 28500): length-framed
records with WARC headers, response records carrying a full HTTP
message. WARC is sequential by construction (each record's length is in
its header), so the unit of parallelism is the FILE — exactly how
Common Crawl ships (tens of thousands of ~1 GB segment files): Spark's
``binaryFile`` source gives one row per file and the parser runs
per-file inside ``mapInPandas``. At 100 TB this is embarrassingly
parallel as long as individual files stay bounded, which the CC layout
guarantees.

The parser is pure stdlib and deliberately tolerant: unknown record
types are skipped, a malformed record aborts THAT FILE with an error
row (never the job), and the HTTP payload split handles both CRLF and
bare-LF header endings.
"""

from __future__ import annotations

import struct  # noqa: F401  (kept for symmetry with sibling sources)
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["parse_warc_records", "read_warc", "build_warc"]

WARC_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("warc_file", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def parse_warc_records(data: bytes) -> Iterator[Tuple[str, str, bytes]]:
    """Yield (target_uri, warc_date, http_body) for each response
    record. Non-response records (warcinfo, request, metadata) are
    skipped by their declared Content-Length; framing errors raise."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        while pos < n and data[pos : pos + 1] == b"\n":
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC record start at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep = lf_end, 2
        if hdr_end == -1:
            raise ValueError("unterminated WARC header block")
        headers = {}
        for line in data[pos:hdr_end].decode("latin-1").splitlines()[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a valid Content-Length")
        body_start = hdr_end + sep
        body = data[body_start : body_start + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record body")
        pos = body_start + clen
        if headers.get("warc-type") == "response":
            # split the HTTP message: headers end at the first blank line
            he = body.find(b"\r\n\r\n")
            hsep = 4
            lfe = body.find(b"\n\n")
            if he == -1 or (lfe != -1 and lfe < he):
                he, hsep = lfe, 2
            payload = body[he + hsep :] if he != -1 else body
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                payload,
            )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (glob ok) → (url, warc_ts, html,
    warc_file, error). One task per file (binaryFile source); a
    malformed file yields a single error row carrying its path."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            rows: List[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                # buffer per file: a mid-file framing error must drop
                # the records already parsed from THAT file, or a
                # re-fetch of the flagged file would duplicate them
                frows: List[tuple] = []
                try:
                    for uri, date, payload in parse_warc_records(bytes(content)):
                        ts = None
                        if date:
                            ts = pd.Timestamp(date.replace("Z", "+00:00"))
                            ts = ts.tz_convert(None) if ts.tzinfo else ts
                        frows.append((uri, ts, payload, fpath, None))
                    rows.extend(frows)
                except ValueError as ex:
                    rows.append((None, None, None, fpath, str(ex)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "warc_file", "error"]
                )

    return files.select("path", "content").mapInPandas(
        run, schema=WARC_PAGES_SCHEMA
    )


def build_warc(records: List[Tuple[str, str, bytes]]) -> bytes:
    """Deterministic WARC/1.0 bytes from (uri, iso_date, html_body)
    triples — the fixture counterpart of :func:`parse_warc_records`.
    Each response record wraps the body in a minimal HTTP/1.1 200."""
    out = bytearray()
    for uri, date, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("latin-1")
        out += hdr + http + b"\r\n\r\n"
    return bytes(out)
