"""OpenDocument (odt/ods/odp) → XHTML text, pure stdlib (zip + regex).

Completes the Office branch with the OASIS container family the
reference's Tika path accepted transparently (runner.py:36-115). Same
approach as the OOXML extractors (operators/office.py): the ZIP's
``content.xml`` is plain XML and the text layer needs no DOM —
anchored regexes in document order, entity-unescaped, re-rendered as
canonical XHTML.

Canonical renders (gate-checked byte-exactly):

* ``text:h`` (outline level 1-6) → ``<h1>``…``<h6>``;
* ``text:p`` outside tables → ``<p>`` (empty paragraphs dropped);
* ``table:table`` → ``<table><tr><td>`` — cell paragraphs join with
  LF, ``table:number-columns-repeated`` expands;
* inline ``text:s`` (``text:c`` count), ``text:tab``,
  ``text:line-break`` → spaces / TAB / LF; ``text:span`` and
  ``text:a`` unwrap to their content;
* odp wraps each ``draw:page`` in ``<div class="slide">`` — the same
  shape as the pptx renderer.

The refined content type comes from the ``mimetype`` member when
present (``…opendocument.text`` → odt, ``.spreadsheet`` → ods,
``.presentation`` → odp), else odt.
"""

from __future__ import annotations

import html as _html
import io
import re
import zipfile
from typing import List, Sequence, Tuple, Union

__all__ = ["odf_to_xhtml_text", "make_odt", "make_odp"]

_H = re.compile(r"<text:h\b([^>]*)>(.*?)</text:h>", re.S)
_P = re.compile(r"<text:p\b[^>]*>(.*?)</text:p>|<text:p\b[^>]*/>", re.S)
_TABLE = re.compile(r"<table:table\b[^>]*>.*?</table:table>", re.S)
_TROW = re.compile(r"<table:table-row\b[^>]*>.*?</table:table-row>", re.S)
_TCELL = re.compile(
    # self-closed branch FIRST — the open-tag branch's non-greedy body
    # would otherwise swallow a self-closed cell plus its neighbour
    r"<table:table-cell\b([^>]*)/>"
    r"|<table:table-cell\b([^>]*)>(.*?)</table:table-cell>",
    re.S,
)
_PAGE = re.compile(r"<draw:page\b[^>]*>.*?</draw:page>", re.S)
_OUTLINE = re.compile(r'text:outline-level="(\d+)"')
_REPEAT = re.compile(r'table:number-columns-repeated="(\d+)"')
_SPACE = re.compile(r"<text:s\b([^>]*)/>")
_SPACE_C = re.compile(r'text:c="(\d+)"')
_ANY_TAG = re.compile(r"<[^>]+>")
_BODY = re.compile(r"<office:body>(.*)</office:body>", re.S)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _inline_text(fragment: str) -> str:
    """One paragraph/heading's XML content → its text, expanding the
    ODF whitespace elements and unwrapping spans/links."""
    frag = fragment.replace("<text:tab/>", "\t").replace(
        "<text:line-break/>", "\n"
    )
    frag = _SPACE.sub(
        lambda m: " " * int((_SPACE_C.search(m.group(1)) or [None, "1"])[1]),
        frag,
    )
    return _html.unescape(_ANY_TAG.sub("", frag))


def _cell_text(inner: str) -> str:
    """A table cell's paragraphs, LF-joined (the docx/pptx convention)."""
    paras = [
        _inline_text(m.group(1) or "") for m in _P.finditer(inner)
    ]
    return "\n".join(p for p in paras if p != "" or len(paras) == 1)


def _render_blocks(xml: str) -> List[str]:
    """Headings, paragraphs and tables of one content region, in
    document order — tables first per region so cell paragraphs never
    re-render as free paragraphs (the pptx two-pass shape)."""

    def flat(span: str) -> List[str]:
        out: List[str] = []
        pos = 0
        for h in _H.finditer(span):
            out.extend(paras(span[pos : h.start()]))
            lvl = min(6, max(1, int((_OUTLINE.search(h.group(1)) or [None, "1"])[1])))
            t = _inline_text(h.group(2))
            if t:
                out.append(f"<h{lvl}>{_esc(t)}</h{lvl}>")
            pos = h.end()
        out.extend(paras(span[pos:]))
        return out

    def paras(span: str) -> List[str]:
        out = []
        for m in _P.finditer(span):
            t = _inline_text(m.group(1) or "")
            if t:
                out.append(f"<p>{_esc(t)}</p>")
        return out

    body: List[str] = []
    pos = 0
    for tbl in _TABLE.finditer(xml):
        body.extend(flat(xml[pos : tbl.start()]))
        rows_html: List[str] = []
        for tr in _TROW.finditer(tbl.group(0)):
            cells: List[str] = []
            for c in _TCELL.finditer(tr.group(0)):
                attrs = c.group(1) if c.group(1) is not None else c.group(2) or ""
                inner = c.group(3) or ""
                rep = int((_REPEAT.search(attrs) or [None, "1"])[1])
                cells.extend([_cell_text(inner)] * rep)
            rows_html.append(
                "<tr>" + "".join(f"<td>{_esc(v)}</td>" for v in cells) + "</tr>"
            )
        body.append("<table>" + "".join(rows_html) + "</table>")
        pos = tbl.end()
    body.extend(flat(xml[pos:]))
    return body


def odf_to_xhtml_text(data: bytes) -> Tuple[str, str]:
    """(xhtml, refined content type) for an OpenDocument container."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        if "content.xml" not in names:
            raise ValueError("ZIP container has no content.xml (not an ODF file)")
        mimetype = ""
        if "mimetype" in names:
            mimetype = z.read("mimetype").decode("ascii", "replace")
        xml = z.read("content.xml").decode("utf-8")
    kind = "odt"
    if mimetype.endswith(".spreadsheet"):
        kind = "ods"
    elif mimetype.endswith(".presentation"):
        kind = "odp"
    bm = _BODY.search(xml)
    region = bm.group(1) if bm else xml
    # annotations and notes carry their own <text:p> children NESTED
    # inside a paragraph — strip them region-wide up front, or the
    # non-greedy paragraph regex would stop at their inner close tag
    region = re.sub(
        r"<office:annotation\b.*?</office:annotation>", "", region, flags=re.S
    )
    region = re.sub(r"<text:note\b.*?</text:note>", "", region, flags=re.S)
    if kind == "odp":
        parts = [
            '<div class="slide">' + "".join(_render_blocks(pg.group(0))) + "</div>"
            for pg in _PAGE.finditer(region)
        ]
    else:
        parts = _render_blocks(region)
    return "<html><body>" + "".join(parts) + "</body></html>", kind


# ---------------------------------------------------------------------------
# Deterministic fixture writers (gate corpora). Per the ODF spec the
# ``mimetype`` member is first and STORED (uncompressed) — the writers
# honour that so the fixtures double as magic-sniffable real files.

_ZIP_DATE = (1980, 1, 1, 0, 0, 0)


def _xml_esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _write_odf_zip(mimetype: str, content_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype", date_time=_ZIP_DATE)
        zi.compress_type = zipfile.ZIP_STORED
        z.writestr(zi, mimetype.encode("ascii"))
        zi = zipfile.ZipInfo("content.xml", date_time=_ZIP_DATE)
        zi.compress_type = zipfile.ZIP_DEFLATED
        zi.external_attr = 0o600 << 16
        z.writestr(zi, content_xml.encode("utf-8"))
    return buf.getvalue()


def _para_xml(text: str) -> str:
    body = (
        _xml_esc(text)
        .replace("\t", "<text:tab/>")
        .replace("\n", "<text:line-break/>")
    )
    # real ODF writers collapse space runs into <text:s> — emit the same
    body = re.sub(
        r"  +",
        lambda m: f' <text:s text:c="{len(m.group(0)) - 1}"/>',
        body,
    )
    return f'<text:p text:style-name="P1">{body}</text:p>'


Block = Union[str, Tuple[int, str], Sequence[Sequence[str]]]


def _blocks_xml(blocks: Sequence[Block]) -> str:
    parts: List[str] = []
    t = 0
    for blk in blocks:
        if isinstance(blk, str):
            parts.append(_para_xml(blk))
        elif isinstance(blk, tuple):
            lvl, text = blk
            parts.append(
                f'<text:h text:outline-level="{lvl}">{_xml_esc(text)}</text:h>'
            )
        else:
            t += 1
            rows = "".join(
                "<table:table-row>"
                + "".join(
                    f"<table:table-cell office:value-type=\"string\">"
                    f"{_para_xml(cell)}</table:table-cell>"
                    for cell in row
                )
                + "</table:table-row>"
                for row in blk
            )
            parts.append(
                f'<table:table table:name="T{t}">'
                f'<table:table-column table:number-columns-repeated="9"/>'
                f"{rows}</table:table>"
            )
    return "".join(parts)


_CONTENT_PREFIX = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    "<office:document-content "
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0">'
    "<office:automatic-styles/>"
    "<office:body>"
)


def make_odt(blocks: Sequence[Block]) -> bytes:
    """odt bytes; a string block → paragraph, ``(level, text)`` tuple →
    heading, list-of-rows → table."""
    xml = (
        _CONTENT_PREFIX
        + "<office:text>"
        + _blocks_xml(blocks)
        + "</office:text></office:body></office:document-content>"
    )
    return _write_odf_zip("application/vnd.oasis.opendocument.text", xml)


def make_odp(pages: Sequence[Sequence[Block]]) -> bytes:
    """odp bytes; each page is a sequence of blocks as in make_odt."""
    xml = (
        _CONTENT_PREFIX
        + "<office:presentation>"
        + "".join(
            f'<draw:page draw:name="page{i + 1}">' + _blocks_xml(pg) + "</draw:page>"
            for i, pg in enumerate(pages)
        )
        + "</office:presentation></office:body></office:document-content>"
    )
    return _write_odf_zip("application/vnd.oasis.opendocument.presentation", xml)
