"""Top-level per-document extraction API.

``extract_text(pdf_bytes)`` runs the full reference lifecycle
(document.rs:88-136 -> pages.rs:218-291 -> content/state/text.rs) and
returns a plain dict ready to become an Arrow row.  All kernel failures
are contained: a poisoned PDF yields an ``error`` code, never an
exception (a malformed byte stream must not kill a 10^12-doc Spark job).
"""

from __future__ import annotations

import time

from .content import extract_page
from .document import open_document
from .errors import ParseError


def extract_text(buf: bytes, cmap: bool = False,
                 strip_inline: bool = False,
                 with_info: bool = False) -> dict:
    """Parse one PDF byte stream end-to-end.

    Returns ``{text, spans, n_pages, error, parse_ms}`` where

    - ``text``: concatenation over pages of the reference's Display
      stream (newline at each BT, showing-op Display - see content.py);
    - ``spans``: one dict per shown string:
      ``{page, x, y, off, len}``; ``off``/``len`` are *character*
      offsets into ``text`` (the whole-document string);
    - ``n_pages``: page count from the page-tree DFS;
    - ``error``: None on full success, else a stable error code (first
      error encountered; partial text/spans are retained when the
      failure is page-local).

    ``cmap=True`` (extension beyond the reference, see cmap.py) decodes
    show strings through each font's /ToUnicode CMap where one exists -
    Type0/Identity-H glyph codes become readable Unicode.
    ``strip_inline=True`` (extension, see inline.py) removes BI/ID/EI
    inline-image spans before tokenization, recovering text the binary
    payload would otherwise poison.  ``with_info=True`` (extension, see
    Document.info) adds ``info``: the decoded - and for encrypted docs
    DECRYPTED - /Info dictionary as str->str, or None.  The defaults
    stay byte-identical to the reference heuristic.
    """
    t0 = time.perf_counter()
    text_parts: list[str] = []
    spans: list[dict] = []
    n_pages = 0
    error: str | None = None
    info = None
    try:
        doc = open_document(buf)
        if with_info:
            try:
                raw_info = doc.info()
                if raw_info is not None:
                    info = {k: str(v) for k, v in raw_info.items()}
            except Exception:
                info = None  # metadata failure never poisons the text
        pages = doc.pages()
        n_pages = len(pages)
        base = 0
        for page_idx, page in enumerate(pages):
            try:
                content = doc.build_content(page)
            except ParseError as exc:
                error = error or exc.code
                continue
            if strip_inline:
                from .inline import strip_inline_images

                content = strip_inline_images(content)
            cmaps = None
            if cmap:
                try:
                    cmaps = doc.page_tounicode_cmaps(page) or None
                except Exception:
                    cmaps = None
            page_text, page_spans, page_error = extract_page(content, cmaps)
            if page_error and not error:
                error = page_error
            text_parts.append(page_text)
            for x, y, off, length in page_spans:
                spans.append({
                    "page": page_idx,
                    "x": x,
                    "y": y,
                    "off": base + off,
                    "len": length,
                })
            base += len(page_text)
    except ParseError as exc:
        error = exc.code
    except Exception as exc:  # containment: a kernel bug on one poisoned
        error = type(exc).__name__  # doc must not kill a 10^12-doc job
    parse_ms = (time.perf_counter() - t0) * 1000.0
    return {
        "text": "".join(text_parts),
        "spans": spans,
        "n_pages": n_pages,
        "error": error,
        "parse_ms": parse_ms,
        "info": info,
    }


def is_pdf(buf: bytes) -> bool:
    """Magic-byte check used by the pipeline's pre-filter (B4)."""
    return buf[:5] == b"%PDF-"
