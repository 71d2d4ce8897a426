"""B8: scalar vectorized (Arrow) pandas UDFs - Series -> Series.

Most scalar logic in this engine is deliberately JVM-side (built-in
columns, whole-stage codegen); these pandas UDFs exist for the cases that
genuinely need Python byte-level logic on a scalar column, and demonstrate
the only sanctioned Python UDF surface (vectorized, never row-at-a-time).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType


@pandas_udf(StringType())
def doc_kind(html: pd.Series) -> pd.Series:
    """Classify a binary payload by magic bytes: pdf | html | other."""

    def kind(buf) -> str:
        if buf is None:
            return "other"
        head = bytes(buf[:64])
        if head[:5] == b"%PDF-":
            return "pdf"
        stripped = head.lstrip(b" \t\r\n\f").lower()
        if stripped.startswith((b"<!doctype", b"<html")):
            return "html"
        return "other"

    return html.map(kind)


@pandas_udf(IntegerType())
def pdf_version(html: pd.Series) -> pd.Series:
    """Minor version of the PDF header (``%PDF-1.x`` -> x), -1 if not a PDF."""

    def version(buf) -> int:
        if buf is None:
            return -1
        head = bytes(buf[:16])
        if not head.startswith(b"%PDF-1.") or len(head) < 8:
            return -1
        c = head[7:8]
        return int(c) if c.isdigit() else -1

    return html.map(version)
