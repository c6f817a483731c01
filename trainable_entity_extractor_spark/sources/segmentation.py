"""Stage A: pages → extracted text → segments (SURVEY.md §7.1).

The reference parses poppler-XML token streams into PdfDataSegments
(domain/PdfData.py:77-97); our web-page analog extracts block-level text
from raw HTML. The extraction is a pure deterministic function — the
per-url byte-identical invariant of BASELINE.json input_hint — implemented
as an Arrow-batched pandas UDF (never per-row Python), with a bit-identical
plain-Python twin used by tests.

Segment explosion (text → one row per paragraph) is pure native Spark
(posexplode over split), mirroring the reference's plain-text source
(domain/PdfData.py:100-104 from_texts).
"""

from __future__ import annotations

import html as html_module
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_RE = re.compile(
    r"<(?:p|h[1-6]|li|blockquote|td|th|pre|title)\b[^>]*>(.*?)</(?:p|h[1-6]|li|blockquote|td|th|pre|title)>",
    re.S | re.I,
)
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def py_extract_text(html_bytes: bytes | None) -> str:
    """Byte-identical HTML → text: drop script/style, take block-level
    elements in document order, strip inline tags, unescape entities,
    collapse whitespace per block, join blocks with '\\n\\n'."""
    if html_bytes is None:
        return ""
    try:
        raw = html_bytes.decode("utf-8", errors="replace")
    except AttributeError:  # already str
        raw = str(html_bytes)
    raw = _SCRIPT_RE.sub("", raw)
    blocks = []
    for m in _BLOCK_RE.finditer(raw):
        inner = _TAG_RE.sub(" ", m.group(1))
        inner = html_module.unescape(inner)
        inner = " ".join(inner.split())
        if inner:
            blocks.append(inner)
    if not blocks:
        # fallback: whole-document text
        inner = " ".join(html_module.unescape(_TAG_RE.sub(" ", raw)).split())
        return inner
    return "\n\n".join(blocks)


@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(py_extract_text)


def extract_pages_text(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, …) → + extracted_text column."""
    return pages.withColumn("extracted_text", extract_text_udf(F.col("html")))


def pages_to_segments(pages: DataFrame, text_col: str = "text", segs_per_page: int = 5) -> DataFrame:
    """Explode page text into the segments table (SEGMENTS_SCHEMA) with a
    deterministic grid layout. Native Spark only: posexplode(split) keeps
    the whole stage in codegen; no shuffle (narrow transformation)."""
    seg = F.posexplode(F.split(F.col(text_col), "\n\n"))
    df = pages.select("url", seg.alias("seg_idx", "seg_text"))
    return df.select(
        "url",
        F.col("seg_idx").cast("int"),
        (F.col("seg_idx") / segs_per_page + 1).cast("int").alias("page"),
        F.lit(72.0).alias("left"),
        (F.pmod(F.col("seg_idx"), segs_per_page) * 140.0 + 72.0).alias("top"),
        F.lit(451.0).alias("width"),
        F.lit(120.0).alias("height"),
        F.lit("TEXT").alias("seg_type"),
        F.col("seg_text").alias("text"),
        F.lit(0).alias("ml_label"),
    )
