"""Window-function operators over the segments table (SURVEY §2.5 W1-W4,
§2.4 A8) — all native Spark window/agg expressions, partitioned by
document so no global sorts (SURVEY §4 physical notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_reading_order(segments: DataFrame, url_col: str = "url") -> DataFrame:
    """W1 (PdfData.py:49): seg_idx = row_number over (page, top, left)."""
    w = Window.partitionBy(url_col).orderBy("page", "top", "left")
    return segments.withColumn("seg_idx", F.row_number().over(w) - 1)


def with_neighbor_features(
    segments: DataFrame, url_col: str = "url", idx_col: str = "seg_idx"
) -> DataFrame:
    """W2 (FastSegmentSelector.py:44-68 shape): previous/next segment text
    and layout struct per row; nulls at document edges."""
    w = Window.partitionBy(url_col).orderBy(idx_col)
    layout = F.struct("left", "top", "width", "height", "seg_type")
    return (
        segments.withColumn("prev_text", F.lag("text").over(w))
        .withColumn("next_text", F.lead("text").over(w))
        .withColumn("prev_layout", F.lag(layout).over(w))
        .withColumn("next_layout", F.lead(layout).over(w))
    )


def with_last_title(
    segments: DataFrame, url_col: str = "url", idx_col: str = "seg_idx"
) -> DataFrame:
    """W3 (SegmentLightgbmFrequentWords.py:246-252): every segment carries
    the most recent preceding TITLE segment's text/layout (null if none)."""
    w = (
        Window.partitionBy(url_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    title = F.when(
        F.col("seg_type") == "TITLE", F.struct("text", "left", "top", "width", "height")
    )
    return segments.withColumn("last_title", F.last(title, ignorenulls=True).over(w))


def with_neighbor_score_smoothing(
    scored: DataFrame, k: int = 1, url_col: str = "url", idx_col: str = "seg_idx",
    score_col: str = "score", threshold: float = 0.5,
) -> DataFrame:
    """W4 (Near1/Near4FastSegmentSelector): selected = own score > t or any
    neighbor within +-k scores > t."""
    w = Window.partitionBy(url_col).orderBy(idx_col).rowsBetween(-k, k)
    return scored.withColumn("selected", F.max(F.col(score_col) > threshold).over(w))


def layout_modes(segments: DataFrame, url_col: str = "url") -> DataFrame:
    """A8 (segment_selector/methods/Modes.py): per-document modes of
    left margin, segment height (font-size proxy) and line spacing —
    the feature normalizers of the LightGBM selector."""
    w = Window.partitionBy(url_col).orderBy("seg_idx")
    spaced = segments.withColumn(
        "line_space", F.col("top") - F.lag(F.col("top") + F.col("height")).over(w)
    )
    return spaced.groupBy(url_col).agg(
        F.mode("left").alias("left_margin_mode"),
        F.mode("height").alias("height_mode"),
        F.mode("line_space").alias("line_space_mode"),
        F.count("*").alias("n_segments"),
    )
