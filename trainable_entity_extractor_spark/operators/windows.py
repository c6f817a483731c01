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


def remove_repeated_headers_df(
    segments: DataFrame,
    page_height: float = 792.0,
    url_col: str = "url",
    top_threshold: float = 0.2,
    repeated_threshold: float = 0.2,
    min_cluster_pages: int = 3,
    distinct_pages: bool = False,
) -> DataFrame:
    """F12, DISTRIBUTED form (reference:
    ParagraphsFromLanguage.remove_headers_and_footers +
    find_headers_with_similarities, :118-147): drop page-edge paragraphs
    whose text repeats on >= max(ceil(0.2 * pages), 3) distinct pages of
    the same document.

    This is the crawl-scale path for header/footer stripping: two hash
    aggregations on (url, normalized text) + one equi-join — no
    all-pairs work, no Python. Reference parity details, matching the
    per-document list variant (operators/alignment.py
    remove_repeated_headers): the threshold counts cluster MEMBERS (the
    reference's `len(cluster) >= min_pages`, which a same-text
    header+footer pair satisfies twice per page; pass
    `distinct_pages=True` for the crawl variant that counts DISTINCT
    pages instead, so same-page repetition cannot inflate the
    threshold), text is
    whitespace-normalized before clustering (paragraph_features does
    `' '.join(text.split())`), and PAGE_HEADER/PAGE_FOOTER/FOOTNOTE
    typed segments are dropped unconditionally when a seg_type column is
    present. Documented deviation: clusters are EXACT normalized-text
    groups, not fuzz>90 clusters — exact matching is the shuffle-
    friendly form; near-duplicate headers with OCR noise are the
    per-document path's job. Non-edge segments with the same text are
    kept, like the reference (only cluster members, which are all edge
    paragraphs, are removed)."""
    h = float(page_height)
    on_edge = (F.col("top") < h * top_threshold) | (
        (F.col("top") + F.col("height")) > h * (1 - top_threshold)
    )
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    seg = segments.withColumn("_norm_text", norm)
    pages = seg.groupBy(url_col).agg(F.max("page").alias("_n_pages"))
    edge = seg.filter(on_edge)
    member_count = (
        F.countDistinct("page") if distinct_pages else F.count("*")
    )
    clusters = edge.groupBy(url_col, "_norm_text").agg(
        member_count.alias("_members")
    )
    headers = (
        clusters.join(pages, url_col)
        .filter(
            F.col("_members")
            >= F.greatest(
                F.ceil(F.lit(repeated_threshold) * F.col("_n_pages")),
                F.lit(min_cluster_pages),
            )
        )
        .select(url_col, "_norm_text", F.lit(True).alias("_is_header"))
    )
    out = (
        seg.join(headers, [url_col, "_norm_text"], "left")
        .filter(~(on_edge & F.coalesce(F.col("_is_header"), F.lit(False))))
        .drop("_is_header", "_norm_text")
    )
    if "seg_type" in segments.columns:
        # NULL-safe: ~isin(...) is NULL for NULL seg_type, which filter()
        # treats as false — without the isNull() arm every untyped
        # segment would be silently dropped
        out = out.filter(
            F.col("seg_type").isNull()
            | ~F.col("seg_type").isin("PAGE_HEADER", "PAGE_FOOTER", "FOOTNOTE")
        )
    return out
