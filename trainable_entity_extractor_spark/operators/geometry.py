"""Geometry operators (X15) + the token→region spatial join (F1/J3).

Reference: pdf_features.Rectangle usage at domain/PdfData.py:27-50 (F1:
token assigned to the first region on the same page whose box intersects
>50% of the token) and domain/PdfDataSegment.py:28-41 (overlap
predicates). Here geometry is plain struct arithmetic (least/greatest
column exprs), and the spatial join is an equi-join on (doc, page) plus interval
predicates — Catalyst-native, no spatial index required at per-document
region counts. The regions side is NOT broadcast-hinted: it is a
per-document dimension, so at crawl scale it grows WITH the corpus and a
forced broadcast would OOM the driver; the (doc, page) equi-keys make a
shuffle hash/sort-merge join the scale-safe default, and AQE still picks
a broadcast at runtime whenever the regions side is actually small."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def intersection_area(l1, t1, w1, h1, l2, t2, w2, h2):
    """Column expr: intersection area of two boxes."""
    ix = F.greatest(
        F.least(l1 + w1, l2 + w2) - F.greatest(l1, l2), F.lit(0.0)
    )
    iy = F.greatest(
        F.least(t1 + h1, t2 + h2) - F.greatest(t1, t2), F.lit(0.0)
    )
    return ix * iy


def overlap_percentage(l1, t1, w1, h1, l2, t2, w2, h2):
    """% of box-1's area covered by box-2 (PdfDataSegment.intersects)."""
    area1 = F.greatest(w1 * h1, F.lit(1e-9))
    return 100.0 * intersection_area(l1, t1, w1, h1, l2, t2, w2, h2) / area1


def merge_boxes(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merged bounding rectangle per group (Rectangle.merge_rectangles)."""
    return df.groupBy(*group_cols).agg(
        F.min("left").alias("left"),
        F.min("top").alias("top"),
        (F.max(F.col("left") + F.col("width")) - F.min("left")).alias("width"),
        (F.max(F.col("top") + F.col("height")) - F.min("top")).alias("height"),
    )


def assign_tokens_to_regions(
    tokens: DataFrame,
    regions: DataFrame,
    doc_col: str = "url",
    min_overlap_pct: float = 50.0,
) -> DataFrame:
    """F1/J3: tokens(url, page, left, top, width, height, …) ×
    regions(url, page, region_id, left, top, width, height) — assign each
    token to the FIRST (lowest region_id) same-page region covering >50%
    of the token; deterministic tie-break via min(region_id).

    Join strategy is left to Catalyst/AQE on the (doc, page) equi-keys:
    regions is corpus-proportional (per-document dimension), so a forced
    broadcast is a driver OOM at 100× scale; AQE broadcasts at runtime
    when the built side is genuinely small and shuffles otherwise."""
    r = regions.select(
        F.col(doc_col).alias("_r_doc"),
        F.col("page").alias("_r_page"),
        "region_id",
        F.col("left").alias("_r_left"),
        F.col("top").alias("_r_top"),
        F.col("width").alias("_r_width"),
        F.col("height").alias("_r_height"),
    )
    pct = overlap_percentage(
        F.col("left"), F.col("top"), F.col("width"), F.col("height"),
        F.col("_r_left"), F.col("_r_top"), F.col("_r_width"), F.col("_r_height"),
    )
    joined = tokens.join(
        r,
        (F.col(doc_col) == F.col("_r_doc"))
        & (F.col("page") == F.col("_r_page"))
        & (pct > min_overlap_pct),
        "left",
    )
    token_cols = tokens.columns
    return (
        joined.groupBy(*token_cols)
        .agg(F.min("region_id").alias("region_id"))
    )
