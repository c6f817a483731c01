"""Geometry operators (X15) + token→region spatial join (F1/J3) +
separator/figure cleaning (X16/F11/F14)."""

import pandas as pd

from trainable_entity_extractor_spark.operators.alignment import (
    is_paragraph_separator,
    merge_colliding,
    paragraph_features,
    remove_big_no_text,
)
from trainable_entity_extractor_spark.operators.geometry import (
    assign_tokens_to_regions,
    merge_boxes,
)


def test_paragraph_separator_battery():
    for marker in ["1.", "(2)", "a)", "(b)", "iv.", "(IX)", "•", "[3]", "§ 12"]:
        assert is_paragraph_separator(marker), marker
    for text in ["1. Introduction", "normal sentence", "A4 paper"]:
        assert not is_paragraph_separator(text), text


def test_remove_big_no_text():
    pars = [
        paragraph_features({"text": "x", "page": 1, "width": 400.0, "height": 600.0}, 0),
        paragraph_features({"text": "a normal paragraph here", "page": 1, "width": 300.0, "height": 14.0}, 1),
    ]
    out = remove_big_no_text(pars, page_width=600.0, page_height=800.0)
    assert [p["text"] for p in out] == ["a normal paragraph here"]


def test_merge_colliding():
    pars = [
        paragraph_features({"text": "left column", "page": 1, "top": 100.0, "height": 20.0}, 0),
        paragraph_features({"text": "right column", "page": 1, "top": 105.0, "height": 20.0}, 1),
        paragraph_features({"text": "below", "page": 1, "top": 300.0, "height": 20.0}, 2),
    ]
    out = merge_colliding(pars)
    assert [p["text"] for p in out] == ["left column right column", "below"]


def test_token_region_assignment(spark):
    tokens = spark.createDataFrame(
        pd.DataFrame(
            [
                {"url": "d", "tok_id": 0, "page": 1, "left": 10.0, "top": 10.0, "width": 20.0, "height": 10.0, "text": "in-region"},
                {"url": "d", "tok_id": 1, "page": 1, "left": 500.0, "top": 500.0, "width": 20.0, "height": 10.0, "text": "outside"},
                {"url": "d", "tok_id": 2, "page": 2, "left": 10.0, "top": 10.0, "width": 20.0, "height": 10.0, "text": "wrong-page"},
            ]
        )
    )
    regions = spark.createDataFrame(
        pd.DataFrame(
            [{"url": "d", "page": 1, "region_id": 7, "left": 0.0, "top": 0.0, "width": 100.0, "height": 100.0}]
        )
    )
    out = {r["tok_id"]: r["region_id"] for r in assign_tokens_to_regions(tokens, regions).collect()}
    assert out[0] == 7
    assert out[1] is None
    assert out[2] is None


def test_merge_boxes(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"g": "a", "left": 10.0, "top": 10.0, "width": 20.0, "height": 10.0},
                {"g": "a", "left": 50.0, "top": 30.0, "width": 20.0, "height": 10.0},
            ]
        )
    )
    row = merge_boxes(df, ["g"]).collect()[0]
    assert (row["left"], row["top"], row["width"], row["height"]) == (10.0, 10.0, 60.0, 30.0)
