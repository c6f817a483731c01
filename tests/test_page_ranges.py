"""A10 valid-page-range inference tests."""

import pandas as pd

from trainable_entity_extractor_spark.operators.page_ranges import (
    PageRangeModel,
    filter_segments_to_valid_pages,
)


def test_front_anchored_range():
    model = PageRangeModel().fit(
        [
            {"total_pages": 20, "label_pages": [2]},
            {"total_pages": 30, "label_pages": [1, 2]},
            {"total_pages": 25, "label_pages": [3]},
        ]
    )
    # start gaps {1,0,2}, range sizes {1,2,1} → front window pages 1..5
    assert model.valid_pages(40) == [1, 2, 3, 4, 5]


def test_back_anchored_range():
    model = PageRangeModel().fit(
        [
            {"total_pages": 20, "label_pages": [20]},
            {"total_pages": 30, "label_pages": [29]},
        ]
    )
    pages = model.valid_pages(50)
    assert 50 in pages or 49 in pages
    assert 1 not in pages


def test_no_labels_fallback_first4_last4():
    model = PageRangeModel().fit([{"total_pages": 20, "label_pages": []}])
    assert model.valid_pages(20) == [1, 2, 3, 4, 17, 18, 19, 20]
    assert model.valid_pages(3) == [1, 2, 3]


def test_roundtrip_serialization():
    model = PageRangeModel().fit([{"total_pages": 9, "label_pages": [4, 5]}])
    again = PageRangeModel.from_dict(model.to_dict())
    assert again.valid_pages(9) == model.valid_pages(9)


def test_spark_page_pruning(spark):
    rows = [
        {"url": "d", "seg_idx": i, "page": p, "text": f"s{p}"}
        for i, p in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    model = PageRangeModel().fit([{"total_pages": 10, "label_pages": [2, 3]}])
    kept = sorted(r["page"] for r in filter_segments_to_valid_pages(df, model).collect())
    assert kept[0] <= 2 and 3 in kept and 10 not in kept

    unbounded = PageRangeModel().fit([])
    kept = sorted(r["page"] for r in filter_segments_to_valid_pages(df, unbounded).collect())
    assert kept == [1, 2, 3, 4, 7, 8, 9, 10]
