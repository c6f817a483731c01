"""Tests for the filter-segments budget family (F7-F9) and FuzzyCommas
(J5 + alias learning A9)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.methods.pdf_to_multi_option import FuzzyCommas
from trainable_entity_extractor_spark.operators.filter_segments import (
    filter_segments_df,
    filter_segments_grouped,
    filter_segments_py,
)


def seg(i, text, ml=0):
    return {
        "seg_idx": i, "page": 1, "left": 0.0, "top": 0.0, "width": 0.0,
        "height": 0.0, "seg_type": "TEXT", "text": text, "ml_label": ml,
    }


def test_filter_segments_py_budget():
    segs = [seg(0, "one two three"), seg(1, "four five"), seg(2, "six")]
    # budget exactly exhausted after seg0 (" one two three" = 14 chars)
    out = filter_segments_py(segs, budget=14)
    assert [s["text"] for s in out] == ["one two three"]
    # one spare char: later segments are visited but cut to empty
    out = filter_segments_py(segs, budget=16)
    assert [s["text"] for s in out] == ["one two three", "", ""]
    out_end = filter_segments_py(segs, budget=10, from_end=True)
    assert out_end[-1]["text"] == "six"


def test_filter_segments_clean_variant():
    segs = [seg(0, "a1b2! c3d4 e5"), seg(1, "tail")]
    out = filter_segments_py(segs, budget=50, clean_alpha=True)
    assert out[0]["text"] == "ab cd e"
    out_digits = filter_segments_py(segs, budget=50, clean_alpha=True, keep_digits=True)
    assert out_digits[0]["text"] == "a1b2 c3d4 e5"


def test_filter_segments_placeholder():
    out = filter_segments_py([], budget=100, placeholder_on_empty=True)
    assert out[0]["text"] == "no text"


def test_filter_segments_grouped_matches_py(spark):
    rows = []
    for d in range(10):
        for i in range(5):
            rows.append({"url": f"u{d}", "seg_idx": i, "text": f"word{i} alpha beta gamma delta epsilon"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = (
        filter_segments_grouped(df, budget=60, url_col="url")
        .orderBy("url", "seg_idx")
        .collect()
    )
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r["text"])
    expected = filter_segments_py(
        [{"seg_idx": i, "text": f"word{i} alpha beta gamma delta epsilon"} for i in range(5)],
        budget=60,
    )
    for url, texts in by_url.items():
        assert texts == [s["text"] for s in expected]


def test_filter_segments_df_native_common_case(spark):
    # when no boundary cut occurs, the native window path is exact
    rows = [{"url": "u", "seg_idx": i, "text": "aaaa bbbb"} for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    native = filter_segments_df(df, budget=30).orderBy("seg_idx").collect()
    exact = filter_segments_py([dict(r) for r in rows], budget=30)
    assert [r["text"] for r in native] == [s["text"] for s in exact]


def make_ctx(tmp_path, options, multi=True):
    return ExtractionContext(
        identifier=ExtractionIdentifier("commas", output_path=str(tmp_path)),
        options=options,
        multi_value=multi,
    )


def test_fuzzy_commas_comma_split_matching(tmp_path):
    options = [Option("1", "Human Rights Council"), Option("2", "Security Council")]
    ctx = make_ctx(tmp_path, options)
    method = FuzzyCommas()
    pdf = pd.DataFrame(
        [
            {"entity_name": "a", "source_text": "", "segments": [seg(0, "Present: human rights council, security council and others")]},
        ]
    )
    preds = method.predict_pandas(pdf, ctx, {"aliases": {}})
    ids = [v["id"] for v in preds.iloc[0]]
    assert ids == ["1", "2"]


def test_fuzzy_commas_word_order_insensitive(tmp_path):
    options = [Option("1", "council rights human")]
    ctx = make_ctx(tmp_path, options)
    method = FuzzyCommas()
    pdf = pd.DataFrame(
        [{"entity_name": "a", "source_text": "", "segments": [seg(0, "human rights council")]}]
    )
    preds = method.predict_pandas(pdf, ctx, {"aliases": {}})
    assert [v["id"] for v in preds.iloc[0]] == ["1"]


def test_fuzzy_commas_alias_learning(tmp_path):
    options = [Option("1", "United Nations Development Programme")]
    ctx = make_ctx(tmp_path, options)
    method = FuzzyCommas()
    train = pd.DataFrame(
        [
            {
                "sample_id": "s0",
                "source_text": "",
                "label_text": "",
                "values": [{"id": "1", "label": "United Nations Development Programme"}],
                "language_iso": "en",
                "segments": [seg(0, "funded by undp programme of united nations development", ml=1)],
            }
        ]
    )
    artifact = method.fit(train, ctx)
    learned = artifact["aliases"]["united nations development programme"]
    assert learned, "alias should be learned from unmatched labeled segment"
    # at predict time the alias matches the same surface form
    pdf = pd.DataFrame(
        [
            {"entity_name": "a", "source_text": "", "segments": [seg(0, "funded by undp programme of united nations development")]}
        ]
    )
    preds = method.predict_pandas(pdf, ctx, artifact)
    assert [v["id"] for v in preds.iloc[0]] == ["1"]
