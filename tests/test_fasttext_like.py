"""From-scratch fastText-style classifier (M7, TextFastTextMethod slot)
and its filter-segments composites (PdfToMultiOptionExtractor.py:116-117)."""

import tempfile

import pandas as pd
import pytest

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.methods.fasttext_like import TextFastTextMethod


def _ctx(options, multi=True):
    return ExtractionContext(
        ExtractionIdentifier("ft", output_path=tempfile.mkdtemp()), options, multi
    )


def _frame(rows):
    return pd.DataFrame(
        [
            {
                "source_text": t,
                "values": [{"id": v, "label": v} for v in vals],
                "label_text": "",
                "language_iso": "en",
                "segments": None,
            }
            for t, vals in rows
        ]
    )


def test_fasttext_like_learns_topics():
    options = [Option("sports", "sports"), Option("finance", "finance")]
    ctx = _ctx(options, multi=False)
    train = _frame(
        [
            (f"the match ended with a late goal and the crowd cheered {i}", ["sports"])
            for i in range(8)
        ]
        + [
            (f"the market closed higher as bank shares rallied {i}", ["finance"])
            for i in range(8)
        ]
    )
    m = TextFastTextMethod()
    assert m.can_be_used(train, ctx)
    artifact = m.fit(train, ctx)
    test = _frame(
        [
            ("another goal thrilled the crowd at the match", []),
            ("shares rallied and the market closed strong", []),
        ]
    )
    preds = m.predict_pandas(test, ctx, artifact)
    assert [v["id"] for v in preds.iloc[0]] == ["sports"]
    assert [v["id"] for v in preds.iloc[1]] == ["finance"]


def test_fasttext_like_deterministic_artifact():
    options = [Option("a", "a"), Option("b", "b")]
    ctx = _ctx(options)
    train = _frame([("alpha words here", ["a"])] * 4 + [("beta tokens there", ["b"])] * 4)
    m = TextFastTextMethod()
    import json

    assert json.dumps(m.fit(train, ctx)) == json.dumps(m.fit(train, ctx))


def test_fasttext_composite_consumes_filtered_segments():
    from trainable_entity_extractor_spark.methods.pdf_to_multi_option import (
        build_filter_text_method,
    )

    options = [Option("x", "alpha"), Option("y", "beta")]
    ctx = _ctx(options, multi=False)
    composed_cls = build_filter_text_method(TextFastTextMethod, "CleanBeginningDotDigits500", 500, False)
    assert composed_cls.__name__ == "CleanBeginningDotDigits500TextFastTextMethod"

    def seg(text):
        return {"seg_idx": 0, "page": 1, "seg_type": "TEXT", "text": text, "ml_label": 0}

    rows = [
        {"segments": [seg(f"alpha topic discussed at length {i}")], "values": [{"id": "x", "label": "alpha"}],
         "source_text": None, "label_text": "", "language_iso": "en"}
        for i in range(6)
    ] + [
        {"segments": [seg(f"beta matters reviewed in detail {i}")], "values": [{"id": "y", "label": "beta"}],
         "source_text": None, "label_text": "", "language_iso": "en"}
        for i in range(6)
    ]
    train = pd.DataFrame(rows)
    method = composed_cls()
    artifact = method.fit(train, ctx)
    pred = pd.DataFrame(
        [{"segments": [seg("alpha topic again discussed")], "values": [], "source_text": None,
          "label_text": "", "language_iso": "en"}]
    )
    out = method.predict_pandas(pred, ctx, artifact)
    assert [v["id"] for v in out.iloc[0]] == ["x"]
