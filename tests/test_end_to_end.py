"""Golden end-to-end tests mirroring the reference's
tests/end_to_end/test_end_to_end.py:15-157 — same fixtures, same expected
winning method, same expected suggestion values.
"""

import shutil

import pandas as pd
import pytest

from trainable_entity_extractor_spark.domain import ExtractionIdentifier, Option
from trainable_entity_extractor_spark.driver import SparkTrainableEntityExtractor


def make_samples(rows):
    return pd.DataFrame(
        [
            {
                "sample_id": str(i),
                "source_text": r.get("source_text", ""),
                "label_text": r.get("label_text", ""),
                "values": r.get("values", []),
                "language_iso": r.get("language_iso", ""),
                "segments": r.get("segments"),
            }
            for i, r in enumerate(rows)
        ]
    )


def seg(text, idx=0):
    return {
        "seg_idx": idx,
        "page": 1,
        "left": 0.0,
        "top": 0.0,
        "width": 0.0,
        "height": 0.0,
        "seg_type": "TEXT",
        "text": text,
        "ml_label": 0,
    }


def test_text_to_multi_option_fuzzy_all_100(spark, tmp_path):
    """Reference test_end_to_end.py:15-77: winner must be TextFuzzyAll100
    and predictions exactly apple / {banana, orange}."""
    identifier = ExtractionIdentifier("e2e_text", output_path=str(tmp_path))
    options = [Option("1", "apple"), Option("2", "banana"), Option("3", "orange")]
    o = lambda i: options[i].to_dict()

    samples = make_samples(
        [
            {"source_text": "I like apple", "values": [o(0)]},
            {"source_text": "I like banana", "values": [o(1)]},
            {"source_text": "I like orange", "values": [o(2)]},
            {"source_text": "I like apple and banana", "values": [o(0), o(1)]},
            {"source_text": "I like banana and orange", "values": [o(1), o(2)]},
            {"source_text": "I like apple and orange", "values": [o(0), o(2)]},
            {"source_text": "I like apple, banana and orange", "values": [o(0), o(1), o(2)]},
            {"source_text": "I like nothing", "values": []},
        ]
    )

    extractor = SparkTrainableEntityExtractor(spark, identifier)
    success, message = extractor.train(samples, options=options, multi_value=True)
    assert success, message

    job = extractor.get_extractor_job()
    assert job.extractor_name == "TextToMultiOptionExtractor"
    assert job.method_name == "TextFuzzyAll100"

    pred_df = extractor.predict_pandas_input(
        [
            {"entity_name": "a", "source_text": "I want an apple"},
            {"entity_name": "b", "source_text": "I want a banana and an orange"},
        ]
    )
    suggestions = {r["entity_name"]: r for r in extractor.predict(pred_df).collect()}
    assert len(suggestions) == 2
    assert [v["id"] for v in suggestions["a"]["values"]] == ["1"]
    assert [v["label"] for v in suggestions["a"]["values"]] == ["apple"]
    assert {v["label"] for v in suggestions["b"]["values"]} == {"banana", "orange"}


def test_full_selector_composition_wins_and_predicts_spark(spark, tmp_path):
    """Free-form labels under a TITLE marker: regex/date methods can't
    learn them, the full 95-dim SegmentSelector composition must win the
    tournament and extract from unseen docs THROUGH the Spark predict
    path (regression: dynamically-built composed method classes must
    survive the broadcast to executors — requires cloudpickle)."""
    names = [
        "Garcia Lopez", "Smith Johnson", "Chen Wei", "Okafor Adichie",
        "Mueller Schmidt", "Rossi Bianchi", "Tanaka Sato", "Kowalski Nowak",
        "Ivanov Petrov", "Silva Santos", "Dubois Martin", "Hansen Olsen",
    ]

    def pos_seg(text, idx, top, seg_type="TEXT", ml=0):
        s = seg(text, idx)
        s.update({"top": top, "seg_type": seg_type, "ml_label": ml})
        return s

    def doc(name, seed):
        import numpy as np

        r = np.random.RandomState(seed)
        return [
            pos_seg(f"opening remarks {r.randint(1000)}", 0, 10.0),
            pos_seg("Rapporteur", 1, 40.0, seg_type="TITLE"),
            pos_seg(name, 2, 60.0, ml=1),
            pos_seg(f"procedural text {r.randint(1000)}", 3, 90.0),
        ]

    samples = make_samples(
        [{"label_text": n, "segments": doc(n, i)} for i, n in enumerate(names)]
    )
    extractor = SparkTrainableEntityExtractor(
        spark, ExtractionIdentifier("e2e_full_sel", output_path=str(tmp_path))
    )
    success, message = extractor.train(samples, options=[], multi_value=False)
    assert success, message
    job = extractor.get_extractor_job()
    assert job.method_name == "PdfToTextSegmentSelectorSameInputOutputMethod"

    pred_df = spark.createDataFrame(
        pd.DataFrame(
            [{"entity_name": "x", "source_text": "", "segments": doc("Yamamoto Suzuki", 77)}]
        )
    )
    rows = extractor.predict(pred_df).collect()
    assert rows[0]["text"] == "Yamamoto Suzuki"


def test_retrain_applies_empty_placeholder(tmp_path, monkeypatch):
    """The winner's full-data retrain must see the same training-prep
    transform as the tournament folds: with 9 samples (an 80/20 split, so
    prepared != all) the empty-text row must still reach fit() as EMPTY.
    Regression: round-1 tournament.train only used the prepared frame when
    its length matched the input, silently skipping the placeholder."""
    from trainable_entity_extractor_spark.domain import (
        EMPTY_PLACEHOLDER,
        ExtractionContext,
    )
    from trainable_entity_extractor_spark.extractors.registry import (
        TextToMultiOptionExtractor,
    )
    from trainable_entity_extractor_spark.plans import tournament

    identifier = ExtractionIdentifier("retrain_ph", output_path=str(tmp_path))
    options = [Option("1", "apple"), Option("2", "banana")]
    o = lambda i: options[i].to_dict()
    samples = make_samples(
        [
            {"source_text": "I like apple", "values": [o(0)]},
            {"source_text": "I like banana", "values": [o(1)]},
            {"source_text": "apple again", "values": [o(0)]},
            {"source_text": "banana again", "values": [o(1)]},
            {"source_text": "more apple", "values": [o(0)]},
            {"source_text": "more banana", "values": [o(1)]},
            {"source_text": "yet more apple", "values": [o(0)]},
            {"source_text": "   ", "values": []},  # empty → EMPTY placeholder
            {"source_text": "final banana", "values": [o(1)]},
        ]
    )
    ctx = ExtractionContext(identifier, options, multi_value=True)
    extractor = TextToMultiOptionExtractor()

    fit_frames: list[pd.DataFrame] = []
    orig_fit = {}
    for method_cls in extractor.METHODS:
        orig_fit[method_cls] = method_cls.fit

        def spy(self, frame, c, _orig=method_cls.fit):
            fit_frames.append(frame)
            return _orig(self, frame, c)

        monkeypatch.setattr(method_cls, "fit", spy)

    tournament.train(extractor, samples, ctx)
    # the retrain is the final fit call, over ALL samples
    retrain_frame = fit_frames[-1]
    assert len(retrain_frame) == len(samples)
    texts = retrain_frame["source_text"].tolist()
    assert EMPTY_PLACEHOLDER in texts
    assert not any((t or "").strip() == "" for t in texts)


def test_pdf_to_multi_option_fuzzy_all_75(spark, tmp_path):
    """Reference test_end_to_end.py:79-157: typo-tolerant matching; winner
    must be FuzzyAll75."""
    identifier = ExtractionIdentifier("e2e_pdf", output_path=str(tmp_path))
    options = [
        Option("1", "The quick brown fox jumps over the lazy dog"),
        Option("2", "My favorite programming language is Python"),
        Option("3", "The capital of France is the city of Paris"),
    ]
    o = lambda i: options[i].to_dict()

    samples = make_samples(
        [
            {"segments": [seg("The quik brown fox jump over a lazy dog")], "values": [o(0)]},
            {"segments": [seg("My favorit programing language is Pithon")], "values": [o(1)]},
            {"segments": [seg("The capital of France is the city of Parris")], "values": [o(2)]},
            {
                "segments": [
                    seg(
                        "The quik brown fox jump over a lazy dog and My favorit programing language is Pithon"
                    )
                ],
                "values": [o(0), o(1)],
            },
            {"segments": [seg("I like nothing")], "values": []},
        ]
    )

    extractor = SparkTrainableEntityExtractor(spark, identifier)
    success, message = extractor.train(samples, options=options, multi_value=True)
    assert success, message

    job = extractor.get_extractor_job()
    assert job.extractor_name == "PdfToMultiOptionExtractor"
    assert job.method_name == "FuzzyAll75"

    pred_df = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "entity_name": "a",
                    "source_text": "",
                    "segments": [seg("The quik brown fox jump over a lazy dog")],
                },
                {
                    "entity_name": "b",
                    "source_text": "",
                    "segments": [
                        seg(
                            "My favorit programing language is Pithon and The capital of France is the city of Parris"
                        )
                    ],
                },
            ]
        )
    )
    suggestions = {r["entity_name"]: r for r in extractor.predict(pred_df).collect()}
    assert len(suggestions) == 2
    assert [v["id"] for v in suggestions["a"]["values"]] == ["1"]
    assert [v["label"] for v in suggestions["a"]["values"]] == [
        "The quick brown fox jumps over the lazy dog"
    ]
    assert {v["label"] for v in suggestions["b"]["values"]} == {
        "My favorite programming language is Python",
        "The capital of France is the city of Paris",
    }
