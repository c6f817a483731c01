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
