"""Text→Text tournament tests over FIXTURES.md §3-style tasks: each task's
expected winner mirrors the reference's method semantics (RegexMethod /
DateParserMethod / SameInputOutputMethod / InputWithoutSpaces)."""

import pandas as pd
import pytest

from trainable_entity_extractor_spark.domain import ExtractionIdentifier
from trainable_entity_extractor_spark.driver import SparkTrainableEntityExtractor


def make_samples(rows):
    return pd.DataFrame(
        [
            {
                "sample_id": str(i),
                "source_text": r[0],
                "label_text": r[1],
                "values": [],
                "language_iso": r[2] if len(r) > 2 else "en",
                "segments": None,
            }
            for i, r in enumerate(rows)
        ]
    )


def train_and_predict(spark, tmp_path, name, rows, predict_texts):
    identifier = ExtractionIdentifier(name, output_path=str(tmp_path))
    extractor = SparkTrainableEntityExtractor(spark, identifier)
    ok, msg = extractor.train(make_samples(rows))
    assert ok, msg
    job = extractor.get_extractor_job()
    pred_df = extractor.predict_pandas_input(
        [{"entity_name": str(i), "source_text": t} for i, t in enumerate(predict_texts)]
    )
    results = {r["entity_name"]: r["text"] for r in extractor.predict(pred_df).collect()}
    return job, [results[str(i)] for i in range(len(predict_texts))]


def test_identity_task_wins_same_input_output(spark, tmp_path):
    rows = [(f"value {i}", f"value {i}") for i in range(10)]
    job, preds = train_and_predict(spark, tmp_path, "tt_identity", rows, ["value 99"])
    assert job.method_name == "SameInputOutputMethod"
    assert preds == ["value 99"]


def test_no_spaces_task(spark, tmp_path):
    rows = [(f"AB {i:04d} X", f"AB{i:04d}X") for i in range(10)]
    job, preds = train_and_predict(spark, tmp_path, "tt_nospaces", rows, ["AB 0042 X"])
    assert job.method_name == "InputWithoutSpaces"
    assert preds == ["AB0042X"]


def test_code_extraction_task_wins_regex(spark, tmp_path):
    rows = [
        (f"ref num XK-{1000 + i} issued by office", f"XK-{1000 + i}") for i in range(12)
    ]
    job, preds = train_and_predict(
        spark, tmp_path, "tt_code", rows, ["ref num XK-7777 issued by office"]
    )
    assert job.method_name in ("RegexMethod", "NoSpacesRegexMethod", "RegexSubtractionMethod")
    assert preds == ["XK-7777"]


def test_date_task_wins_date_parser(spark, tmp_path):
    dates = [
        ("Done at Geneva on 5 March 2021 by the council", "2021-03-05"),
        ("Done at Geneva on 17 June 2020 by the council", "2020-06-17"),
        ("Done at Geneva on 1 January 2019 by the council", "2019-01-01"),
        ("Done at Geneva on 23 April 2022 by the council", "2022-04-23"),
        ("Done at Geneva on 9 October 2018 by the council", "2018-10-09"),
        ("Done at Geneva on 30 May 2023 by the council", "2023-05-30"),
        ("Done at Geneva on 2 February 2017 by the council", "2017-02-02"),
        ("Done at Geneva on 11 November 2016 by the council", "2016-11-11"),
    ]
    job, preds = train_and_predict(
        spark, tmp_path, "tt_date", dates, ["Done at Geneva on 6 August 2024 by the council"]
    )
    assert "DateParser" in job.method_name
    assert preds == ["2024-08-06"]
