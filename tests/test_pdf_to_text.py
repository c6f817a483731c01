"""Pdf→Text tournament tests: stand-alone methods and the selector×text
composition (M10)."""

import pandas as pd

from trainable_entity_extractor_spark.domain import ExtractionIdentifier
from trainable_entity_extractor_spark.driver import SparkTrainableEntityExtractor


def seg(i, text, ml=0, page=1):
    return {
        "seg_idx": i, "page": page, "left": 0.0, "top": 100.0 * i, "width": 100.0,
        "height": 12.0, "seg_type": "TEXT", "text": text, "ml_label": ml,
    }


def make_samples(rows):
    return pd.DataFrame(
        [
            {
                "sample_id": str(i),
                "source_text": "",
                "label_text": label,
                "values": [],
                "language_iso": "en",
                "segments": segs,
            }
            for i, (segs, label) in enumerate(rows)
        ]
    )


def test_pdf_first_date_wins_on_date_task(spark, tmp_path):
    rows = []
    for i in range(8):
        date_txt = f"{5 + i} March 202{i % 3}"
        expect = f"202{i % 3}-03-{5 + i:02d}"
        rows.append(
            (
                [seg(0, "some header text"), seg(1, f"signed on {date_txt} by the office", ml=1), seg(2, "trailing")],
                expect,
            )
        )
    identifier = ExtractionIdentifier("p2t_date", output_path=str(tmp_path))
    extractor = SparkTrainableEntityExtractor(spark, identifier)
    ok, msg = extractor.train(make_samples(rows))
    assert ok, msg
    job = extractor.get_extractor_job()
    assert job.extractor_name == "PdfToTextExtractor"
    assert "Date" in job.method_name or "DateParser" in job.method_name

    pred_df = spark.createDataFrame(
        pd.DataFrame(
            [{"entity_name": "a", "source_text": "", "segments": [seg(0, "x"), seg(1, "done 9 October 2019 here"), seg(2, "y")]}]
        )
    )
    out = extractor.predict(pred_df).collect()
    assert out[0]["text"] == "2019-10-09"


def test_pdf_regex_two_segment_window(spark, tmp_path):
    from trainable_entity_extractor_spark.domain import ExtractionContext
    from trainable_entity_extractor_spark.methods.pdf_to_text import PdfToTextRegexMethod

    ctx = ExtractionContext(identifier=ExtractionIdentifier("p2t_rx", output_path=str(tmp_path)))
    train = make_samples(
        [([seg(0, f"code QX-{1000 + i}")], f"QX-{1000 + i}") for i in range(6)]
    )
    method = PdfToTextRegexMethod()
    artifact = method.fit(train, ctx)
    # payload split across two segments: the sliding 2-segment concat finds it
    pred = pd.DataFrame(
        [{"entity_name": "a", "source_text": "", "segments": [seg(0, "ref QX-"), seg(1, "", ), ]}]
    )
    pred2 = pd.DataFrame(
        [{"entity_name": "a", "source_text": "", "segments": [seg(0, "prefix only"), seg(1, "QX-7777 suffix")]}]
    )
    assert method.predict_pandas(pred2, ctx, artifact).iloc[0] == "QX-7777"
