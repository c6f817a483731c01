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


def test_ner_lite_tagger_spans():
    from trainable_entity_extractor_spark.functions.ner_lite import tag_spans

    spans = dict(tag_spans(
        "The Human Rights Council met in Geneva on 12 March 2021 with Maria Santos presiding over France"
    ))
    assert spans.get("12 March 2021") == "DATE"
    assert spans.get("Maria Santos") == "PERSON"
    assert spans.get("France") == "GPE"
    assert any(t == "ORG" and "Council" in s for s, t in spans.items())


def test_ner_first_last_appearance_methods(tmp_path):
    import pandas as pd

    from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier
    from trainable_entity_extractor_spark.methods.text_to_text import (
        NerFirstAppearanceMethod,
        NerLastAppearanceMethod,
    )

    ctx = ExtractionContext(ExtractionIdentifier("ner", output_path=str(tmp_path)))
    rows = [
        {"source_text": "Rapporteur Ana Gomez filed the report with Pedro Ruiz on 1 March 2020",
         "label_text": "Ana Gomez", "values": [], "language_iso": "en", "segments": None},
        {"source_text": "Rapporteur Luis Costa addressed Maria Silva near the United Nations",
         "label_text": "Luis Costa", "values": [], "language_iso": "en", "segments": None},
    ]
    train = pd.DataFrame(rows)
    m = NerFirstAppearanceMethod()
    artifact = m.fit(train, ctx)
    assert artifact["tag_type"] == "PERSON"

    pred = pd.DataFrame(
        [{"source_text": "Rapporteur Elena Petrov met with Igor Volkov in Austria",
          "label_text": "", "values": [], "language_iso": "en", "segments": None}]
    )
    assert m.predict_pandas(pred, ctx, artifact).iloc[0] == "Elena Petrov"
    assert NerLastAppearanceMethod().predict_pandas(pred, ctx, artifact).iloc[0] == "Igor Volkov"


def test_truecasing_method_tournament_fit_predict(tmp_path):
    """M8-slot stand-in: labels are cased variants of lowercased inputs —
    the truecasing method must learn the casing and win on unseen text."""
    import pandas as pd

    from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier
    from trainable_entity_extractor_spark.methods.text_to_text import TrueCasingMethod

    ctx = ExtractionContext(ExtractionIdentifier("tc", output_path=str(tmp_path)))
    rows = [
        {"source_text": "judgment of the inter-american court of human rights",
         "label_text": "Judgment of the Inter-American Court of Human Rights",
         "values": [], "language_iso": "es", "segments": None},
        {"source_text": "opinion of judge garcia ramirez",
         "label_text": "Opinion of Judge Garcia Ramirez",
         "values": [], "language_iso": "es", "segments": None},
        {"source_text": "ruling of the court of human rights",
         "label_text": "Ruling of the Court of Human Rights",
         "values": [], "language_iso": "es", "segments": None},
    ]
    train = pd.DataFrame(rows)
    m = TrueCasingMethod()
    assert m.can_be_used(train, ctx)
    artifact = m.fit(train, ctx)
    pred = pd.DataFrame(
        [{"source_text": "judgment of judge garcia", "label_text": "", "values": [],
          "language_iso": "es", "segments": None}]
    )
    assert m.predict_pandas(pred, ctx, artifact).iloc[0] == "Judgment of Judge Garcia"

    # gate: labels unrelated to inputs -> not usable
    unrelated = pd.DataFrame(
        [{"source_text": "alpha beta", "label_text": "zzz qqq", "values": [],
          "language_iso": "en", "segments": None}] * 4
    )
    assert not m.can_be_used(unrelated, ctx)


def test_gliner_style_date_method():
    """X8 slot stand-in: the reference's windowed-tagging algorithm shape
    (GlinerDateParserMethod.py + GlinerDateExtractor.py) with the
    deterministic pattern tagger in the model slot."""
    from trainable_entity_extractor_spark.methods.text_to_text import (
        GlinerStyleDateMethod,
    )

    m = GlinerStyleDateMethod()
    train = pd.DataFrame(
        {"label_text": ["1995-03-14", "12 March 1998"], "source_text": ["x", "y"]}
    )
    art = m.fit(train, {})
    assert art == {"is_valid": True}

    # invalid gate: any unfindable label marks the method invalid and
    # predict returns '' for every row (the reference's is_valid file)
    bad = m.fit(pd.DataFrame({"label_text": ["not a date"], "source_text": ["x"]}), {})
    assert bad == {"is_valid": False}

    pred = pd.DataFrame(
        {
            "source_text": [
                # alnum normalization strips the comma; mdy_name still matches
                "Adopted on March 14, 1995 in Geneva",
                "no dates at all here",
                # date starts at word ~46: covered by BOTH 50-word windows
                # (stride 25) — the dedup + slide-index arithmetic must
                # count it once and keep the FIRST date
                " ".join(f"w{i}" for i in range(45))
                + " signed 12 March 1998 and later 1 April 1999 end",
            ]
        }
    )
    assert list(m.predict_pandas(pred, {}, art)) == ["1995-03-14", "", "1998-03-12"]
    assert list(m.predict_pandas(pred, {}, bad)) == ["", "", ""]

    # empty label_texts are skipped by the train gate, not treated invalid
    art2 = m.fit(
        pd.DataFrame({"label_text": ["", "  ", "3 May 2001"], "source_text": ["x"] * 3}),
        {},
    )
    assert art2 == {"is_valid": True}
