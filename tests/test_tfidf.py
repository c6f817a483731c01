"""TF-IDF one-vs-rest classifier tests (M7 slot)."""

import pandas as pd

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.methods.tfidf import TextTfIdf


def make_ctx(tmp_path, options, multi=True):
    return ExtractionContext(
        identifier=ExtractionIdentifier("tfidf", output_path=str(tmp_path)),
        options=options,
        multi_value=multi,
    )


def sample(i, text, value_ids, options):
    return {
        "sample_id": str(i),
        "source_text": text,
        "label_text": "",
        "values": [o.to_dict() for o in options if o.id in value_ids],
        "language_iso": "en",
        "segments": None,
    }


def test_tfidf_learns_topic_separation(tmp_path):
    options = [Option("1", "sports"), Option("2", "finance")]
    ctx = make_ctx(tmp_path, options)
    sports = ["football match score goal team", "tennis player won the cup match",
              "league season goal striker team", "match day goal keeper team squad"]
    finance = ["stock market price shares fell", "bank interest rate bond yield",
               "shares price market trading profit", "bond market yield bank balance"]
    rows = [sample(i, t, {"1"}, options) for i, t in enumerate(sports)]
    rows += [sample(10 + i, t, {"2"}, options) for i, t in enumerate(finance)]
    train = pd.DataFrame(rows)

    method = TextTfIdf()
    assert method.can_be_used(train, ctx)
    artifact = method.fit(train, ctx)

    pred = pd.DataFrame(
        [
            {"entity_name": "a", "source_text": "the team scored a late goal in the match"},
            {"entity_name": "b", "source_text": "the bank raised the interest rate on bonds"},
        ]
    )
    preds = method.predict_pandas(pred, ctx, artifact)
    assert [v["id"] for v in preds.iloc[0]] == ["1"]
    assert [v["id"] for v in preds.iloc[1]] == ["2"]


def test_tfidf_single_value_argmax(tmp_path):
    options = [Option("1", "sports"), Option("2", "finance")]
    ctx = make_ctx(tmp_path, options, multi=False)
    rows = [sample(i, f"goal match team {i}", {"1"}, options) for i in range(4)]
    rows += [sample(10 + i, f"market shares bank {i}", {"2"}, options) for i in range(4)]
    method = TextTfIdf()
    artifact = method.fit(pd.DataFrame(rows), ctx)
    preds = method.predict_pandas(
        pd.DataFrame([{"entity_name": "a", "source_text": "goal match team today"}]), ctx, artifact
    )
    assert len(preds.iloc[0]) <= 1
