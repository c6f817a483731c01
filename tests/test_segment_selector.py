"""Fast segment selector (M6) + composition tests — mirrors the reference's
segment-selector unit tests (tests/unit_tests/extractors/segment_selector/)."""

import pandas as pd

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.methods.pdf_to_multi_option import (
    FastSegmentSelectorFuzzy95,
    fix_two_pages_segments,
)
from trainable_entity_extractor_spark.methods.segment_selector import (
    FastSegmentSelector,
    predictive_words,
)


def seg(i, text, ml=0, page=1, seg_type="TEXT"):
    return {
        "seg_idx": i, "page": page, "left": 0.0, "top": 0.0, "width": 0.0,
        "height": 0.0, "seg_type": seg_type, "text": text, "ml_label": ml,
    }


# 35 distinct filler words repeated 3x per doc dominate the top-30 common
# list, so the once-per-doc marker words survive the stopword filter (the
# reference's predictive words are exactly the non-common neighbor words).
FILLER = " ".join(
    w for w in (f"filler{i:02d}" for i in range(35)) for _ in range(3)
)


def make_doc(value, ml=True):
    """Documents where the labeled segment always sits between a 'refmark'
    marker segment and a 'signmark' marker segment."""
    return [
        seg(0, FILLER),
        seg(1, "refmark xq"),
        seg(2, f"the payload value is {value}", ml=1 if ml else 0),
        seg(3, "signmark yq"),
        seg(4, FILLER),
    ]


def test_predictive_words_from_first_labeled_segment():
    corpus = []
    for i in range(10):
        corpus.extend(make_doc(f"val{i}"))
    prev_w, next_w = predictive_words(corpus)
    assert set(prev_w) <= {"refmark", "xq"} and prev_w
    assert set(next_w) <= {"signmark", "yq"} and next_w


def test_selector_learns_neighbor_words():
    train = []
    for i in range(30):
        train.extend(make_doc(f"v{i}"))
    selector = FastSegmentSelector()
    artifact = selector.fit(train)
    test_doc = make_doc("unseen", ml=False)
    selected = selector.select(test_doc, artifact)
    assert len(selected) >= 1
    assert any("payload value is unseen" in s["text"] for s in selected)
    # near-smoothing widens the selection
    near = selector.select(test_doc, artifact, near=1)
    assert len(near) >= len(selected)


def test_fix_two_pages_segments_merge():
    segs = [
        seg(0, "this sentence continues", page=1),
        seg(1, "on the next page.", page=2),
        seg(2, "standalone.", page=2),
    ]
    fixed = fix_two_pages_segments(segs)
    assert fixed[0]["text"] == "this sentence continues on the next page."
    assert len(fixed) == 2


def test_fast_segment_selector_fuzzy95_end_to_end(tmp_path):
    options = [Option("1", "universal periodic review"), Option("2", "climate change mitigation")]
    ctx = ExtractionContext(
        identifier=ExtractionIdentifier("fss", output_path=str(tmp_path)),
        options=options,
        multi_value=True,
    )
    train_rows = []
    for i in range(20):
        label = options[i % 2]
        train_rows.append(
            {
                "sample_id": str(i),
                "source_text": "",
                "label_text": "",
                "values": [label.to_dict()],
                "language_iso": "en",
                "segments": make_doc(label.label),
            }
        )
    train = pd.DataFrame(train_rows)
    method = FastSegmentSelectorFuzzy95()
    assert method.can_be_used(train, ctx)
    artifact = method.fit(train, ctx)

    pred = pd.DataFrame(
        [
            {"entity_name": "a", "source_text": "", "segments": make_doc("universal periodic review", ml=False)},
            {"entity_name": "b", "source_text": "", "segments": make_doc("climate change mitigation", ml=False)},
        ]
    )
    preds = method.predict_pandas(pred, ctx, artifact)
    assert [v["id"] for v in preds.iloc[0]] == ["1"]
    assert [v["id"] for v in preds.iloc[1]] == ["2"]
