"""Token-level selectors (Previous/NextWordsTokenSelectorFuzzy75,
reference NextWordsTokenSelectorFuzzy75.py:19-87) and FuzzySegmentSelector
(FuzzySegmentSelector.py:65-137) — PDF→MultiOption M6 surface."""

import pandas as pd

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.methods.pdf_to_multi_option import (
    FuzzySegmentSelector,
    NextWordsTokenSelectorFuzzy75,
    PDF_TO_MULTI_OPTION_METHODS,
    PreviousWordsTokenSelectorFuzzy75,
    token_segments,
)


def seg(text, idx=0, page=1, top=0.0, seg_type="TEXT", ml=0):
    return {
        "seg_idx": idx,
        "page": page,
        "left": 10.0,
        "top": top,
        "width": 100.0,
        "height": 10.0,
        "seg_type": seg_type,
        "text": text,
        "ml_label": ml,
    }


def _ctx(tmp_path, options, multi_value=True):
    return ExtractionContext(
        ExtractionIdentifier("token_sel", output_path=str(tmp_path)), options, multi_value
    )


def test_token_segments_rebuild():
    toks = token_segments([seg("alpha beta", idx=3), seg("gamma", idx=4)])
    assert [t["text"] for t in toks] == ["alpha", "beta", "gamma"]
    assert all(t["ml_label"] == 0 for t in toks)
    assert toks[0]["seg_idx"] == 3  # geometry/metadata inherited


def test_previous_words_token_selector_learns_marker(tmp_path):
    """The option value always follows the token 'code:' — the selector
    must learn it as the predictive previous word and extract the value
    from unseen docs."""
    options = [Option("1", "alpha"), Option("2", "beta")]
    ctx = _ctx(tmp_path, options)
    rows = [
        {"segments": [seg("prefix text code: alpha suffix")], "values": [options[0].to_dict()]},
        {"segments": [seg("other intro code: beta trailing")], "values": [options[1].to_dict()]},
        {"segments": [seg("more words code: alpha here")], "values": [options[0].to_dict()]},
    ]
    train = pd.DataFrame(rows)
    method = PreviousWordsTokenSelectorFuzzy75()
    artifact = method.fit(train, ctx)
    assert "code" in artifact["selector"]["previous_words"]

    pred = pd.DataFrame([{"segments": [seg("unseen stuff code: beta end")], "source_text": None}])
    out = method.predict_pandas(pred, ctx, artifact).iloc[0]
    assert [v["id"] for v in out] == ["2"]


def test_next_words_token_selector_learns_marker(tmp_path):
    """The predictive-word learner filters against the corpus's top-30
    common words (FastSegmentSelector.save_predictive_common_words) — the
    fixture needs a realistic vocabulary so the marker word isn't itself
    'common'. 32 distinct filler words x3 saturate the common list."""
    filler = " ".join(f"filler{i:02d}" for i in range(32))
    pad = f"{filler} {filler} {filler}"
    options = [Option("1", "alpha"), Option("2", "beta")]
    ctx = _ctx(tmp_path, options)
    rows = [
        {"segments": [seg(f"{pad} alpha signature block")], "values": [options[0].to_dict()]},
        {"segments": [seg(f"{pad} beta signature follows")], "values": [options[1].to_dict()]},
    ]
    method = NextWordsTokenSelectorFuzzy75()
    artifact = method.fit(pd.DataFrame(rows), ctx)
    assert "signature" in artifact["selector"]["next_words"]

    pred = pd.DataFrame([{"segments": [seg(f"{pad} alpha signature here")], "source_text": None}])
    out = method.predict_pandas(pred, ctx, artifact).iloc[0]
    assert [v["id"] for v in out] == ["1"]


def test_fuzzy_segment_selector_end_to_end(tmp_path):
    """Values live in the segment right under the 'Subjects' title; the
    full segment-selector model must find that segment in unseen docs and
    fuzzy-match the options there (and NOT in the decoy segment)."""
    options = [Option("1", "human rights"), Option("2", "rule of law"), Option("3", "elections")]
    ctx = _ctx(tmp_path, options)

    def doc(labels, decoy="introductory remarks and procedural matters"):
        return [
            seg(decoy, idx=0, top=10.0),
            seg("Subjects", idx=1, top=50.0, seg_type="TITLE"),
            seg(", ".join(labels), idx=2, top=60.0),
            seg("closing boilerplate paragraph", idx=3, top=90.0),
        ]

    rows = [
        {"segments": doc(["human rights"]), "values": [options[0].to_dict()]},
        {"segments": doc(["rule of law"]), "values": [options[1].to_dict()]},
        {"segments": doc(["elections"]), "values": [options[2].to_dict()]},
        {"segments": doc(["human rights", "elections"]), "values": [options[0].to_dict(), options[2].to_dict()]},
        {"segments": doc(["rule of law", "elections"]), "values": [options[1].to_dict(), options[2].to_dict()]},
        {"segments": doc(["human rights", "rule of law"]), "values": [options[0].to_dict(), options[1].to_dict()]},
    ]
    method = FuzzySegmentSelector()
    artifact = method.fit(pd.DataFrame(rows), ctx)
    assert artifact["selector"]["backend"] in ("gbm", "lightgbm")

    pred = pd.DataFrame(
        [
            {"segments": doc(["rule of law", "human rights"]), "source_text": None},
            {"segments": doc(["elections"]), "source_text": None},
        ]
    )
    out = method.predict_pandas(pred, ctx, artifact)
    assert {v["id"] for v in out.iloc[0]} == {"1", "2"}
    assert {v["id"] for v in out.iloc[1]} == {"3"}


def test_method_list_matches_reference_order():
    """PdfToMultiOptionExtractor.py:102-132 minus external models (the
    FastText composites use the numpy classifier; the Gemini/Ollama
    composite seats use the codegen loop with its offline synthesizer,
    in the reference's position after the FastText composites)."""
    names = [m.__name__ for m in PDF_TO_MULTI_OPTION_METHODS]
    assert names == [
        "FuzzyFirst",
        "FuzzyLast",
        "FuzzyFirstCleanLabel",
        "FuzzyLastCleanLabel",
        "FuzzyAll100",
        "FuzzyAll88",
        "FuzzyAll75",
        "PreviousWordsTokenSelectorFuzzy75",
        "NextWordsTokenSelectorFuzzy75",
        "PreviousWordsSentenceSelectorFuzzyCommas",
        "FastSegmentSelectorFuzzy95",
        "FastSegmentSelectorFuzzyCommas",
        "FuzzySegmentSelector",
        "CleanBeginningDotDigits500TextFastTextMethod",
        "CleanEndDotDigits1000TextFastTextMethod",
        "CleanEndDotDigits1000LlmCodegenMultiOptionMethod",
        "CleanBeginningDotDigits1000LlmCodegenMultiOptionMethod",
        "CleanBeginning600End600LlmCodegenMultiOptionMethod",
    ]
