"""M9 LLM-codegen slot (methods/llm_codegen.py): the reference's
iterative program-synthesis loop with a pluggable code model — fenced
code extraction, prompt/example round-trip, the deterministic
synthesizer's hypothesis ladder, the 5→15→45 escalation semantics, the
restricted-exec safety contract, and tournament registration."""

import pandas as pd

from trainable_entity_extractor_spark.methods.llm_codegen import (
    CodegenRun,
    CodegenSample,
    LlmCodegenTextMethod,
    build_prompt,
    deterministic_code_model,
    extract_fenced_code,
    load_extract_function,
)


def test_fenced_code_extraction():
    assert extract_fenced_code("x\n```python\ncode here\n```\ny") == "code here\n"
    assert extract_fenced_code("no fences") == ""
    # reference semantics: first ```python to LAST ```
    two = "```python\na\n```\nmid\n```python\nb\n```"
    assert "a" in extract_fenced_code(two) and "b" in extract_fenced_code(two)


def test_prompt_examples_roundtrip():
    samples = [CodegenSample("in one", "out one"), CodegenSample("in 2", "out 2")]
    prompt = build_prompt(samples)
    answer = deterministic_code_model(prompt)
    assert answer.startswith("```python\n") and answer.endswith("```")


def test_hypothesis_ladder_families():
    m = LlmCodegenTextMethod()

    def fit_predict(ins, outs, probe):
        art = m.fit(pd.DataFrame({"source_text": ins, "label_text": outs}), {})
        return list(
            m.predict_pandas(pd.DataFrame({"source_text": probe}), {}, art)
        ), art

    # echo family
    got, _ = fit_predict(["  a  b "] * 9, ["a b"] * 9, ["  q   r "])
    assert got == ["q r"]
    # regex family generalizes to unseen surrounding text
    got, art = fit_predict(
        [f"invoice AB-{1000 + i} processed" for i in range(20)],
        [f"AB-{1000 + i}" for i in range(20)],
        ["ref AB-7777 end", "nothing here"],
    )
    assert got == ["AB-7777", ""] and "re.search" in art["code"]
    # boundary family when no single regex fits the outputs
    got, art = fit_predict(
        ["Ref: alpha .End", "Ref: beta9 .End", "Ref: g-7 .End"] * 4,
        ["alpha", "beta9", "g-7"] * 4,
        ["Ref: zz .End"],
    )
    assert got == ["zz"]
    # nothing fits -> generated function returns '' everywhere
    got, art = fit_predict(
        [f"in {i}" for i in range(12)],
        ["completely", "unrelated", "outputs"] * 4,
        ["whatever"],
    )
    assert got == [""]


def test_escalation_uses_mistakes_and_keeps_best():
    calls = []

    def tracking_model(prompt):
        calls.append(prompt)
        return deterministic_code_model(prompt)

    m = LlmCodegenTextMethod(code_model=tracking_model)
    train = pd.DataFrame(
        {
            "source_text": [f"code XY-{2000 + i} filed" for i in range(60)],
            "label_text": [f"XY-{2000 + i}" for i in range(60)],
        }
    )
    art = m.fit(train, {})
    # first escalation round already consistent -> loop breaks early
    assert len(calls) == 1
    assert "XY" in art["code"] or "re.search" in art["code"]
    out = m.predict_pandas(pd.DataFrame({"source_text": ["see XY-9999 ok"]}), {}, art)
    assert list(out) == ["XY-9999"]


def test_no_client_gate_and_exec_safety():
    gated = LlmCodegenTextMethod(code_model=None)
    assert not gated.can_be_used(pd.DataFrame({"source_text": ["x"]}), {})

    # broken generated code -> None loader -> empty predictions, no raise
    run = CodegenRun(lambda p: "", code="def extract(text(: pass")
    assert run.run_code([CodegenSample("x")]) == [""]
    assert load_extract_function("raise ValueError('boom')") is None
    # a function that throws per-row degrades to '' for that row
    run2 = CodegenRun(lambda p: "", code="def extract(text: str):\n    return text[99]\n")
    assert run2.run_code([CodegenSample("ab")]) == [""]


def test_registered_at_reference_slot():
    from trainable_entity_extractor_spark.methods.text_to_text import (
        TEXT_TO_TEXT_METHODS,
        NerLastAppearanceMethod,
        TrueCasingMethod,
    )

    names = [c.__name__ for c in TEXT_TO_TEXT_METHODS]
    assert "LlmCodegenTextMethod" in names
    # reference order: Gemini/Ollama sit after the NER methods, before MT5
    assert names.index("LlmCodegenTextMethod") > names.index("NerLastAppearanceMethod")
    assert names.index("LlmCodegenTextMethod") < names.index("TrueCasingMethod")


def test_multi_option_seat():
    """The multi-option seat: coverage-first first round, set-compare
    mistakes, option-scaled escalation, labels mapped back to options."""
    import pandas as pd

    from trainable_entity_extractor_spark.domain import (
        ExtractionContext,
        ExtractionIdentifier,
        Option,
    )
    from trainable_entity_extractor_spark.methods.llm_codegen import (
        LlmCodegenMultiOptionMethod,
    )

    opts = [Option("1", "human rights"), Option("2", "rule of law"), Option("3", "food security")]
    ctx = ExtractionContext(ExtractionIdentifier("t"), options=opts, multi_value=True)
    m = LlmCodegenMultiOptionMethod()
    rows = []
    for i in range(30):
        labs = [opts[j].label for j in range(3) if (i >> j) & 1]
        rows.append(
            {
                "source_text": "report covering " + " and ".join(labs) if labs else "empty report",
                "values": [{"id": o.id, "label": o.label} for o in opts if o.label in labs],
            }
        )
    art = m.fit(pd.DataFrame(rows), ctx)
    assert "options = " in art["code"]
    preds = m.predict_pandas(
        pd.DataFrame({"source_text": ["memo on rule of law and food security", "none"]}),
        ctx,
        art,
    )
    assert [[v["id"] for v in r] for r in preds] == [["2", "3"], []]

    # single-value contract caps at one option
    ctx1 = ExtractionContext(ExtractionIdentifier("t1"), options=opts, multi_value=False)
    rows1 = [
        {"source_text": f"about {o.label} only", "values": [{"id": o.id, "label": o.label}]}
        for o in opts
    ] * 4
    art1 = m.fit(pd.DataFrame(rows1), ctx1)
    p1 = m.predict_pandas(
        pd.DataFrame({"source_text": ["about rule of law only"]}), ctx1, art1
    )
    assert [[v["id"] for v in r] for r in p1] == [["2"]]

    # registered at the reference slot: after the fuzzy family
    from trainable_entity_extractor_spark.methods.text_to_multi_option import (
        TEXT_TO_MULTI_OPTION_METHODS,
    )

    names = [c.__name__ for c in TEXT_TO_MULTI_OPTION_METHODS]
    assert "LlmCodegenMultiOptionMethod" in names
    assert names.index("LlmCodegenMultiOptionMethod") > names.index("TextFuzzyAll75")


def test_pdf_composite_seats():
    """The reference's PDF Gemini/Ollama seats: filter-segments budget
    stages wrapping the codegen seat (incl. the both-ends filter), and
    the composed classes registered after the FastText composites."""
    import pandas as pd

    from trainable_entity_extractor_spark.domain import (
        ExtractionContext,
        ExtractionIdentifier,
        Option,
    )
    from trainable_entity_extractor_spark.methods.pdf_to_multi_option import (
        PDF_TO_MULTI_OPTION_METHODS,
    )

    names = [c.__name__ for c in PDF_TO_MULTI_OPTION_METHODS]
    for expected in (
        "CleanEndDotDigits1000LlmCodegenMultiOptionMethod",
        "CleanBeginningDotDigits1000LlmCodegenMultiOptionMethod",
        "CleanBeginning600End600LlmCodegenMultiOptionMethod",
    ):
        assert expected in names
        assert names.index(expected) > names.index(
            "CleanEndDotDigits1000TextFastTextMethod"
        )

    cls = PDF_TO_MULTI_OPTION_METHODS[
        names.index("CleanBeginningDotDigits1000LlmCodegenMultiOptionMethod")
    ]
    opts = [Option("1", "human rights"), Option("2", "rule of law")]
    ctx = ExtractionContext(ExtractionIdentifier("pdfseat"), options=opts, multi_value=True)
    m = cls()
    segs = lambda text: [{"text": text, "page": 1}]
    rows = []
    for i in range(12):
        labs = [opts[j].label for j in range(2) if (i >> j) & 1]
        rows.append(
            {
                "source_text": None,
                "segments": segs("memo about " + " and ".join(labs) if labs else "memo"),
                "values": [{"id": o.id, "label": o.label} for o in opts if o.label in labs],
            }
        )
    art = m.fit(pd.DataFrame(rows), ctx)
    preds = m.predict_pandas(
        pd.DataFrame(
            {
                "source_text": [None],
                "segments": [segs("note on rule of law")],
            }
        ),
        ctx,
        art,
    )
    assert [[v["id"] for v in r] for r in preds] == [["2"]]
