"""Multilingual alignment tests (J4 + F10/F12/F13) — mirrors FIXTURES.md §5:
two language variants with 1:1 paragraphs plus injected noise."""

import pandas as pd

from trainable_entity_extractor_spark.operators.alignment import (
    align_documents,
    align_paragraphs,
    clean_paragraphs,
    is_same_document,
    match_score,
    paragraph_features,
    remove_adjacent_duplicates,
    remove_no_text,
    remove_repeated_headers,
)

ES = [
    "1. Introducción al informe anual 2023",
    "El comité examinó el documento A/78/123 en su sesión",
    "Se aprobaron 3 resoluciones sobre derechos humanos",
    "Conclusiones y recomendaciones finales del grupo",
]
EN = [
    "1. Introduction to the annual report 2023",
    "The committee considered document A/78/123 at its session",
    "3 resolutions on human rights were approved",
    "Final conclusions and recommendations of the group",
]


def feats(texts, page=1):
    return [
        paragraph_features({"text": t, "page": page, "seg_type": "TEXT"}, i)
        for i, t in enumerate(texts)
    ]


def test_match_score_pairs_higher_for_true_pairs():
    es, en = feats(ES), feats(EN)
    for i in range(len(ES)):
        own = match_score(es[i], en[i])
        others = [match_score(es[i], en[j]) for j in range(len(EN)) if j != i]
        assert own > max(others), f"paragraph {i} should best-match its translation"


def test_nw_alignment_is_one_to_one():
    matches = align_paragraphs(feats(ES), feats(EN))
    assert [(m[0], m[1]) for m in matches] == [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert is_same_document(feats(ES), matches)


def test_alignment_survives_insertion():
    en_noisy = EN[:2] + ["completely unrelated inserted paragraph xyz"] + EN[2:]
    matches = align_paragraphs(feats(ES), feats(en_noisy))
    pairs = {(m[0], m[1]) for m in matches}
    assert (0, 0) in pairs and (1, 1) in pairs
    assert (2, 3) in pairs and (3, 4) in pairs  # shifted by the insertion


def test_different_documents_detected():
    other = feats(["totally different words entirely", "nothing matches here at all"])
    matches = align_paragraphs(feats(ES), other)
    assert not is_same_document(feats(ES), matches)


def test_cleaning_passes():
    pars = feats(["", "...", "real paragraph with content", "real paragraph with content", "second real one"])
    no_text = remove_no_text(pars)
    assert [p["text"] for p in no_text] == [
        "real paragraph with content", "real paragraph with content", "second real one",
    ]
    deduped = remove_adjacent_duplicates(no_text)
    assert [p["text"] for p in deduped] == ["real paragraph with content", "second real one"]


def test_repeated_header_removal():
    pars = []
    for page in range(1, 6):
        pars.append(
            paragraph_features(
                {"text": "Annual Report 2023", "page": page, "seg_type": "TEXT", "top": 10.0, "height": 12.0},
                len(pars),
            )
        )
        pars.append(
            paragraph_features(
                {"text": f"unique body paragraph {page}", "page": page, "seg_type": "TEXT", "top": 300.0, "height": 12.0},
                len(pars),
            )
        )
    cleaned = remove_repeated_headers(pars, page_height=700.0)
    texts = [p["text"] for p in cleaned]
    assert "Annual Report 2023" not in texts
    assert len([t for t in texts if t.startswith("unique body")]) == 5


def test_align_documents_spark(spark):
    rows_main, rows_other = [], []
    for d in range(3):
        for i, t in enumerate(ES):
            rows_main.append({"url": f"doc{d}", "seg_idx": i, "page": 1, "seg_type": "TEXT", "text": t})
        for i, t in enumerate(EN):
            rows_other.append({"url": f"doc{d}", "seg_idx": i, "page": 1, "seg_type": "TEXT", "text": t})
    main_df = spark.createDataFrame(pd.DataFrame(rows_main))
    other_df = spark.createDataFrame(pd.DataFrame(rows_other))
    out = align_documents(main_df, other_df).toPandas()
    assert len(out) == 12  # 4 pairs x 3 docs
    assert (out["main_idx"] == out["other_idx"]).all()
