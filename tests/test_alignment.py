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


# ------------------------ fix_segments repair passes ----------------------

from trainable_entity_extractor_spark.operators.alignment import (  # noqa: E402
    fix_segments,
    merge_paragraph_pair,
    should_merge_paragraphs,
    split_paragraph_at,
)


def _pars(texts):
    return [paragraph_features({"text": t, "page": 1, "seg_type": "TEXT"}, i) for i, t in enumerate(texts)]


def test_fix_segments_splits_swallowed_other_paragraph():
    """Pass 1 (ParagraphsFromLanguage.fix_other_language_segmentation
    :177-203): the other language swallowed two numbered main paragraphs
    into one — the repair splits it at the unassigned main's separator
    first word, and only then does alignment recover both pairs."""
    main = _pars(
        [
            "1. The quick brown fox jumped over the lazy dog",
            "2. The council approved the annual budget report",
        ]
    )
    other = _pars(
        [
            "1. The quick brown fox jumped over the lazy dog "
            "2. The council approved the annual budget report"
        ]
    )
    # without repair: one of the two main paragraphs has no partner
    assert len(align_paragraphs(main, other)) == 1

    main2, other2, changed = fix_segments(main, other)
    assert changed and len(other2) == 2
    assert other2[0]["text"] == "1. The quick brown fox jumped over the lazy dog"
    assert other2[1]["text"].startswith("2. The council")
    matches = align_paragraphs(main2, other2)
    assert [(mi, oi) for mi, oi, _ in matches] == [(0, 0), (1, 1)]


def test_fix_segments_merges_broken_other_fragment():
    """Pass 2 (:326-364): a fragment the other language's segmentation
    broke off is merged back into its aligned neighbor."""
    main = _pars(["The committee discussed the funding proposal at length"])
    other = _pars(["The committee discussed the funding", "proposal at length"])
    main2, other2, changed = fix_segments(main, other)
    assert changed and len(other2) == 1
    assert other2[0]["text"] == main[0]["text"]
    assert len(align_paragraphs(main2, other2)) == 1


def test_fix_segments_merges_split_main_paragraphs():
    """Pass 3 (:366-399): the main language's segmentation split one
    paragraph the other language kept whole — the mains are merged."""
    main = _pars(["The ministers signed", "the historic peace agreement yesterday in Geneva"])
    other = _pars(["The ministers signed the historic peace agreement yesterday in Geneva"])
    main2, other2, changed = fix_segments(main, other)
    assert changed and len(main2) == 1
    assert main2[0]["text"] == other[0]["text"]
    matches = align_paragraphs(main2, other2)
    assert len(matches) == 1 and matches[0][2] > 0.99


def test_split_paragraph_at_guards():
    """split_paragraph (:204-231) refuses non-separators, repeated or
    edge-positioned splitters."""
    lst = _pars(["1. alpha beta 2. gamma delta"])
    assert not split_paragraph_at(lst, "gamma", lst[0])  # not a separator
    assert not split_paragraph_at(lst, "9.", lst[0])  # absent
    twice = _pars(["2. alpha 2. beta end"])
    assert not split_paragraph_at(twice, "2.", twice[0])  # occurs twice
    edge = _pars(["2. starts with it"])
    assert not split_paragraph_at(edge, "2.", edge[0])  # at the start
    ok = _pars(["1. alpha beta 2. gamma delta"])
    assert split_paragraph_at(ok, "2.", ok[0])
    assert [p["text"] for p in ok] == ["1. alpha beta", "2. gamma delta"]


def test_align_documents_repair_flag(spark):
    """End-to-end through the Spark cogroup surface: the swallowed-
    paragraph fixture only aligns 2 pairs WITH the repair passes."""
    main_rows = [
        {"url": "d1", "seg_idx": 0, "page": 1, "seg_type": "TEXT",
         "text": "1. The quick brown fox jumped over the lazy dog"},
        {"url": "d1", "seg_idx": 1, "page": 1, "seg_type": "TEXT",
         "text": "2. The council approved the annual budget report"},
    ]
    other_rows = [
        {"url": "d1", "seg_idx": 0, "page": 1, "seg_type": "TEXT",
         "text": "1. The quick brown fox jumped over the lazy dog "
                 "2. The council approved the annual budget report"},
    ]
    main_df = spark.createDataFrame(pd.DataFrame(main_rows))
    other_df = spark.createDataFrame(pd.DataFrame(other_rows))
    with_repair = align_documents(main_df, other_df).toPandas()
    without = align_documents(main_df, other_df, repair=False).toPandas()
    # without repair only 1 of 2 mains matches, which trips the
    # same-document gate (50% is not > 50%) and drops the whole doc
    assert len(with_repair) == 2 and len(without) == 0
    assert with_repair.sort_values("main_idx")["other_text"].tolist()[1].startswith("2. The council")


def test_fix_segments_no_duplicate_objects():
    """Regression (round-4 review): the merge-into-aligned-next branch of
    the pass-2 repair left the merged paragraph at TWO list indices (the
    reference's own removal no-ops there, :411-416). The repaired lists
    must never contain the same object or text twice."""
    main = _pars(
        ["7 :: budget overview presentation", "cat ran over the green hill near the river"]
    )
    other = _pars(["cat ran", "over the green hill near the river"])
    main2, other2, _ = fix_segments(main, other)
    for lst in (main2, other2):
        ids = [id(p) for p in lst]
        assert len(ids) == len(set(ids))
        texts = [p["text"] for p in lst]
        assert len(texts) == len(set(texts))


def test_fix_segments_word_conservation_property():
    """Property: the repair passes only move text around — split keeps
    both halves, merges concatenate before the source is dropped — so
    the word multiset of each side is preserved, and no object or text
    is ever duplicated. Randomized paragraph lists over a small
    vocabulary (seeded, deterministic) whose separator tokens only occur
    as whole words — the split's substring matching (reference parity:
    `splitter_word not in original_text`) can re-segment characters when
    a separator occurs mid-word, so the invariant is scoped to
    word-boundary-clean text."""
    import random
    from collections import Counter

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "report", "council", "2.", "3.", "(a)", "budget"]
    for _ in range(40):
        def rand_pars():
            n = rng.randint(1, 6)
            return _pars(
                [" ".join(rng.choices(vocab, k=rng.randint(1, 8))) for _ in range(n)]
            )

        main, other = rand_pars(), rand_pars()
        words_main = Counter(w for p in main for w in p["words"])
        words_other = Counter(w for p in other for w in p["words"])
        main2, other2, _ = fix_segments(main, other)
        assert Counter(w for p in main2 for w in p["words"]) == words_main
        assert Counter(w for p in other2 for w in p["words"]) == words_other
        for lst in (main2, other2):
            ids = [id(p) for p in lst]
            assert len(ids) == len(set(ids))


def test_align_documents_applies_big_no_text_f11(spark):
    """F11 runs FIRST in the distributed clean chain
    (MultilingualParagraphAlignerUseCase.py:26-35): a figure-sized box
    (>=20% of the page, >100 area-per-char) is dropped before alignment,
    with page dims derived per document from the segment boxes."""
    rows_main, rows_other = [], []
    for i, t in enumerate(ES):
        rows_main.append(
            {"url": "doc0", "seg_idx": i, "page": 1, "seg_type": "TEXT", "text": t,
             "left": 50.0, "top": 100.0 + i * 60.0, "width": 500.0, "height": 12.0}
        )
    # figure: whole-page box with 8 chars of text -> area/chars >> 100.
    # Without F11-first it would vertically collide with every paragraph
    # and corrupt the merge pass.
    rows_main.append(
        {"url": "doc0", "seg_idx": len(ES), "page": 1, "seg_type": "TEXT",
         "text": "figure 1", "left": 0.0, "top": 0.0, "width": 550.0, "height": 780.0}
    )
    for i, t in enumerate(EN):
        rows_other.append(
            {"url": "doc0", "seg_idx": i, "page": 1, "seg_type": "TEXT", "text": t,
             "left": 50.0, "top": 100.0 + i * 60.0, "width": 500.0, "height": 12.0}
        )
    main_df = spark.createDataFrame(pd.DataFrame(rows_main))
    other_df = spark.createDataFrame(pd.DataFrame(rows_other))
    out = align_documents(main_df, other_df).toPandas()
    assert "figure 1" not in set(out["main_text"])
    assert len(out) == 4
    assert (out["main_idx"] == out["other_idx"]).all()
