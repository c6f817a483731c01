"""Unit tests for the from-scratch function kernels (fuzzy, rexpy_lite,
dates, text normalization) — mirrors the reference's per-method unit-test
strategy (SURVEY.md §5.2)."""

import random

from hypothesis import given, settings, strategies as st

from trainable_entity_extractor_spark.functions.dates import extract_date, search_dates
from trainable_entity_extractor_spark.functions.fuzzy import (
    _bit_masks,
    _lcs_bitparallel,
    indel_ratio,
    partial_ratio,
    pdf_fuzzy_all_appearances,
    text_fuzzy_all_appearances,
)
from trainable_entity_extractor_spark.functions.rexpy_lite import extract
from trainable_entity_extractor_spark.functions.text import (
    clean_labels,
    py_clean_alnum_words,
    py_remove_accents,
    py_sanitize_language,
)
import re


def _lcs_dp(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
    return dp[m][n]


@given(st.text(alphabet="abcd ", max_size=24), st.text(alphabet="abcd ", max_size=24))
@settings(max_examples=300, deadline=None)
def test_lcs_bitparallel_matches_dp(a, b):
    assert _lcs_bitparallel(a, b, _bit_masks(a)) == _lcs_dp(a, b)


@given(st.text(alphabet="abc ", max_size=12), st.text(alphabet="abc ", max_size=18))
@settings(max_examples=200, deadline=None)
def test_partial_ratio_matches_naive(a, b):
    def naive(needle, hay):
        if len(needle) > len(hay):
            needle, hay = hay, needle
        m, n = len(needle), len(hay)
        if m == 0:
            return 100.0 if n == 0 else 0.0
        best = 0.0
        for i in range(n - m + 1):
            best = max(best, 100.0 * 2 * _lcs_dp(needle, hay[i : i + m]) / (2 * m))
        for w in range(1, m):
            best = max(best, 100.0 * 2 * _lcs_dp(needle, hay[:w]) / (m + w))
            best = max(best, 100.0 * 2 * _lcs_dp(needle, hay[n - w :]) / (m + w))
        return best

    assert abs(partial_ratio(a, b) - naive(a, b)) < 1e-9


def test_ratio_known_values():
    # published rapidfuzz doc example
    assert abs(indel_ratio("this is a test", "this is a test!") - 96.55172413793103) < 1e-9
    assert partial_ratio("this is a test", "this is a test!") == 100.0
    assert indel_ratio("", "") == 100.0


def test_fuzzy_all_consumption_semantics():
    # longest-first with consumption: 'apple pie' consumed before 'apple'
    apps = pdf_fuzzy_all_appearances(
        ["I ate apple pie today"], ["apple pie", "apple"], 100.0
    )
    assert [a[0] for a in apps] == ["apple pie"]
    # two distinct occurrences allow both to match
    apps = pdf_fuzzy_all_appearances(
        ["I ate apple pie and one apple today"], ["apple pie", "apple"], 100.0
    )
    assert [a[0] for a in apps] == ["apple pie", "apple"]


def test_text_fuzzy_all_length_guard():
    # text shorter than ceil(0.85*len(option)) is skipped
    assert text_fuzzy_all_appearances("apl", ["apple pie"], 75.0) == []


def test_rexpy_lite_roundtrip():
    examples = ["AB-1234", "CD-0042", "ZZ-9999"]
    regexes = extract(examples)
    assert len(regexes) == 1
    pattern = regexes[0]
    assert pattern.startswith("^") and pattern.endswith("$")
    for e in examples:
        assert re.fullmatch(pattern[1:-1], e)
    # shapes separate
    assert len(extract(["AB-1234", "123456"])) == 2


def test_date_parser_formats():
    assert extract_date("signed on 2021-03-05 in Geneva") == "2021-03-05"
    assert extract_date("Geneva, 5 March 2021") == "2021-03-05"
    assert extract_date("March 5, 2021") == "2021-03-05"
    assert extract_date("5 de marzo de 2021", ["es"]) == "2021-03-05"
    assert extract_date("05/03/2021", ["es"]) == "2021-03-05"
    # dotted DMY for Slavic/Baltic set
    assert extract_date("подписано 05.03.2021", ["ru"]) == "2021-03-05"
    # letters-preferred best date
    assert extract_date("01/02/2000 then 5 March 2021") == "2021-03-05"
    assert extract_date("no date here") is None


def test_text_helpers():
    assert py_remove_accents("Érdèkes ñ") == "Erdekes n"
    assert py_clean_alnum_words("a-b c! 42") == "ab c 42"
    assert py_sanitize_language("es") == "es"
    assert py_sanitize_language("eng") == "en"
    assert py_sanitize_language("xx") == "en"
    assert py_sanitize_language(None) == "en"


def test_clean_labels_shared_word_removal():
    labels = ["republic of france", "republic of spain", "monaco"]
    cleaned = clean_labels(labels)
    assert cleaned[0] == "france"
    assert cleaned[1] == "spain"
    assert cleaned[2] == "monaco"


def test_truecaser_learns_context_dependent_casing():
    """X13 stand-in: casing distributions learned from corpus. 'bill' must
    come back as 'Bill' after 'president' (name context) but stay lower in
    'pay the bill' (noun context)."""
    from trainable_entity_extractor_spark.functions.truecase import fit_truecaser, truecase

    corpus = (
        ["President Bill Clinton spoke today"] * 6
        + ["please pay the bill before friday"] * 6
        + ["the United Nations met in Geneva"] * 4
    )
    model = fit_truecaser(corpus)
    assert truecase("president bill clinton spoke", model) == "President Bill Clinton spoke"
    assert truecase("pay the bill before friday", model) == "pay the bill before friday"
    assert truecase("the united nations met in geneva", model) == "the United Nations met in Geneva"
    # unknown tokens pass through untouched
    assert truecase("zzz unknown", model) == "zzz unknown"
    # deterministic artifact
    import json

    assert json.dumps(model, sort_keys=True) == json.dumps(fit_truecaser(corpus), sort_keys=True)


# ------------------------------------------------ O7 artifact hygiene


def test_artifact_folder_hygiene(tmp_path):
    """O7: stale-dir detection, fresh-folder wipe, and the idempotent
    stale sweep (reference ExtractionIdentifier.is_old 2-day window +
    LocalJobExecutor.ensure_fresh_model_folder 1-hour window)."""
    import os
    import time

    from trainable_entity_extractor_spark.domain import (
        ExtractionIdentifier,
        clean_stale_extractions,
    )

    base = str(tmp_path)
    old = ExtractionIdentifier("old_task", "tenant", base)
    fresh = ExtractionIdentifier("fresh_task", "tenant", base)
    old_p = old.get_path()
    fresh_p = fresh.get_path()
    old_p.mkdir(parents=True)
    fresh_p.mkdir(parents=True)
    (old_p / "model.json").write_text("{}")
    stale_t = time.time() - 3 * 24 * 3600
    os.utime(old_p, (stale_t, stale_t))

    assert old.is_old() and not fresh.is_old()

    # ensure_fresh_folder wipes a >1h-old dir, keeps a recent one
    hour_old = time.time() - 2 * 3600
    os.utime(old_p, (hour_old, hour_old))
    assert (old_p / "model.json").exists()
    old.ensure_fresh_folder()
    assert old_p.exists() and not (old_p / "model.json").exists()
    (fresh_p / "keep.json").write_text("{}")
    fresh.ensure_fresh_folder()
    assert (fresh_p / "keep.json").exists()

    # sweep removes only the stale extraction dir
    os.utime(old_p, (stale_t, stale_t))
    removed = clean_stale_extractions(base)
    assert removed == [str(old_p)]
    assert not old_p.exists() and fresh_p.exists()
    assert clean_stale_extractions(base) == []  # idempotent
