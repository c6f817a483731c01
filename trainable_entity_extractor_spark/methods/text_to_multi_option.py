"""Text→MultiOption method family (SURVEY.md §2.3 J1/J2, §2.9 M5).

Reference sources: NaiveTextToMultiOptionMethod.py, FirstWordRegex.py:18-77,
TextFuzzyFirst.py:13-46, TextFuzzyFirstCleanLabels.py:16-77,
TextFuzzyLast.py, TextFuzzyAll100.py:13-45 (+88/75 threshold subclasses).

Method order below matches TextToMultiOptionExtractor.METHODS (reference
TextToMultiOptionExtractor.py:74-91) minus network/GPU methods, so the
tournament's early-exit picks the same winner.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd

from ..domain import ExtractionContext
from ..functions import rexpy_lite
from ..functions.fuzzy import text_fuzzy_all_appearances, text_fuzzy_first_last_appearance
from ..functions.text import clean_labels, py_remove_accents
from .base import MethodBase, input_text


def _options_as_dicts(ctx: ExtractionContext, labels_matched: list[str], lower_to_option) -> list[dict]:
    return [lower_to_option[l] for l in labels_matched]


class NaiveTextToMultiOptionMethod(MethodBase):
    kind = "multi_option"

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        first = [o.to_dict() | {"segment_text": ""} for o in ctx.options[:1]]
        return pd.Series([list(first) for _ in range(len(pdf))], index=pdf.index, dtype=object)


class FirstWordRegex(MethodBase):
    """Per-option regexes induced from first words of its positive samples;
    predict matches the sample's first word; options ordered by regex-list
    size ascending; fallback = option with the largest regex list
    (FirstWordRegex.py:22-77)."""

    kind = "multi_option"

    def fit(self, train_pdf, ctx) -> dict[str, Any]:
        per_option: dict[str, list[str]] = {}
        for option in ctx.options:
            texts = []
            for _, row in train_pdf.iterrows():
                values = row.get("values") or []
                if any(v["id"] == option.id for v in values):
                    text = input_text(row)
                    if text:
                        texts.append(text)
            first_words = [t.split()[0] for t in texts if t.split()]
            regex_list = [r[1:-1] for r in rexpy_lite.extract(first_words)]
            per_option[option.id] = regex_list
        return {"per_option": per_option}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        per_option = artifact.get("per_option", {})
        options_regex = sorted(
            ((o, per_option.get(o.id, [])) for o in ctx.options), key=lambda x: len(x[1])
        )
        fallback = [options_regex[-1][0]] if options_regex else []
        out = []
        for _, row in pdf.iterrows():
            text = input_text(row)
            predictions: list[str] = []
            if text.strip():
                first_word = text.split()[0]
                for option, regex_list in options_regex:
                    if any(re.match(regex, first_word) for regex in regex_list):
                        predictions.append(option.id)
                    if not ctx.multi_value and predictions:
                        break
            if predictions:
                chosen = [o for o in ctx.options if o.id in predictions]
            else:
                chosen = list(fallback) if text.strip() else []
            out.append([o.to_dict() | {"segment_text": ""} for o in chosen])
        return pd.Series(out, index=pdf.index, dtype=object)


class _TextFuzzyFirstLast(MethodBase):
    kind = "multi_option"
    reverse = False
    clean = False

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        if self.clean:
            labels = clean_labels([py_remove_accents(o.label.lower()) for o in ctx.options])
            match_keys = [py_remove_accents(o.label).lower() for o in ctx.options]
        else:
            labels = [o.label.lower() for o in ctx.options]
            match_keys = labels
        out = []
        for _, row in pdf.iterrows():
            text = input_text(row)
            if self.clean:
                text = py_remove_accents(text)
            hit = text_fuzzy_first_last_appearance(text, labels, self.reverse) if labels else None
            if hit is None:
                out.append([])
                continue
            # map back: reference filters options whose accent-stripped label
            # equals the hit (TextFuzzyFirstCleanLabels.py:44-46 — note this
            # intentionally misses options whose label was altered by
            # clean_labels; we reproduce that quirk).
            chosen = [o for o, k in zip(ctx.options, match_keys) if k == hit]
            out.append([o.to_dict() | {"segment_text": ""} for o in chosen])
        return pd.Series(out, index=pdf.index, dtype=object)


class TextFuzzyFirst(_TextFuzzyFirstLast):
    reverse = False


class TextFuzzyFirstCleanLabels(_TextFuzzyFirstLast):
    reverse = False
    clean = True


class TextFuzzyLast(_TextFuzzyFirstLast):
    reverse = True


class TextFuzzyLastCleanLabels(_TextFuzzyFirstLast):
    reverse = True
    clean = True


class TextFuzzyAll100(MethodBase):
    """J1: every option scoring partial_ratio >= threshold on the full text
    (TextFuzzyAll100.py:20-41). threshold==100 reduces to substring
    containment — the Spark bulk path for this method is a native
    `contains` expression (operators/fuzzy_join.py)."""

    kind = "multi_option"
    threshold = 100.0

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        labels = [o.label.lower() for o in ctx.options]
        out = []
        for _, row in pdf.iterrows():
            text = input_text(row)
            matched = set(text_fuzzy_all_appearances(text, labels, self.threshold))
            chosen = [o for o, lab in zip(ctx.options, labels) if lab in matched]
            out.append([o.to_dict() | {"segment_text": ""} for o in chosen])
        return pd.Series(out, index=pdf.index, dtype=object)


class TextFuzzyAll88(TextFuzzyAll100):
    threshold = 88.0


class TextFuzzyAll75(TextFuzzyAll100):
    threshold = 75.0


TEXT_TO_MULTI_OPTION_METHODS: list[type[MethodBase]] = [
    NaiveTextToMultiOptionMethod,
    # TextToCountries: requires a country gazetteer (find_countries pkg in
    # the reference); gated off in round 1 — can_be_used would check >50%
    # country options (TextToCountries.py:37-42).
    FirstWordRegex,
    TextFuzzyFirst,
    TextFuzzyFirstCleanLabels,
    TextFuzzyLast,
    TextFuzzyLastCleanLabels,
    TextFuzzyAll100,
    TextFuzzyAll88,
    TextFuzzyAll75,
    # SetFit / Gemini / Ollama slots: external models/services — absent.
]
