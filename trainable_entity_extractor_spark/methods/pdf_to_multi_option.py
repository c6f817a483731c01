"""Pdf(segments)→MultiOption method family (SURVEY.md §2.3 J1/J2).

Reference sources: FuzzyAll100.py:20-57 (+95/88/75 threshold subclasses),
FuzzyFirst.py:19-52, FuzzyLast.py, FuzzyFirstCleanLabel.py:22-80,
FuzzyLastCleanLabel.py. Order matches PdfToMultiOptionExtractor.METHODS
(PdfToMultiOptionExtractor.py:102-132) for the deterministic subset.
"""

from __future__ import annotations

import math

import pandas as pd

from ..functions.fuzzy import (
    _cached_partial_ratio,
    fuzzy_first_last_appearance,
    pdf_fuzzy_all_appearances,
)
from ..functions.text import clean_labels_keep_long, py_remove_accents
from .base import MethodBase


def _segment_texts(row: dict) -> list[str]:
    segments = row.get("segments")
    if segments is not None and len(segments) > 0:
        return [s["text"] or "" for s in segments]
    source = row.get("source_text")
    return [source] if source else []


class _FuzzyBase(MethodBase):
    kind = "multi_option"

    def _lower_to_option(self, ctx):
        # reference maps back via options_labels.index(option_label)
        # (Appearance.to_value) — first match wins on duplicate labels.
        mapping = {}
        for o in ctx.options:
            mapping.setdefault(o.label.lower(), o)
        return mapping


class FuzzyAll100(_FuzzyBase):
    threshold = 100.0

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        labels_sorted = sorted((o.label.lower() for o in ctx.options), key=len, reverse=True)
        lower_to_option = self._lower_to_option(ctx)
        out = []
        for _, row in pdf.iterrows():
            appearances = pdf_fuzzy_all_appearances(_segment_texts(row), labels_sorted, self.threshold)
            out.append(
                [
                    lower_to_option[lab].to_dict() | {"segment_text": context}
                    for lab, context in appearances
                    if lab in lower_to_option
                ]
            )
        return pd.Series(out, index=pdf.index, dtype=object)


class FuzzyAll95(FuzzyAll100):
    threshold = 95.0


class FuzzyAll88(FuzzyAll100):
    threshold = 88.0


class FuzzyAll75(FuzzyAll100):
    threshold = 75.0


class FuzzyFirst(_FuzzyBase):
    reverse = False

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        labels_sorted = sorted((o.label.lower() for o in ctx.options), key=len, reverse=True)
        lower_to_option = self._lower_to_option(ctx)
        out = []
        for _, row in pdf.iterrows():
            hit = fuzzy_first_last_appearance(_segment_texts(row), labels_sorted, self.reverse)
            if hit is None or hit[0] not in lower_to_option:
                out.append([])
            else:
                out.append([lower_to_option[hit[0]].to_dict() | {"segment_text": hit[1]}])
        return pd.Series(out, index=pdf.index, dtype=object)


class FuzzyLast(FuzzyFirst):
    reverse = True


class _FuzzyCleanLabelBase(_FuzzyBase):
    """Thresholds 100..96; accent-stripped text; cleaned option labels with
    the keep->3-chars rule (FuzzyFirstCleanLabel.py:24-80)."""

    reverse = False

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        clean_options = clean_labels_keep_long([py_remove_accents(o.label.lower()) for o in ctx.options])
        clean_sorted = sorted(clean_options, key=len, reverse=True)
        # Appearance.to_value maps via clean_options.index(label)
        label_to_option = {}
        for clean, option in zip(clean_options, ctx.options):
            label_to_option.setdefault(clean, option)
        out = []
        for _, row in pdf.iterrows():
            texts = _segment_texts(row)
            seq = reversed(texts) if self.reverse else iter(texts)
            found = None
            for seg_text in seq:
                if seg_text is None:
                    continue
                for threshold in range(100, 95, -1):
                    for option in clean_sorted:
                        if len(seg_text) < math.ceil(len(option) * threshold / 100.0):
                            continue
                        text = py_remove_accents(seg_text.lower())
                        if threshold >= 100:
                            hit = option in text
                        else:
                            hit = _cached_partial_ratio(option, text) >= threshold
                        if hit:
                            found = (option, seg_text)
                            break
                    if found:
                        break
                if found:
                    break
            if found is None or found[0] not in label_to_option:
                out.append([])
            else:
                out.append([label_to_option[found[0]].to_dict() | {"segment_text": found[1]}])
        return pd.Series(out, index=pdf.index, dtype=object)


class FuzzyFirstCleanLabel(_FuzzyCleanLabelBase):
    reverse = False


class FuzzyLastCleanLabel(_FuzzyCleanLabelBase):
    reverse = True


PDF_TO_MULTI_OPTION_METHODS: list[type[MethodBase]] = [
    FuzzyFirst,
    FuzzyLast,
    FuzzyFirstCleanLabel,
    FuzzyLastCleanLabel,
    FuzzyAll100,
    FuzzyAll88,
    FuzzyAll75,
    # Token/segment-selector composites (FastSegmentSelectorFuzzy95,
    # FuzzyCommas, LightGBM selectors…) land in later rounds (SURVEY §7.2
    # steps 4-5); SetFit/Ollama/Gemini composites are external — absent.
]
