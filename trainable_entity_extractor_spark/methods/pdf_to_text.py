"""Pdf(segments)→Text method family (SURVEY §2.9 M10 + W7):

- stand-alone: PdfToTextRegexMethod (2-segment sliding concat,
  PdfToTextRegexMethod.py:9-48), First/LastDateMethod
  (FirstDateMethod.py:15-41, LastDateMethod.py:1-9)
- composed: selector x text-method cross product via a dynamic class
  builder (pdf_to_text_method_builder.py:28-59): the fast segment selector
  (optionally Near-1/Near-4 smoothed) picks segments, the text method runs
  over their texts.
"""

from __future__ import annotations

import re

import pandas as pd

from ..functions import rexpy_lite
from .base import MethodBase
from .text_to_text import (
    DateParserMethod,
    DateParserWithBreaksMethod,
    NerFirstAppearanceMethod,
    NerLastAppearanceMethod,
    NoSpacesRegexMethod,
    RegexMethod,
    RegexSubtractionMethod,
    SameInputOutputMethod,
)


def _segments(row) -> list[dict]:
    segs = row.get("segments")
    if segs is None or len(segs) == 0:  # may be a numpy array from Arrow
        return []
    return [dict(s) if not isinstance(s, dict) else s for s in segs]


class PdfToTextRegexMethod(MethodBase):
    kind = "to_text"

    def fit(self, train_pdf, ctx):
        samples = [x for x in train_pdf["label_text"].tolist() if x]
        return {"regex_list": [r[1:-1] for r in rexpy_lite.extract(samples)]}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        regex_list = artifact.get("regex_list", [])
        clean = lambda t: " ".join((t or "").split())
        out = []
        for _, row in pdf.iterrows():
            segs = _segments(row)
            prediction = ""
            for regex in regex_list:
                if prediction or not segs:
                    break
                match = re.search(regex, clean(segs[0].get("text")))
                if match:
                    prediction = str(match.group())
                    break
                for seg, nxt in zip(segs, segs[1:]):
                    text = clean((seg.get("text") or "") + " " + (nxt.get("text") or ""))
                    match = re.search(regex, text)
                    if match:
                        prediction = str(match.group())
                        break
            out.append(prediction)
        return pd.Series(out, index=pdf.index, dtype=object)


class FirstDateMethod(MethodBase):
    kind = "to_text"
    reverse = False

    def fit(self, train_pdf, ctx):
        langs = [x or "" for x in train_pdf.get("language_iso", pd.Series(dtype=object)).tolist()]
        return {"languages": sorted(set(langs))}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        languages = artifact.get("languages", [])
        out = []
        for _, row in pdf.iterrows():
            segs = _segments(row)
            if self.reverse:
                segs = list(reversed(segs))
            prediction = ""
            for seg in segs:
                date = DateParserMethod.get_date([seg.get("text") or ""], languages)
                if date:
                    prediction = date.strftime("%Y-%m-%d")
                    break
            out.append(prediction)
        return pd.Series(out, index=pdf.index, dtype=object)


class LastDateMethod(FirstDateMethod):
    reverse = True


def build_selector_text_method(text_method_cls: type[MethodBase], near: int = 0) -> type[MethodBase]:
    """M10 dynamic composition: FastSegmentSelector (Near-k smoothed)
    selects segments; the text method consumes their joined texts."""
    suffix = {0: "FastSegmentSelector", 1: "Near1FastSegmentSelector", 4: "Near4FastSegmentSelector"}[near]

    class _Composed(MethodBase):
        kind = "to_text"

        def fit(self, train_pdf, ctx):
            from .segment_selector import FastSegmentSelector

            marked = []
            for _, row in train_pdf.iterrows():
                marked.extend(_segments(row))
            selector_artifact = FastSegmentSelector().fit(marked)

            # text method trains on the texts of the labeled segments
            selector = FastSegmentSelector()
            rows = []
            for _, row in train_pdf.iterrows():
                segs = _segments(row)
                selected = [s for s in segs if s.get("ml_label")] or selector.select(
                    segs, selector_artifact, near=near
                )
                rows.append(
                    {
                        "source_text": None,
                        "segments": None,
                        "segment_selector_texts": [s.get("text") or "" for s in selected],
                        "label_text": row.get("label_text"),
                        "language_iso": row.get("language_iso"),
                    }
                )
            train_sel = pd.DataFrame(rows)
            train_sel["source_text"] = [" ".join(r["segment_selector_texts"]) for _, r in train_sel.iterrows()]
            inner = text_method_cls()
            return {"selector": selector_artifact, "inner": inner.fit(train_sel, ctx)}

        def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
            from .segment_selector import FastSegmentSelector

            selector = FastSegmentSelector()
            rows = []
            for _, row in pdf.iterrows():
                selected = selector.select(_segments(row), artifact.get("selector", {}), near=near)
                rows.append({"source_text": " ".join(s.get("text") or "" for s in selected), "segments": None})
            inner = text_method_cls()
            sub = pd.DataFrame(rows, index=pdf.index)
            return inner.predict_pandas(sub, ctx, artifact.get("inner", {}))

    _Composed.__name__ = f"PdfToText{suffix}{text_method_cls.__name__}"
    _Composed.__qualname__ = _Composed.__name__
    return _Composed


def build_full_selector_text_method(text_method_cls: type[MethodBase]) -> type[MethodBase]:
    """M10 composition with the FULL SegmentSelector (95-dim boosted
    trees, PdfToTextExtractor.segment_selector_methods): the model selects
    segments, the text method consumes their joined texts."""

    class _Composed(MethodBase):
        kind = "to_text"

        def fit(self, train_pdf, ctx):
            from .segment_selector_full import FullSegmentSelector

            docs = [_segments(row) for _, row in train_pdf.iterrows()]
            selector = FullSegmentSelector()
            selector_artifact = selector.fit(docs)

            rows = []
            for segs in docs:
                selected = [s for s in segs if s.get("ml_label")] or selector.select(
                    segs, selector_artifact
                )
                rows.append(
                    {
                        "source_text": " ".join(s.get("text") or "" for s in selected),
                        "segments": None,
                        "segment_selector_texts": [s.get("text") or "" for s in selected],
                    }
                )
            train_sel = pd.DataFrame(rows)
            train_sel["label_text"] = train_pdf["label_text"].tolist()
            train_sel["language_iso"] = (
                train_pdf["language_iso"].tolist() if "language_iso" in train_pdf else ""
            )
            inner = text_method_cls()
            return {"selector": selector_artifact, "inner": inner.fit(train_sel, ctx)}

        def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
            from .segment_selector_full import FullSegmentSelector

            selector = FullSegmentSelector()
            rows = []
            for _, row in pdf.iterrows():
                selected = selector.select(_segments(row), artifact.get("selector", {}))
                rows.append(
                    {"source_text": " ".join(s.get("text") or "" for s in selected), "segments": None}
                )
            inner = text_method_cls()
            sub = pd.DataFrame(rows, index=pdf.index)
            return inner.predict_pandas(sub, ctx, artifact.get("inner", {}))

    _Composed.__name__ = f"PdfToTextSegmentSelector{text_method_cls.__name__}"
    _Composed.__qualname__ = _Composed.__name__
    return _Composed


_TEXT_METHODS = [
    # pdf_to_text_method_builder.text_to_text_methods order (minus the
    # GLiNER slot, an external model)
    SameInputOutputMethod,
    RegexMethod,
    NoSpacesRegexMethod,
    RegexSubtractionMethod,
    DateParserWithBreaksMethod,
    DateParserMethod,
    NerFirstAppearanceMethod,
    NerLastAppearanceMethod,
]

PDF_TO_TEXT_METHODS: list[type[MethodBase]] = (
    [PdfToTextRegexMethod, FirstDateMethod, LastDateMethod]
    + [build_selector_text_method(m, near=0) for m in _TEXT_METHODS]
    + [build_selector_text_method(m, near=1) for m in _TEXT_METHODS]
    + [build_selector_text_method(m, near=4) for m in _TEXT_METHODS]
    + [build_full_selector_text_method(m) for m in _TEXT_METHODS]
)
