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


def _commas_clean(text: str, sort_words: bool) -> str:
    """FuzzyCommas.clean_text:78-88: lower, alnum+space only, optional
    word sort."""
    text = text.lower()
    text = "".join(c for c in text if c.isalnum() or c == " ")
    words = text.split()
    return " ".join(sorted(words) if sort_words else words)


class FuzzyCommas(_FuzzyBase):
    """J5: comma/colon/' and '-split alias join with learned alias dict
    (FuzzyCommas.py:25-170). threshold 92; length band 0.92-1.2x; alias
    fallback scored with full-ratio; aliases learned from labeled
    (ml_label=1) segments at fit."""

    threshold = 92.0

    import re as _re

    SPLIT_RE = _re.compile(r",|:| and ")

    def _variants(self, ctx):
        options_cleaned = [_commas_clean(o.label, False) for o in ctx.options]
        options_sorted_words = [_commas_clean(o.label, True) for o in ctx.options]
        return options_cleaned, options_sorted_words

    def _appearances_for_segments(self, segments, ctx, aliases):
        """Returns (appearances [(cleaned_label, context)], not_found_texts).
        Reference quirk kept: the duplicate check compares an Appearance
        list against a plain string, which never matches — so repeats are
        emitted (FuzzyCommas.get_appearances_for_segments:48-56)."""
        options_cleaned, options_sorted = self._variants(ctx)
        sorted_by_len = sorted(options_sorted, key=lambda x: -len(x))
        cleaned_by_len = sorted(options_cleaned, key=lambda x: -len(x))
        appearances = []
        not_found = []
        for seg in segments:
            text = seg.get("text") or ""
            pieces = [p for raw in self.SPLIT_RE.split(text) if (p := _commas_clean(raw, False))]
            for piece in pieces:
                found = self._match_one(piece, sorted_by_len, cleaned_by_len, options_cleaned, options_sorted, aliases)
                if found:
                    appearances.append((found, text))
                else:
                    not_found.append(piece)
        return appearances, not_found

    def _match_one(self, text, sorted_by_len, cleaned_by_len, options_cleaned, options_sorted, aliases):
        from ..functions.fuzzy import indel_ratio, partial_ratio

        cleaned_sorted_text = _commas_clean(text, True)
        for option in sorted_by_len:
            if len(text) < len(option) * 0.92 or len(text) > len(option) * 1.2:
                continue
            if partial_ratio(option, cleaned_sorted_text, self.threshold) >= self.threshold:
                return options_cleaned[options_sorted.index(option)]
        for option in cleaned_by_len:
            for alias in aliases.get(option, []):
                if indel_ratio(alias, text) > self.threshold:
                    return option
        return ""

    def fit(self, train_pdf, ctx):
        from ..functions.fuzzy import partial_ratio

        options_cleaned, _ = self._variants(ctx)
        aliases: dict[str, list[str]] = {o: [] for o in options_cleaned}
        for _, row in train_pdf.iterrows():
            segments = [s for s in (row.get("segments") or []) if s.get("ml_label")]
            appearances, not_found_texts = self._appearances_for_segments(segments, ctx, {})
            found_labels = {a[0] for a in appearances}
            value_ids = {v["id"] for v in (row.get("values") or [])}
            truth = [
                _commas_clean(o.label, False) for o in ctx.options if o.id in value_ids
            ]
            not_found_options = [o for o in truth if o not in found_labels]
            cleaned_texts = [" ".join(t.lower().strip().split()) for t in not_found_texts]
            sample_aliases: dict[str, str] = {}
            for option in not_found_options:
                for text in cleaned_texts:
                    if partial_ratio(option, text) > 80:
                        sample_aliases[option] = text  # last match wins (find_aliases:150-156)
            for option, alias in sample_aliases.items():
                aliases[option] = list(dict.fromkeys(aliases[option] + [alias]))
        return {"aliases": aliases}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        options_cleaned, _ = self._variants(ctx)
        label_to_option = {}
        for clean, option in zip(options_cleaned, ctx.options):
            label_to_option.setdefault(clean, option)
        aliases = artifact.get("aliases", {}) or {}
        out = []
        for _, row in pdf.iterrows():
            segments = [{"text": t} for t in _segment_texts(row)]
            appearances, _nf = self._appearances_for_segments(segments, ctx, aliases)
            out.append(
                [
                    label_to_option[lab].to_dict() | {"segment_text": context}
                    for lab, context in appearances
                    if lab in label_to_option
                ]
            )
        return pd.Series(out, index=pdf.index, dtype=object)


def fix_two_pages_segments(segments: list[dict]) -> list[dict]:
    """W10 cross-page fix (FastSegmentSelectorFuzzy95.fix_two_pages_segments
    :128-161): a text-type segment not ending in '.' followed by a text
    segment on a later page absorbs that segment's text; the absorbed
    segment is dropped."""
    from .segment_selector import TEXT_TYPES

    text_idx = [i for i, s in enumerate(segments) if (s.get("seg_type") or "TEXT") in TEXT_TYPES]
    pos_in_text = {i: n for n, i in enumerate(text_idx)}
    removed: set[int] = set()
    fixed: list[dict] = []
    for i, seg in enumerate(segments):
        if i in removed:
            continue
        text = seg.get("text") or ""
        if i in pos_in_text and text and not text.endswith("."):
            n = pos_in_text[i]
            if n + 1 < len(text_idx):
                j = text_idx[n + 1]
                if (seg.get("page") or 0) < (segments[j].get("page") or 0):
                    merged = dict(seg)
                    merged["text"] = text + " " + (segments[j].get("text") or "")
                    fixed.append(merged)
                    removed.add(j)
                    continue
        fixed.append(seg)
    return fixed


class FastSegmentSelectorFuzzy95(_FuzzyBase):
    """M6 composition (FastSegmentSelectorFuzzy95.py): mark training
    segments by fuzzy-85 appearance of cleaned options, fit the fast
    segment selector, then run FuzzyAll95 over the selected segments."""

    threshold = 85.0
    inner_threshold = 95.0

    def _cleaned_options(self, ctx):
        return clean_labels_keep_long([py_remove_accents(o.label.lower()) for o in ctx.options])

    def _appearances(self, seg_text: str, options: list[str]) -> list[str]:
        out = []
        for option in options:
            if len(seg_text) < math.ceil(len(option)):
                continue
            if _cached_partial_ratio(option, seg_text.lower()) >= self.threshold:
                out.append(option)
        return list(dict.fromkeys(out))

    def can_be_used(self, train_pdf, ctx) -> bool:
        return len(train_pdf) <= 200

    def fit(self, train_pdf, ctx):
        from .segment_selector import FastSegmentSelector

        cleaned = self._cleaned_options(ctx)
        marked: list[dict] = []
        for _, row in train_pdf.iterrows():
            segs = [dict(s) for s in (row.get("segments") or [])]
            value_ids = {v["id"] for v in (row.get("values") or [])}
            sample_options = [
                c for c, o in zip(cleaned, ctx.options) if o.id in value_ids
            ]
            fixed = fix_two_pages_segments(segs)
            for seg in fixed:
                if len(self._appearances(seg.get("text") or "", sample_options)) >= 1:
                    seg["ml_label"] = 1
            marked.extend(fixed)
        return {"selector": FastSegmentSelector().fit(marked)}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        from .segment_selector import FastSegmentSelector

        selector = FastSegmentSelector()
        sel_artifact = artifact.get("selector", {})
        inner = FuzzyAll95()
        out = []
        for _, row in pdf.iterrows():
            segs = [dict(s) if not isinstance(s, dict) else s for s in (row.get("segments") or [])]
            if not segs and row.get("source_text"):
                segs = [{"text": row["source_text"], "seg_type": "TEXT", "page": 1}]
            selected = selector.select(fix_two_pages_segments(segs), sel_artifact)
            sub = pd.DataFrame([{"segments": selected, "source_text": None}])
            out.append(inner.predict_pandas(sub, ctx, {}).iloc[0])
        return pd.Series(out, index=pdf.index, dtype=object)


class FastSegmentSelectorFuzzyCommas(FastSegmentSelectorFuzzy95):
    """Same selector, FuzzyCommas over the selected segments
    (FastSegmentSelectorFuzzyCommas in the reference)."""

    def fit(self, train_pdf, ctx):
        artifact = super().fit(train_pdf, ctx)
        artifact.update(FuzzyCommas().fit(train_pdf, ctx))
        return artifact

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        from .segment_selector import FastSegmentSelector

        selector = FastSegmentSelector()
        sel_artifact = artifact.get("selector", {})
        inner = FuzzyCommas()
        out = []
        for _, row in pdf.iterrows():
            segs = [dict(s) if not isinstance(s, dict) else s for s in (row.get("segments") or [])]
            selected = selector.select(fix_two_pages_segments(segs), sel_artifact)
            sub = pd.DataFrame([{"segments": selected, "source_text": None}])
            out.append(inner.predict_pandas(sub, ctx, artifact).iloc[0])
        return pd.Series(out, index=pdf.index, dtype=object)


def sentence_segments(segments: list[dict]) -> list[dict]:
    """W9 sentence re-segmentation (SentenceSelectorFuzzyCommas:55-102):
    merge text segments not ending in '.'/':' (joined with ', '), split on
    '.'/':' , then re-merge sentences left dangling on a comma."""
    from .segment_selector import TEXT_TYPES
    import re as _re

    text_segs = [
        s for s in segments
        if (s.get("seg_type") or "TEXT") in TEXT_TYPES and (s.get("text") or "").strip()
    ]
    if not text_segs:
        return []
    merged = [dict(text_segs[0])]
    for seg in text_segs[1:]:
        prev_text = " ".join((merged[-1].get("text") or "").split())
        if prev_text and prev_text[-1] not in (".", ":"):
            merged[-1] = dict(merged[-1])
            merged[-1]["text"] = f"{prev_text}, {' '.join((seg.get('text') or '').split())}"
        else:
            merged.append(dict(seg))

    sentence_list: list[tuple[str, dict]] = []
    for seg in merged:
        seg_text = " ".join((seg.get("text") or "").split())
        for text in _re.split(r"\.|:", seg_text):
            if not text:
                continue
            sentence_list.append((text, seg))
    if not sentence_list:
        return []

    across: list[tuple[str, dict]] = [sentence_list[0]]
    for sent, next_sent in zip(sentence_list, sentence_list[1:]):
        if sent[0][-1] == ",":
            across[-1] = (" ".join([across[-1][0], next_sent[0]]), across[-1][1])
            continue
        across.append(next_sent)

    out = []
    for text, seg in across:
        new_seg = dict(seg)
        new_seg["text"] = text
        out.append(new_seg)
    return out


class _WordsSelector:
    """PreviousWords/NextWordsSegmentSelector: select text segments whose
    previous (next) segment fuzzily contains a learned predictive word
    (partial_ratio >= 90)."""

    def __init__(self, direction: str):
        self.direction = direction  # "prev" | "next"

    def fit(self, marked_segments: list[dict]) -> dict:
        from .segment_selector import TEXT_TYPES, predictive_words

        text_segs = [s for s in marked_segments if (s.get("seg_type") or "TEXT") in TEXT_TYPES]
        prev_w, next_w = predictive_words(text_segs)
        return {"previous_words": prev_w, "next_words": next_w}

    def select(self, segments: list[dict], artifact: dict) -> list[dict]:
        from .segment_selector import TEXT_TYPES, clean_words

        text_segs = [s for s in segments if (s.get("seg_type") or "TEXT") in TEXT_TYPES]
        words = artifact.get("previous_words" if self.direction == "prev" else "next_words", [])
        selected = []
        for i, seg in enumerate(text_segs):
            if self.direction == "prev":
                neighbor = " ".join(clean_words(text_segs[i - 1].get("text") or "")) if i > 0 else ""
            else:
                neighbor = (
                    " ".join(clean_words(text_segs[i + 1].get("text") or ""))
                    if i + 1 < len(text_segs)
                    else ""
                )
            for word in words:
                if _cached_partial_ratio(word, neighbor) >= 90:
                    selected.append(seg)
                    break
        return selected


class PreviousWordsSentenceSelectorFuzzyCommas(FastSegmentSelectorFuzzy95):
    """Sentence re-segmentation + previous-words selector + FuzzyCommas
    (PreviousWordsSentenceSelectorFuzzyCommas.py:18-75)."""

    def fit(self, train_pdf, ctx):
        import pandas as pd_mod

        sent_rows = train_pdf.copy()
        sent_rows["segments"] = [
            sentence_segments([dict(s) for s in (row or [])]) for row in train_pdf["segments"]
        ]
        cleaned = self._cleaned_options(ctx)
        marked: list[dict] = []
        for _, row in sent_rows.iterrows():
            segs = [dict(s) for s in (row.get("segments") or [])]
            value_ids = {v["id"] for v in (row.get("values") or [])}
            sample_options = [c for c, o in zip(cleaned, ctx.options) if o.id in value_ids]
            fixed = fix_two_pages_segments(segs)
            for seg in fixed:
                if len(self._appearances(seg.get("text") or "", sample_options)) >= 1:
                    seg["ml_label"] = 1
            marked.extend(fixed)
        artifact = {"selector": _WordsSelector("prev").fit(marked)}
        artifact.update(FuzzyCommas().fit(sent_rows, ctx))
        return artifact

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        selector = _WordsSelector("prev")
        inner = FuzzyCommas()
        out = []
        for _, row in pdf.iterrows():
            segs = sentence_segments([dict(s) if not isinstance(s, dict) else s for s in (row.get("segments") or [])])
            selected = selector.select(fix_two_pages_segments(segs), artifact.get("selector", {}))
            sub = pd.DataFrame([{"segments": selected, "source_text": None}])
            out.append(inner.predict_pandas(sub, ctx, artifact).iloc[0])
        return pd.Series(out, index=pdf.index, dtype=object)


def token_segments(segments: list[dict]) -> list[dict]:
    """Token-granularity rebuild (NextWordsTokenSelectorFuzzy75
    .get_token_extraction_data:43-62: every raw PdfToken becomes its own
    one-token segment). Our sample rows retain merged segments, not the
    poppler token stream, so the deterministic equivalent is one segment
    per whitespace token of the segmenter's own text (the segmenter
    whitespace-normalizes, so the split is loss-free)."""
    out = []
    for seg in segments:
        for w in (seg.get("text") or "").split():
            t = dict(seg)
            t["text"] = w
            t["ml_label"] = 0
            out.append(t)
    return out


class PreviousWordsTokenSelectorFuzzy75(FastSegmentSelectorFuzzy95):
    """PreviousWordsTokenSelectorFuzzy75.py: rebuild at token granularity,
    mark tokens fuzzily matching the sample's options (threshold 75),
    learn predictive previous-words, select tokens at predict time, then
    FuzzyAll75 over the selected tokens' texts."""

    threshold = 75.0
    direction = "prev"

    def fit(self, train_pdf, ctx):
        cleaned = self._cleaned_options(ctx)
        marked: list[dict] = []
        for _, row in train_pdf.iterrows():
            toks = token_segments([dict(s) for s in (row.get("segments") or [])])
            value_ids = {v["id"] for v in (row.get("values") or [])}
            sample_options = [c for c, o in zip(cleaned, ctx.options) if o.id in value_ids]
            for seg in toks:
                if len(self._appearances(seg.get("text") or "", sample_options)) >= 1:
                    seg["ml_label"] = 1
            marked.extend(toks)
        return {"selector": _WordsSelector(self.direction).fit(marked)}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        selector = _WordsSelector(self.direction)
        inner = FuzzyAll75()
        out = []
        for _, row in pdf.iterrows():
            segs = [dict(s) if not isinstance(s, dict) else dict(s) for s in (row.get("segments") or [])]
            toks = token_segments(segs)
            selected = selector.select(toks, artifact.get("selector", {}))
            sub = pd.DataFrame([{"segments": selected, "source_text": None}])
            out.append(inner.predict_pandas(sub, ctx, {}).iloc[0])
        return pd.Series(out, index=pdf.index, dtype=object)


class NextWordsTokenSelectorFuzzy75(PreviousWordsTokenSelectorFuzzy75):
    direction = "next"


class FuzzySegmentSelector(_FuzzyBase):
    """FuzzySegmentSelector.py:65-84 + 100-137: mark the first segment
    (or segment + next same-type segment) where ≥ceil(0.75·n_values) of
    the sample's cleaned values fuzzily appear; train the FULL
    SegmentSelector (95-dim boosted trees) on those marks; at predict
    time run the model and fuzzy-match cleaned options (threshold 75)
    over the selected segments only."""

    threshold = 75.0

    def _cleaned_options(self, ctx):
        return clean_labels_keep_long([py_remove_accents(o.label.lower()) for o in ctx.options])

    def _appearances(self, seg_text: str, options: list[str]) -> list[str]:
        out = []
        for option in options:
            if len(seg_text) < math.ceil(len(option)):
                continue
            if _cached_partial_ratio(option, seg_text.lower()) >= self.threshold:
                out.append(option)
        return list(dict.fromkeys(out))

    def can_be_used(self, train_pdf, ctx) -> bool:
        return len(train_pdf) <= 200

    def _mark(self, segments: list[dict], cleaned_values: list[str]) -> None:
        """mark_segments_for_segment_selector:113-131: first segment pair
        reaching the appearance threshold gets ml_label=1, then stop."""
        need = math.ceil(len(cleaned_values) * self.threshold / 100.0)
        if not need:
            return
        for i, seg in enumerate(segments):
            count = len(self._appearances(seg.get("text") or "", cleaned_values))
            nxt = next(
                (
                    s
                    for s in segments[i + 1 :]
                    if (s.get("seg_type") or "TEXT") == (seg.get("seg_type") or "TEXT")
                ),
                None,
            )
            nxt_count = (
                len(self._appearances(nxt.get("text") or "", cleaned_values)) if nxt else 0
            )
            if nxt_count and need <= count + nxt_count:
                seg["ml_label"] = 1
                nxt["ml_label"] = 1
                return
            if need <= count:
                seg["ml_label"] = 1
                return

    def fit(self, train_pdf, ctx):
        from .segment_selector_full import FullSegmentSelector

        cleaned = self._cleaned_options(ctx)
        docs: list[list[dict]] = []
        for _, row in train_pdf.iterrows():
            segs = [dict(s) for s in (row.get("segments") or [])]
            value_ids = {v["id"] for v in (row.get("values") or [])}
            sample_values = [c for c, o in zip(cleaned, ctx.options) if o.id in value_ids]
            self._mark(segs, sample_values)
            docs.append(segs)
        return {"selector": FullSegmentSelector().fit(docs)}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        from .segment_selector_full import FullSegmentSelector

        selector = FullSegmentSelector()
        cleaned = self._cleaned_options(ctx)
        label_to_option = {}
        for clean, option in zip(cleaned, ctx.options):
            label_to_option.setdefault(clean, option)
        out = []
        for _, row in pdf.iterrows():
            segs = [dict(s) if not isinstance(s, dict) else dict(s) for s in (row.get("segments") or [])]
            selected = selector.select(segs, artifact.get("selector", {}))
            values = []
            seen: set[str] = set()
            for seg in selected:
                for opt in self._appearances(seg.get("text") or "", cleaned):
                    if opt in seen or opt not in label_to_option:
                        continue
                    seen.add(opt)
                    values.append(
                        label_to_option[opt].to_dict() | {"segment_text": seg.get("text") or ""}
                    )
            out.append(values)
        return pd.Series(out, index=pdf.index, dtype=object)


def build_filter_text_method(
    inner_cls: type[MethodBase],
    filter_name: str,
    budget: int,
    from_end: bool,
    both_ends: bool = False,
) -> type[MethodBase]:
    """PdfMultiOptionMethod.set_methods(filter, text_method) analog
    (PdfToMultiOptionExtractor.py:116-117): a filter-segments budget
    stage feeds a text-level multi-option method. `both_ends=True`
    composes the CleanBeginning600End600-style filter instead (budget is
    then the per-end budget)."""
    from ..operators.filter_segments import (
        filter_segments_both_ends,
        filter_segments_py,
    )

    def _to_text(row) -> str:
        segs = [dict(s) if not isinstance(s, dict) else s for s in (row.get("segments") or [])]
        if both_ends:
            kept = filter_segments_both_ends(
                segs, budget_start=budget, budget_end=budget, clean_alpha=True,
                keep_digits=True, keep_dot=True, placeholder_on_empty=True,
            )
        else:
            kept = filter_segments_py(
                segs, budget, from_end=from_end, clean_alpha=True, keep_digits=True,
                keep_dot=True, placeholder_on_empty=True,
            )
        return " ".join(s.get("text") or "" for s in kept)

    class _Composed(MethodBase):
        kind = "multi_option"

        def can_be_used(self, train_pdf, ctx):
            return inner_cls().can_be_used(train_pdf, ctx)

        def _transform(self, pdf):
            out = pdf.copy()
            out["source_text"] = [_to_text(row) for _, row in pdf.iterrows()]
            out["segments"] = None
            return out

        def fit(self, train_pdf, ctx):
            return inner_cls().fit(self._transform(train_pdf), ctx)

        def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
            return inner_cls().predict_pandas(self._transform(pdf), ctx, artifact)

    _Composed.__name__ = f"{filter_name}{inner_cls.__name__}"
    _Composed.__qualname__ = _Composed.__name__
    return _Composed


def _fasttext_composites() -> list[type[MethodBase]]:
    from .fasttext_like import TextFastTextMethod

    return [
        build_filter_text_method(
            TextFastTextMethod, "CleanBeginningDotDigits500", 500, from_end=False
        ),
        build_filter_text_method(
            TextFastTextMethod, "CleanEndDotDigits1000", 1000, from_end=True
        ),
    ]


def _llm_codegen_composites() -> list[type[MethodBase]]:
    """The reference's PDF Gemini/Ollama seats
    (PdfToMultiOptionExtractor.py:117-123: CleanEndDotDigits1000 /
    CleanBeginningDotDigits1000 / CleanBeginning600End600 each wrapping
    PDFGemini/PDFOllamaMultiLabelMethod, which themselves delegate to the
    text multi-option synthesis loop over the PDF's cleaned text,
    PDFGeminiMultiLabelMethod.py:12-50): the same three filter
    compositions around the codegen seat."""
    from .llm_codegen import LlmCodegenMultiOptionMethod

    return [
        build_filter_text_method(
            LlmCodegenMultiOptionMethod, "CleanEndDotDigits1000", 1000, from_end=True
        ),
        build_filter_text_method(
            LlmCodegenMultiOptionMethod,
            "CleanBeginningDotDigits1000",
            1000,
            from_end=False,
        ),
        build_filter_text_method(
            LlmCodegenMultiOptionMethod,
            "CleanBeginning600End600",
            600,
            from_end=False,
            both_ends=True,
        ),
    ]


PDF_TO_MULTI_OPTION_METHODS: list[type[MethodBase]] = [
    # reference order (PdfToMultiOptionExtractor.py:102-132), external
    # models (SetFit composites) excluded; the FastText composites use the
    # from-scratch numpy classifier (fasttext_like.py) and the
    # Gemini/Ollama composites the codegen seat (llm_codegen.py)
    FuzzyFirst,
    FuzzyLast,
    FuzzyFirstCleanLabel,
    FuzzyLastCleanLabel,
    FuzzyAll100,
    FuzzyAll88,
    FuzzyAll75,
    PreviousWordsTokenSelectorFuzzy75,
    NextWordsTokenSelectorFuzzy75,
    PreviousWordsSentenceSelectorFuzzyCommas,
    FastSegmentSelectorFuzzy95,
    FastSegmentSelectorFuzzyCommas,
    FuzzySegmentSelector,
    *_fasttext_composites(),
    *_llm_codegen_composites(),
]
