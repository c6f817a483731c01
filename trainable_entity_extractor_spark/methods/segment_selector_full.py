"""Full SegmentSelector (M6 flagship): 95-dim layout features + boosted
trees, the reference's headline selector with published P/R numbers.

Reference: segment_selector/SegmentSelector.py (LightGBM booster),
feature assembly methods/lightgbm_frequent_words/
SegmentLightgbmFrequentWords.py:121-259 (29 own features + 22
previous-segment + 22 next-segment + 21 last-title + top-3
frequent-word flags), per-document Modes (methods/Modes.py), trainer
LightgbmFrequentWords.py:30-128 (binary objective, frequent words =
top-3 stopword-filtered tokens of labeled segments).

Spark realization: features are assembled per document in ONE numpy pass
(no per-segment Python loops over neighbors — prev/next/title features
are roll/scan operations over the (page, top)-sorted feature matrix).
Fit happens on the driver over the labeled training docs (≤ hundreds of
documents by reference design); predict runs inside the same
Arrow-batched kernels as every other method, with the fitted trees
shipped via the artifact dict.

Deviations from the reference, by container necessity (documented):
- no lightgbm wheel → functions/gbm.py Newton-boosted trees (same split
  math) unless lightgbm becomes importable;
- our segment rows carry no font data (fonts live at the poppler token
  level and are consumed by F2/F3 before segment assembly), so the six
  font-derived slots (font size avg/ratio, family mode, line height,
  bold, italics) are constant zeros — boosted trees ignore constant
  features, and every layout/text slot is live;
- page dims are not in the row schema → normalized against per-document
  max extents (right-most/bottom-most token), a scale-equivalent proxy.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

TEXT_TYPES = {"TEXT", "LIST_ITEM", "TITLE", "SECTION_HEADER", "CAPTION"}

# deterministic segment-type index (TokenType.get_index analog)
_TYPE_INDEX = {
    t: i
    for i, t in enumerate(
        [
            "FORMULA",
            "FOOTNOTE",
            "LIST_ITEM",
            "TABLE",
            "FIGURE",
            "TITLE",
            "TEXT",
            "HEADER",
            "SECTION_HEADER",
            "CAPTION",
            "PAGE_FOOTER",
            "PAGE_HEADER",
            "PICTURE",
        ]
    )
}

# static stopword set (LightgbmFrequentWords uses nltk stopwords; a
# pinned list keeps the artifact deterministic across environments)
_STOPWORDS = frozenset(
    """a about above after again all am an and any are as at be because been
before being below between both but by could did do does doing down during
each few for from further had has have having he her here hers him his how i
if in into is it its just me more most my no nor not of off on once only or
other our ours out over own same she should so some such than that the their
them then there these they this those through to too under until up very was
we were what when where which while who whom why will with you your yours de
la el en los del las un una y o que""".split()
)

N_BASE, N_OTHER, N_TITLE, N_FREQ = 29, 22, 21, 3


def _base_features(segments: list[dict]) -> np.ndarray:
    """Per-segment intrinsic features, one numpy row per segment, in the
    column layout of SegmentLightgbmFrequentWords.set_features."""
    n = len(segments)
    out = np.zeros((n, 20))
    for i, s in enumerate(segments):
        text = " ".join((s.get("text") or "").split())
        tlen = len(text)
        left = float(s.get("left") or 0.0)
        top = float(s.get("top") or 0.0)
        width = float(s.get("width") or 0.0)
        height = float(s.get("height") or 0.0)
        first = text[0] if text else ""
        first_chunk = text.split(" ")[0].split(".")[0] if text else ""
        romans = "".join(c for c in first_chunk if c in "IVXLCDM")
        digits = sum(1 for c in text if c.isdigit())
        out[i] = [
            tlen,  # 0 text_len
            top,  # 1 top (normalized later)
            left,  # 2 left
            width,  # 3 width
            height,  # 4 height
            digits / tlen if tlen else 0.0,  # 5 numbers_percentage
            1.0 if first.isupper() else 0.0,  # 6 starts_upper
            1.0 if first.isdigit() else 0.0,  # 7 starts_number
            1.0 if re.match(r"^[0-9]/", text) else 0.0,  # 8 starts_number_bar
            float(digits),  # 9 numbers_quantity
            1.0 if first == "[" else 0.0,  # 10 starts_square_brackets
            1.0 if re.match(r"^[a-zA-Z]\.", text) else 0.0,  # 11 starts_letter_dot
            text.count(".") / tlen if tlen else 0.0,  # 12 dots_percentage
            1.0 if text and text.upper() == text else 0.0,  # 13 uppercase
            1.0 if romans and romans == first_chunk else 0.0,  # 14 roman
            float(s.get("page") or 1) - 1,  # 15 page_index
            float(s.get("seg_idx") if s.get("seg_idx") is not None else i),  # 16 seg index
            _TYPE_INDEX.get((s.get("seg_type") or "TEXT"), len(_TYPE_INDEX)),  # 17 type
            top + height,  # 18 bottom
            left + width,  # 19 right
        ]
    return out


def _other_block(b: np.ndarray, n_segs: float, n_pages: float, pw: float, ph: float) -> np.ndarray:
    """22 'other segment' features (get_other_segment_features), from a
    base-feature matrix — vectorized over all segments at once."""
    zeros = np.zeros(len(b))
    return np.column_stack(
        [
            b[:, 16],  # segment_index
            n_segs - b[:, 16],  # n_segments - index
            b[:, 15],  # page_index
            n_pages - b[:, 15],  # n_pages - page_index
            zeros,  # bold (no font data)
            zeros,  # italics
            b[:, 0],  # text_len
            b[:, 1] / ph,  # top
            b[:, 18] / ph,  # bottom
            b[:, 4] / ph,  # height
            b[:, 3] / pw,  # width
            zeros,  # font_size ratio
            zeros,  # line_height
            b[:, 5],  # numbers_percentage
            b[:, 6],  # starts_upper
            b[:, 7],  # starts_number
            b[:, 8],  # starts_number_bar
            b[:, 9],  # numbers_quantity
            b[:, 10],  # starts_square_brackets
            b[:, 11],  # starts_letter_dot
            b[:, 12],  # dots_percentage
            b[:, 13],  # uppercase
        ]
    )


def doc_features(
    segments: list[dict],
    frequent_words: list[str],
    weight_by_len: bool = False,
    next_title: bool = False,
    titles_history: int = 1,
) -> np.ndarray:
    """Feature matrix for one document. Default layout = 97-dim
    (29 base + 22 prev + 22 next + 21 last-title + 3 frequent-word flags,
    SegmentLightgbmFrequentWords.get_features_array). Variant knobs:
    - weight_by_len: word flags become 1/n_words (SegmentCommonWordsWeights
      .set_most_frequent_words:265-269)
    - next_title: append the NEXT title's 21-block too
      (SegmentNextPreviousTitle.get_features_array:36-40)
    - titles_history: number of preceding-title blocks
      (SegmentTitlesHistory.get_features_array: last 3 titles)
    """
    n_freq = max(len(frequent_words or []), 3)
    n = len(segments)
    width = (
        N_BASE + 2 * N_OTHER + N_TITLE * (titles_history + (1 if next_title else 0)) + n_freq
    )
    if n == 0:
        return np.zeros((0, width))
    b = _base_features(segments)
    pw = max(float(b[:, 19].max()), 1.0)  # page-width proxy: max right
    ph = max(float(b[:, 18].max()), 1.0)  # page-height proxy: max bottom
    n_pages = float(b[:, 15].max()) + 1.0
    n_segs = float(n)

    # Modes (per-doc layout modes; Modes.set_modes over tokens — here
    # over segments, the granularity our schema retains)
    def _mode(vals: np.ndarray) -> float:
        if len(vals) == 0:
            return 0.0
        v, c = np.unique(np.round(vals, 1), return_counts=True)
        return float(v[np.argmax(c)])

    lines_space_mode = _mode(b[:, 18])
    left_space_mode = _mode(b[:, 2])

    base = np.column_stack(
        [
            b[:, 16],  # segment_index
            b[:, 15],  # page_index
            np.zeros(n),  # font_size_average (no font data)
            np.full(n, lines_space_mode),
            np.zeros(n),  # font_family_mode_normalized
            np.full(n, pw / 5000.0),
            np.full(n, ph / 5000.0),
            np.full(n, left_space_mode / pw),
            np.zeros(n),  # bold
            np.zeros(n),  # italics
            b[:, 0],  # text_len
            b[:, 1] / ph,  # top
            b[:, 18] / ph,  # bottom
            b[:, 4] / ph,  # height
            b[:, 3] / pw,  # width
            np.zeros(n),  # font_size / mode
            np.zeros(n),  # line_height
            b[:, 5],
            b[:, 6],
            b[:, 7],
            b[:, 8],
            b[:, 9],
            b[:, 10],
            b[:, 11],
            b[:, 12],
            b[:, 13],
            n_segs - b[:, 16],
            n_pages - b[:, 15],
            b[:, 17],  # segment type index
        ]
    )

    # prev/next/title run over reading order (page, top) —
    # from_pdf_data sorts by (page_index, top) before neighbor wiring
    order = np.lexsort((b[:, 1], b[:, 15]))
    other = _other_block(b, n_segs, n_pages, pw, ph)
    other_sorted = other[order]
    zeros_other = np.zeros((1, N_OTHER))
    prev_sorted = np.vstack([zeros_other, other_sorted[:-1]])
    next_sorted = np.vstack([other_sorted[1:], zeros_other])

    # preceding TITLE blocks (21 features each: other block minus the
    # n_segments-index slot, per get_last_title_features); titles_history
    # keeps the last `titles_history` titles (SegmentTitlesHistory)
    title_cols = [0, 2, 3] + list(range(4, N_OTHER))  # drop col 1
    is_title = (b[order, 17] == _TYPE_INDEX["TITLE"]).astype(bool)
    title_blocks_sorted = np.zeros((n, N_TITLE * titles_history))
    recent: list[int] = []  # most-recent-first positions of titles seen
    for pos in range(n):
        for d, tpos in enumerate(recent[:titles_history]):
            title_blocks_sorted[pos, d * N_TITLE : (d + 1) * N_TITLE] = other_sorted[tpos][
                title_cols
            ]
        if is_title[pos]:
            recent.insert(0, pos)

    blocks = [title_blocks_sorted]
    if next_title:
        next_title_sorted = np.zeros((n, N_TITLE))
        nxt = None
        for pos in range(n - 1, -1, -1):
            if nxt is not None:
                next_title_sorted[pos] = other_sorted[nxt][title_cols]
            if is_title[pos]:
                nxt = pos
        blocks.append(next_title_sorted)

    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    prev_f, next_f = prev_sorted[inv], next_sorted[inv]
    title_f = np.hstack(blocks)[inv]

    freq = np.zeros((n, n_freq))
    for k, w in enumerate((frequent_words or [])[:n_freq]):
        if not w:
            continue
        wl = w.lower()
        for i, s in enumerate(segments):
            text = (s.get("text") or "").lower()
            if wl in text:
                freq[i, k] = 1.0 / max(len(text.split(" ")), 1) if weight_by_len else 1.0

    return np.hstack([base, prev_f, next_f, title_f, freq])


def learn_frequent_words(docs: list[list[dict]], k: int = 3, avoiding: bool = False) -> list[str]:
    """Top-k stopword-filtered words of labeled segments
    (LightgbmFrequentWords.save_most_frequent_words:100-112). With
    avoiding=True, extends with the top-4 words of labeled segments'
    NEIGHBORS that never appear in labeled text
    (AvoidingWords.save_most_frequent_words:100-124)."""
    count: Counter[str] = Counter()
    for segments in docs:
        for s in segments:
            if s.get("ml_label"):
                for w in re.findall(r"\w+", (s.get("text") or "").lower()):
                    if w not in _STOPWORDS and w not in ".,":
                        count[w] += 1
    words = [w for w, _ in count.most_common(k)]
    if avoiding:
        avoid: Counter[str] = Counter()
        for segments in docs:
            for i, s in enumerate(segments):
                if not s.get("ml_label"):
                    continue
                neighbor_text = " ".join(
                    (segments[j].get("text") or "")
                    for j in (i - 1, i + 1)
                    if 0 <= j < len(segments)
                )
                for w in re.findall(r"\w+", neighbor_text.lower()):
                    if w not in _STOPWORDS and w not in ".," and w not in count:
                        avoid[w] += 1
        words.extend(w for w, _ in avoid.most_common(4))
    return words


class FullSegmentSelector:
    """fit over per-document segment lists → artifact; select → labeled
    subset. Backend: lightgbm when importable, else functions/gbm.py.

    Subclass knobs reproduce the reference's segment_selector/methods/*
    feature-set variants (each a ~266-LoC near-clone there; here one
    parameterization):
      n_freq / weight_by_len / avoiding / next_title / titles_hist /
      best_k (feature-subset refit, BestFeatures.create_model:66-67).
    """

    n_freq = 3
    weight_by_len = False
    avoiding = False
    next_title = False
    titles_hist = 1
    best_k: int | None = None  # int = top-k refit; -1 = importance>0 refit

    def _features(self, segments: list[dict], frequent: list[str]) -> np.ndarray:
        return doc_features(
            segments,
            frequent,
            weight_by_len=self.weight_by_len,
            next_title=self.next_title,
            titles_history=self.titles_hist,
        )

    def _fit_matrix(self, x: np.ndarray, y: np.ndarray, artifact: dict) -> None:
        try:  # pragma: no cover - lightgbm absent in this container
            import lightgbm as lgb

            params = {
                "objective": "binary",
                "learning_rate": 0.05,
                "num_leaves": 70,
                "verbosity": -1,
                "min_data_in_leaf": 1,
            }
            model = lgb.train(params, lgb.Dataset(x, y), 300)
            artifact["backend"] = "lightgbm"
            artifact["model"] = model.model_to_string()
        except ImportError:
            from ..functions.gbm import fit_gbm

            artifact["backend"] = "gbm"
            artifact["model"] = fit_gbm(x, y, n_rounds=150, lr=0.1, max_depth=4)

    def fit(self, docs: list[list[dict]]) -> dict:
        frequent = learn_frequent_words(docs, k=self.n_freq, avoiding=self.avoiding)
        mats = [self._features(segs, frequent) for segs in docs if segs]
        if not mats:
            return {"frequent_words": frequent, "backend": "none"}
        x = np.vstack(mats)
        y = np.concatenate(
            [[1.0 if s.get("ml_label") else 0.0 for s in segs] for segs in docs if segs]
        )
        artifact: dict = {"frequent_words": frequent}
        if y.sum() == 0:
            artifact["backend"] = "none"
            return artifact
        self._fit_matrix(x, y, artifact)
        if self.best_k is not None and artifact["backend"] == "gbm":
            # BestFeatures pattern: keep informative features, refit
            from ..functions.gbm import feature_importance

            imp = feature_importance(artifact["model"], x.shape[1])
            if self.best_k == -1:
                keep = [i for i, v in enumerate(imp) if v > 0]
            else:
                keep = list(np.argsort(-np.asarray(imp), kind="stable")[: self.best_k])
                keep = [int(i) for i in sorted(keep)]
            if keep:
                artifact["feature_subset"] = keep
                self._fit_matrix(x[:, keep], y, artifact)
        return artifact

    def scores(self, segments: list[dict], artifact: dict) -> np.ndarray:
        if not segments:
            return np.zeros(0)
        x = self._features(segments, artifact.get("frequent_words") or [])
        subset = artifact.get("feature_subset")
        if subset:
            x = x[:, subset]
        backend = artifact.get("backend")
        if backend == "lightgbm":  # pragma: no cover
            import lightgbm as lgb

            booster = lgb.Booster(model_str=artifact["model"])
            return np.asarray(booster.predict(x[:, : booster.num_feature()]))
        if backend == "gbm":
            from ..functions.gbm import predict_gbm

            return predict_gbm(artifact["model"], x)
        return np.zeros(len(segments))

    def select(self, segments: list[dict], artifact: dict) -> list[dict]:
        s = self.scores(segments, artifact)
        return [seg for seg, sc in zip(segments, s) if sc > 0.5]


# ------------------------------------------------------------------
# reference feature-set variants (segment_selector/methods/*)
# ------------------------------------------------------------------


class SegmentSelectorFrequent6Words(FullSegmentSelector):
    """frequent_6_words: top-6 frequent-word flags."""

    n_freq = 6


class SegmentSelectorCommonWordsWeights(FullSegmentSelector):
    """common_words_weights: flags weighted 1/n_words of the segment."""

    weight_by_len = True


class SegmentSelectorAvoidingWords(FullSegmentSelector):
    """avoiding_words: +4 neighbor-only word flags."""

    avoiding = True


class SegmentSelectorNextPreviousTitle(FullSegmentSelector):
    """next_previous_title: previous AND next title blocks."""

    next_title = True


class SegmentSelectorTitlesHistory(FullSegmentSelector):
    """titles_history: last three preceding title blocks."""

    titles_hist = 3


class SegmentSelectorBestFeatures(FullSegmentSelector):
    """best_features: refit on features with positive split importance."""

    best_k = -1


class SegmentSelectorBestFeatures10(FullSegmentSelector):
    best_k = 10


class SegmentSelectorBestFeatures50(FullSegmentSelector):
    best_k = 50


SELECTOR_VARIANTS: dict[str, type[FullSegmentSelector]] = {
    "lightgbm_frequent_words": FullSegmentSelector,
    "frequent_6_words": SegmentSelectorFrequent6Words,
    "common_words_weights": SegmentSelectorCommonWordsWeights,
    "avoiding_words": SegmentSelectorAvoidingWords,
    "next_previous_title": SegmentSelectorNextPreviousTitle,
    "titles_history": SegmentSelectorTitlesHistory,
    "best_features": SegmentSelectorBestFeatures,
    "best_features_10": SegmentSelectorBestFeatures10,
    "best_features_50": SegmentSelectorBestFeatures50,
}
