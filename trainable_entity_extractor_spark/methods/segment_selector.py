"""Fast segment selector (M6 family, SURVEY §2.9).

Reference: segment_selector/FastSegmentSelector.py — features are
previous/next-word binary flags (top-2 predictive words around the first
labeled segment, stopword-filtered by the 30 most common words) plus the
comma percentage; a 50-round LightGBM binary model selects segments with
score > 0.5. Near1/Near4 smoothing (W4) keeps neighbors of selected
segments.

This container has no lightgbm, so the model slot is backend-pluggable:
lgb when importable, otherwise a from-scratch numpy logistic regression
(identical feature contract and 0.5 decision threshold; with <=5 binary-ish
features the decision boundaries coincide on the reference's use cases).

Spark realization: fit on the driver over the (small, <=200-sample)
training set — the reference itself gates at 200 samples
(FastSegmentSelectorFuzzy95.py:52-53) — then predict inside the same
Arrow-batched kernels as every other method.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

TEXT_TYPES = {"TEXT", "LIST_ITEM", "TITLE", "SECTION_HEADER", "CAPTION"}


def clean_words(text: str) -> list[str]:
    """FastSegmentSelector.clean_texts: keep alnum+space, lower, split."""
    return "".join(c for c in (text or "").lower() if c.isalnum() or c == " ").split()


def most_common_words(segments: list[dict], k: int = 30) -> list[str]:
    counter: Counter[str] = Counter()
    for seg in segments:
        counter.update((seg.get("text") or "").lower().split())
    return [w for w, _ in counter.most_common(k)]


def predictive_words(text_segments: list[dict]) -> tuple[list[str], list[str]]:
    """save_predictive_common_words:84-100 — neighbors of the FIRST labeled
    text segment only (the reference breaks after one), stopword-filtered,
    top-2 each side."""
    common = most_common_words(text_segments)
    counter_prev: Counter[str] = Counter()
    counter_next: Counter[str] = Counter()
    for prev_seg, seg, next_seg in zip(text_segments, text_segments[1:], text_segments[2:]):
        if not seg.get("ml_label"):
            continue
        counter_prev.update(w for w in clean_words(prev_seg.get("text") or "") if w not in common)
        counter_next.update(w for w in clean_words(next_seg.get("text") or "") if w not in common)
        break
    return (
        [w for w, _ in counter_prev.most_common(2)],
        [w for w, _ in counter_next.most_common(2)],
    )


def segment_features(
    segments: list[dict], previous_words: list[str], next_words: list[str],
    positions: bool = False,
) -> np.ndarray:
    """get_features:44-68 per segment: prev/next word flags + comma pct.
    Neighbor lookup runs over the text-type subsequence when the segment is
    text-typed, else over the raw sequence (reference behavior).
    positions=True appends the 7 geometry features of
    FastAndPositionsSegmentSelector.get_features:7-38 (page, top, left,
    width, height, right, bottom)."""
    text_segments = [s for s in segments if (s.get("seg_type") or "TEXT") in TEXT_TYPES]
    text_ids = {id(s): i for i, s in enumerate(text_segments)}
    rows = []
    for i, seg in enumerate(segments):
        if id(seg) in text_ids:
            idx = text_ids[id(seg)]
            prev_words_list = clean_words(text_segments[idx - 1].get("text") or "") if idx > 0 else []
            next_words_list = (
                clean_words(text_segments[idx + 1].get("text") or "")
                if idx + 1 < len(text_segments)
                else []
            )
        else:
            prev_words_list = clean_words(segments[i - 1].get("text") or "") if i > 0 else []
            next_words_list = clean_words(segments[i + 1].get("text") or "") if i + 1 < len(segments) else []
        feats = [1.0 if w in prev_words_list else 0.0 for w in previous_words]
        feats += [1.0 if w in next_words_list else 0.0 for w in next_words]
        text = seg.get("text") or ""
        feats.append(text.count(",") / len(text) if text else 0.0)
        if positions:
            left = float(seg.get("left") or 0.0)
            top = float(seg.get("top") or 0.0)
            width = float(seg.get("width") or 0.0)
            height = float(seg.get("height") or 0.0)
            feats += [
                float(seg.get("page") or 1),
                top,
                left,
                width,
                height,
                left + width,
                top + height,
            ]
        rows.append(feats)
    n_feats = len(previous_words) + len(next_words) + 1 + (7 if positions else 0)
    return np.array(rows, dtype=np.float64) if rows else np.zeros((0, n_feats))


def _fit_logreg(x: np.ndarray, y: np.ndarray, epochs: int = 300, lr: float = 0.5) -> np.ndarray:
    """Tiny deterministic logistic regression (bias in last slot)."""
    xb = np.hstack([x, np.ones((len(x), 1))])
    w = np.zeros(xb.shape[1])
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-xb @ w))
        w -= lr * (xb.T @ (p - y)) / len(y)
    return w


class FastSegmentSelector:
    """fit → artifact dict; select → labeled subset. Backend: lightgbm if
    present, else the numpy logistic regression."""

    positions = False  # FastAndPositionsSegmentSelector flips this

    def fit(self, segments: list[dict]) -> dict:
        text_segments = [s for s in segments if (s.get("seg_type") or "TEXT") in TEXT_TYPES]
        prev_w, next_w = predictive_words(text_segments)
        x = segment_features(segments, prev_w, next_w, positions=self.positions)
        y = np.array([1.0 if s.get("ml_label") else 0.0 for s in segments])
        artifact = {"previous_words": prev_w, "next_words": next_w, "backend": "logreg"}
        if len(x) == 0 or x.shape[1] == 0 or y.sum() == 0:
            artifact["weights"] = []
            return artifact
        try:
            import lightgbm as lgb  # pragma: no cover - absent in this env

            train_data = lgb.Dataset(x, y)
            params = {"min_data_in_leaf": 1, "min_data_in_bin": 1, "min_child_samples": 1, "verbosity": -1}
            model = lgb.train(params, train_data, 50)
            artifact["backend"] = "lightgbm"
            artifact["model"] = model.model_to_string()
        except ImportError:
            if self.positions:
                # geometry features are unnormalized; boosted trees are
                # scale-invariant like the reference's LightGBM, logreg
                # is not — use the numpy GBM for the positions variant
                from ..functions.gbm import fit_gbm

                artifact["backend"] = "gbm"
                artifact["model"] = fit_gbm(x, y, n_rounds=50, lr=0.1, max_depth=3)
            else:
                artifact["weights"] = _fit_logreg(x, y).tolist()
        return artifact

    def scores(self, segments: list[dict], artifact: dict) -> np.ndarray:
        x = segment_features(
            segments,
            artifact.get("previous_words", []),
            artifact.get("next_words", []),
            positions=self.positions,
        )
        if len(x) == 0:
            return np.zeros(0)
        if artifact.get("backend") == "lightgbm" and artifact.get("model"):
            import lightgbm as lgb  # pragma: no cover

            booster = lgb.Booster(model_str=artifact["model"])
            return np.asarray(booster.predict(x))
        if artifact.get("backend") == "gbm" and artifact.get("model"):
            from ..functions.gbm import predict_gbm

            return predict_gbm(artifact["model"], x)
        w = np.array(artifact.get("weights") or [])
        if w.size != x.shape[1] + 1:
            return np.zeros(len(x))
        xb = np.hstack([x, np.ones((len(x), 1))])
        return 1.0 / (1.0 + np.exp(-xb @ w))

    def select(self, segments: list[dict], artifact: dict, near: int = 0) -> list[dict]:
        """Segments scoring > 0.5; `near` adds W4 neighbor smoothing
        (Near1/Near4FastSegmentSelector): keep a segment if any segment
        within +-near scores > 0.5."""
        s = self.scores(segments, artifact)
        if len(s) == 0:
            return []
        keep = s > 0.5
        if near > 0:
            smoothed = keep.copy()
            for i in range(len(keep)):
                lo, hi = max(0, i - near), min(len(keep), i + near + 1)
                smoothed[i] = keep[lo:hi].any()
            keep = smoothed
        return [seg for seg, k in zip(segments, keep) if k]


class FastAndPositionsSegmentSelector(FastSegmentSelector):
    """FastAndPositionsSegmentSelector.py:7-38: the fast selector's word
    flags + comma pct, plus 7 raw geometry features (page, top, left,
    width, height, right, bottom)."""

    positions = True
