"""TF-IDF one-vs-rest classifier — the trainable multi-label slot (M7).

Reference shape: TextTfIdf.py:51-78 (TF-IDF + OneVsRest classifier, score
threshold 0.5 through TextToMultiOptionMethod.one_prediction_to_option_list
:86-94). The reference uses sklearn; this container doesn't ship it, so
both the vectorizer and the per-option logistic regressions are
from-scratch numpy (deterministic: fixed init, fixed epochs).

Spark split: fit on the driver (training sets are small by design),
predict batched through the same pandas kernels as every other method.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

from .base import MethodBase, input_text

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


class _TfIdf:
    """Fit: vocabulary (top max_features by doc freq) + idf. Transform:
    l2-normalized tf-idf rows."""

    def __init__(self, max_features: int = 5000):
        self.max_features = max_features
        self.vocab: dict[str, int] = {}
        self.idf: np.ndarray | None = None

    def fit(self, texts: list[str]) -> "_TfIdf":
        df_counter: Counter[str] = Counter()
        for t in texts:
            df_counter.update(set(_tokenize(t)))
        # deterministic order: by doc-freq desc then token asc
        top = sorted(df_counter.items(), key=lambda kv: (-kv[1], kv[0]))[: self.max_features]
        self.vocab = {tok: i for i, (tok, _) in enumerate(top)}
        n = len(texts)
        self.idf = np.array(
            [math.log((1 + n) / (1 + df_counter[tok])) + 1 for tok in self.vocab], dtype=np.float64
        )
        return self

    def transform(self, texts: list[str]) -> np.ndarray:
        x = np.zeros((len(texts), len(self.vocab)))
        for i, t in enumerate(texts):
            counts = Counter(tok for tok in _tokenize(t) if tok in self.vocab)
            for tok, c in counts.items():
                x[i, self.vocab[tok]] = c
        x *= self.idf
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return x / norms

    def to_dict(self) -> dict:
        return {"vocab": list(self.vocab), "idf": self.idf.tolist() if self.idf is not None else []}

    @staticmethod
    def from_dict(d: dict) -> "_TfIdf":
        v = _TfIdf()
        v.vocab = {tok: i for i, tok in enumerate(d.get("vocab", []))}
        v.idf = np.array(d.get("idf", []), dtype=np.float64)
        return v


def _fit_logreg(x: np.ndarray, y: np.ndarray, epochs: int = 400, lr: float = 1.0, l2: float = 1e-3) -> np.ndarray:
    xb = np.hstack([x, np.ones((len(x), 1))])
    w = np.zeros(xb.shape[1])
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-xb @ w))
        grad = xb.T @ (p - y) / len(y) + l2 * w
        w -= lr * grad
    return w


class TextTfIdf(MethodBase):
    """One-vs-rest TF-IDF classifier over the option space."""

    kind = "multi_option"

    def can_be_used(self, train_pdf, ctx) -> bool:
        # needs some positive examples to learn from
        return bool(ctx.options) and len(train_pdf) >= 4

    def fit(self, train_pdf: pd.DataFrame, ctx):
        texts = [input_text(row) for _, row in train_pdf.iterrows()]
        vec = _TfIdf().fit(texts)
        x = vec.transform(texts)
        weights = {}
        for option in ctx.options:
            y = np.array(
                [
                    1.0 if any(v["id"] == option.id for v in (row.get("values") or [])) else 0.0
                    for _, row in train_pdf.iterrows()
                ]
            )
            if y.sum() == 0 or y.sum() == len(y):
                continue  # degenerate class — skip, never predicted
            weights[option.id] = _fit_logreg(x, y).tolist()
        return {"vectorizer": vec.to_dict(), "weights": weights}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        vec = _TfIdf.from_dict(artifact.get("vectorizer", {}))
        weights = artifact.get("weights", {})
        texts = [input_text(row) for _, row in pdf.iterrows()]
        if not vec.vocab or not weights:
            return pd.Series([[] for _ in texts], index=pdf.index, dtype=object)
        x = vec.transform(texts)
        xb = np.hstack([x, np.ones((len(x), 1))])
        scores = {
            oid: 1.0 / (1.0 + np.exp(-xb @ np.array(w))) for oid, w in weights.items()
        }
        id_to_option = {o.id: o for o in ctx.options}
        out = []
        for i in range(len(texts)):
            row_scores = [(oid, s[i]) for oid, s in scores.items()]
            if ctx.multi_value:
                chosen = [oid for oid, s in row_scores if s > 0.5]
            else:
                # argmax if above 0.5 (one_prediction_to_option_list:90-94)
                best = max(row_scores, key=lambda kv: kv[1], default=None)
                chosen = [best[0]] if best and best[1] > 0.5 else []
            out.append(
                [id_to_option[oid].to_dict() | {"segment_text": ""} for oid in chosen if oid in id_to_option]
            )
        return pd.Series(out, index=pdf.index, dtype=object)
