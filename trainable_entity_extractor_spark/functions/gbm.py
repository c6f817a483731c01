"""From-scratch gradient-boosted decision trees (binary logistic).

Stand-in for LightGBM in the full SegmentSelector
(reference: segment_selector/methods/lightgbm_frequent_words/
LightgbmFrequentWords.py:47-64 — binary objective, lr .05, num_leaves 70,
3000 rounds). This container ships no lightgbm, so the selector's model
slot is backed by this deterministic numpy implementation: second-order
(Newton) boosting with exact greedy splits, the same math LightGBM runs
per leaf (gain = GL²/(HL+λ) + GR²/(HR+λ) − G²/(H+λ), leaf = −G/(H+λ)).

Driver-side only: the reference itself fits on ≤ a few hundred labeled
documents (a few thousand segments × ~100 features), which is
milliseconds-to-seconds territory for exact greedy trees. Executors only
ever see the fitted trees (JSON-serializable) inside Arrow-batched
predict kernels.

Determinism: stable sorts, first-best tie-breaking on feature order —
identical artifacts at any parallelism, as required by the byte-stable
pipeline invariant.
"""

from __future__ import annotations

import numpy as np


def _build_tree(
    X: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    depth: int,
    max_depth: int,
    min_child: int,
    lam: float,
) -> dict:
    G, H = float(g.sum()), float(h.sum())
    leaf = {"leaf": -G / (H + lam)}
    if depth >= max_depth or len(g) < 2 * min_child:
        return leaf

    base = G * G / (H + lam)
    best_gain, best_feat, best_thr = 1e-7, -1, 0.0
    for j in range(X.shape[1]):
        xj = X[:, j]
        order = np.argsort(xj, kind="stable")
        xs = xj[order]
        # candidate splits where consecutive sorted values differ
        diff = np.nonzero(xs[:-1] < xs[1:])[0]
        if diff.size == 0:
            continue
        GL = np.cumsum(g[order])[diff]
        HL = np.cumsum(h[order])[diff]
        nL = diff + 1
        ok = (nL >= min_child) & (len(g) - nL >= min_child)
        if not ok.any():
            continue
        GR, HR = G - GL, H - HL
        gains = GL * GL / (HL + lam) + GR * GR / (HR + lam) - base
        gains[~ok] = -np.inf
        k = int(np.argmax(gains))
        if gains[k] > best_gain:
            best_gain = float(gains[k])
            best_feat = j
            best_thr = float((xs[diff[k]] + xs[diff[k] + 1]) / 2.0)

    if best_feat < 0:
        return leaf
    mask = X[:, best_feat] <= best_thr
    return {
        "feat": best_feat,
        "thr": best_thr,
        "lt": _build_tree(X[mask], g[mask], h[mask], depth + 1, max_depth, min_child, lam),
        "ge": _build_tree(X[~mask], g[~mask], h[~mask], depth + 1, max_depth, min_child, lam),
    }


def _predict_tree(tree: dict, X: np.ndarray) -> np.ndarray:
    out = np.empty(len(X))

    def walk(node: dict, idx: np.ndarray):
        if "leaf" in node:
            out[idx] = node["leaf"]
            return
        mask = X[idx, node["feat"]] <= node["thr"]
        walk(node["lt"], idx[mask])
        walk(node["ge"], idx[~mask])

    walk(tree, np.arange(len(X)))
    return out


def fit_gbm(
    X: np.ndarray,
    y: np.ndarray,
    n_rounds: int = 150,
    lr: float = 0.1,
    max_depth: int = 4,
    min_child: int = 1,
    lam: float = 1.0,
) -> dict:
    """Fit and return a JSON-serializable artifact {prior, trees}."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(y) == 0 or X.shape[1] == 0:
        return {"prior": 0.0, "trees": []}
    pos = float(y.mean())
    pos = min(max(pos, 1e-6), 1 - 1e-6)
    prior = float(np.log(pos / (1 - pos)))
    F = np.full(len(y), prior)
    trees: list[dict] = []
    for _ in range(n_rounds):
        p = 1.0 / (1.0 + np.exp(-F))
        g = p - y
        h = p * (1 - p)
        tree = _build_tree(X, g, h, 0, max_depth, min_child, lam)
        if "leaf" in tree and len(trees) > 0:
            break  # pure root: nothing left to split on
        trees.append(tree)
        F += lr * _predict_tree(tree, X)
    return {"prior": prior, "trees": trees, "lr": lr}


def feature_importance(artifact: dict, n_features: int) -> list[int]:
    """Split-count importance per feature (LightGBM feature_importance
    analog, used by the BestFeatures selector variants)."""
    counts = [0] * n_features

    def walk(node: dict):
        if "leaf" in node:
            return
        counts[node["feat"]] += 1
        walk(node["lt"])
        walk(node["ge"])

    for tree in artifact.get("trees", []):
        walk(tree)
    return counts


def predict_gbm(artifact: dict, X: np.ndarray) -> np.ndarray:
    """P(y=1) per row."""
    X = np.asarray(X, dtype=np.float64)
    if len(X) == 0:
        return np.zeros(0)
    F = np.full(len(X), float(artifact.get("prior", 0.0)))
    lr = float(artifact.get("lr", 0.1))
    for tree in artifact.get("trees", []):
        F += lr * _predict_tree(tree, X)
    return 1.0 / (1.0 + np.exp(-F))
