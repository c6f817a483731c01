"""fastText-style supervised classifier (M7 slot).

Reference: TextFastTextMethod.py:54-97 — fasttext.train_supervised with
lr 0.1, epoch 600, wordNgrams 2, dim 100, loss 'ova'; predict keeps
labels scoring > 0.5. The fasttext C library is absent in this
container, so this is the published architecture re-implemented from
scratch in numpy: texts → bag of words + word-bigrams → averaged learned
input embeddings → linear one-vs-all sigmoid layer. Deterministic
(seeded LCG init, fixed full-batch GD schedule) so artifacts are
byte-stable at any parallelism.

Driver-fit (training sets are small by reference design); predict runs
in the same Arrow-batched pandas kernels as every other method. The
artifact stores only the observed-vocabulary rows as base64 float32 —
a broadcast-friendly few MB, not the full bucket table.
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd

from .base import MethodBase, input_text

DIM = 50
MAX_VOCAB = 50_000


def _tokens(text: str) -> list[str]:
    words = (text or "").replace("\n", " ").lower().split()
    return words + [f"{a}__{b}" for a, b in zip(words, words[1:])]


def _seeded_uniform(shape: tuple[int, int], seed: int = 1234) -> np.ndarray:
    """Deterministic uniform(-1/dim, 1/dim) init via LCG (no RNG state)."""
    n = shape[0] * shape[1]
    state = np.uint64(seed)
    a = np.uint64(6364136223846793005)
    c = np.uint64(1442695040888963407)
    out = np.empty(n, dtype=np.float64)
    vals = np.empty(n, dtype=np.uint64)
    s = int(state)
    mask = (1 << 64) - 1
    for i in range(n):
        s = (6364136223846793005 * s + 1442695040888963407) & mask
        vals[i] = s
    out = (vals >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return ((out * 2.0 - 1.0) / shape[1]).reshape(shape)


def _encode(mat: np.ndarray) -> str:
    return base64.b64encode(mat.astype(np.float32).tobytes()).decode()


def _decode(s: str, cols: int) -> np.ndarray:
    arr = np.frombuffer(base64.b64decode(s), dtype=np.float32)
    return arr.reshape(-1, cols).astype(np.float64)


class TextFastTextMethod(MethodBase):
    """From-scratch fastText-shape classifier at the reference's
    TextFastTextMethod slot."""

    kind = "multi_option"

    def can_be_used(self, train_pdf, ctx) -> bool:
        # numpy GD is ~100x slower than the C library per epoch; cap the
        # driver-fit cost the way the reference caps SetFit samples
        return bool(ctx.options) and 4 <= len(train_pdf) <= 1500

    def fit(self, train_pdf: pd.DataFrame, ctx):
        from collections import Counter

        texts = [input_text(row) for _, row in train_pdf.iterrows()]
        counts: Counter[str] = Counter()
        for t in texts:
            counts.update(_tokens(t))
        vocab_items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_VOCAB]
        vocab = {tok: i for i, (tok, _) in enumerate(vocab_items)}
        if not vocab:
            return {"vocab": [], "emb": "", "out": "", "labels": []}

        option_ids = [o.id for o in ctx.options]
        y = np.zeros((len(texts), len(option_ids)))
        for r, (_, row) in enumerate(train_pdf.iterrows()):
            ids = {v["id"] for v in (row.get("values") or [])}
            for c, oid in enumerate(option_ids):
                if oid in ids:
                    y[r, c] = 1.0

        flat_ids: list[int] = []
        offsets = [0]
        for t in texts:
            ids = [vocab[tok] for tok in _tokens(t) if tok in vocab]
            if not ids:
                ids = [0]
            flat_ids.extend(ids)
            offsets.append(len(flat_ids))
        flat = np.asarray(flat_ids, dtype=np.int64)
        starts = np.asarray(offsets[:-1], dtype=np.int64)
        cnts = np.diff(offsets).astype(np.float64)

        V, L, n = len(vocab), len(option_ids), len(texts)
        E = _seeded_uniform((V, DIM))
        W = np.zeros((L, DIM))
        epochs = int(min(300, max(60, 60_000 // max(n, 1))))
        # full-batch GD with mean-gradient scaling needs a far larger lr
        # than fastText's per-sample SGD; 20.0 with linear decay converges
        # on the reference fixtures (lr 50 diverges)
        lr0 = 20.0
        for epoch in range(epochs):
            lr = lr0 * (1.0 - epoch / epochs)
            H = np.add.reduceat(E[flat], starts) / cnts[:, None]
            P = 1.0 / (1.0 + np.exp(-np.clip(H @ W.T, -30, 30)))
            G = (P - y) / n  # (n, L)
            dH = G @ W  # (n, DIM), uses pre-update W like fastText
            W -= lr * (G.T @ H)
            dtok = np.repeat(dH / cnts[:, None], np.diff(offsets), axis=0)
            for j in range(DIM):
                E[:, j] -= lr * np.bincount(flat, weights=dtok[:, j], minlength=V)

        return {
            "vocab": [tok for tok, _ in vocab_items],
            "emb": _encode(E),
            "out": _encode(W),
            "labels": option_ids,
        }

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        vocab = {tok: i for i, tok in enumerate(artifact.get("vocab") or [])}
        option_ids = artifact.get("labels") or []
        if not vocab or not option_ids:
            return pd.Series([[] for _ in range(len(pdf))], index=pdf.index, dtype=object)
        E = _decode(artifact["emb"], DIM)
        W = _decode(artifact["out"], DIM)
        id_to_option = {o.id: o for o in ctx.options}
        out = []
        for _, row in pdf.iterrows():
            ids = [vocab[tok] for tok in _tokens(input_text(row)) if tok in vocab]
            h = E[ids].mean(axis=0) if ids else np.zeros(DIM)
            p = 1.0 / (1.0 + np.exp(-np.clip(W @ h, -30, 30)))
            if ctx.multi_value:
                chosen = [oid for oid, s in zip(option_ids, p) if s > 0.5]
            else:
                best = int(np.argmax(p))
                chosen = [option_ids[best]] if p[best] > 0.5 else []
            out.append(
                [
                    id_to_option[oid].to_dict() | {"segment_text": ""}
                    for oid in chosen
                    if oid in id_to_option
                ]
            )
        return pd.Series(out, index=pdf.index, dtype=object)
