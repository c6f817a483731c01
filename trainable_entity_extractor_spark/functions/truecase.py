"""Statistical truecaser (X13 slot).

Reference: text_to_text_extractor/methods/TrueCaser.py — scores each
casing alternative of a lowercased token by interpolating unigram,
backward/forward bigram and trigram casing distributions (pseudo-count
smoothing), picking the argmax. The reference loads PRETRAINED
distribution pickles (en/es Wikipedia dumps, absent in this container);
this stand-in learns the same distributions from the training corpus at
fit time — fully deterministic, artifact is a plain dict.

Used by the MT5 composition in the reference (M8, out of scope here);
exposed as a library function plus a driver-fit artifact so any
to-text method can post-process lowercased model output.
"""

from __future__ import annotations

import math
from collections import Counter

_PSEUDO = 5.0


def fit_truecaser(texts: list[str]) -> dict:
    """Learn casing distributions from cased text."""
    casing: dict[str, set] = {}
    uni: Counter[str] = Counter()
    bw: Counter[str] = Counter()
    fw: Counter[str] = Counter()
    tri: Counter[str] = Counter()
    for text in texts:
        tokens = (text or "").split()
        for i, tok in enumerate(tokens):
            low = tok.lower()
            casing.setdefault(low, set()).add(tok)
            uni[tok] += 1
            if i > 0:
                bw[f"{tokens[i - 1]}_{tok}"] += 1
            if i + 1 < len(tokens):
                fw[f"{tok}_{tokens[i + 1].lower()}"] += 1
            if 0 < i < len(tokens) - 1:
                tri[f"{tokens[i - 1]}_{tok}_{tokens[i + 1].lower()}"] += 1
    return {
        "casing": {k: sorted(v) for k, v in casing.items()},
        "uni": dict(uni),
        "bw": dict(bw),
        "fw": dict(fw),
        "tri": dict(tri),
    }


def _score(model: dict, prev: str | None, cand: str, nxt: str | None, variants: list[str]) -> float:
    uni, bw, fw, tri = model["uni"], model["bw"], model["fw"], model["tri"]
    s = math.log(
        (uni.get(cand, 0) + _PSEUDO)
        / sum(uni.get(v, 0) + _PSEUDO for v in variants)
    )
    if prev is not None:
        s += math.log(
            (bw.get(f"{prev}_{cand}", 0) + _PSEUDO)
            / sum(bw.get(f"{prev}_{v}", 0) + _PSEUDO for v in variants)
        )
    if nxt is not None:
        s += math.log(
            (fw.get(f"{cand}_{nxt}", 0) + _PSEUDO)
            / sum(fw.get(f"{v}_{nxt}", 0) + _PSEUDO for v in variants)
        )
    if prev is not None and nxt is not None:
        s += math.log(
            (tri.get(f"{prev}_{cand}_{nxt}", 0) + _PSEUDO)
            / sum(tri.get(f"{prev}_{v}_{nxt}", 0) + _PSEUDO for v in variants)
        )
    return s


def truecase(text: str, model: dict) -> str:
    """Restore casing of a lowercased string; unknown tokens pass through."""
    casing = model["casing"]
    tokens = (text or "").split()
    out: list[str] = []
    for i, tok in enumerate(tokens):
        variants = casing.get(tok.lower())
        if not variants:
            out.append(tok)
            continue
        if len(variants) == 1:
            out.append(variants[0])
            continue
        prev = out[i - 1] if i > 0 else None
        nxt = tokens[i + 1].lower() if i + 1 < len(tokens) else None
        best = max(variants, key=lambda v: (_score(model, prev, v, nxt, variants), v))
        out.append(best)
    return " ".join(out)
