"""Multilingual paragraph alignment (SURVEY §3.3): cleaning passes
F10/F12/F13 + Needleman–Wunsch global alignment (J4) with the reference's
13-feature match score, distributed per document pair via applyInPandas.

Reference: multilingual_paragraph_extractor/domain/ParagraphsFromLanguage.py
(THRESHOLD=0.5, gap -0.05, header fuzz>90 on >=max(ceil(0.2*pages),3)
pages, alignment DP :256-306) and ParagraphMatchScore.py:25-185.

Layout-dependent features (alignment/indentation/font) are computed when
the paragraph carries boxes/width metadata and default to neutral 1.0
otherwise (web-text paragraphs have no fonts; documented deviation —
text/number/first-word features carry the signal).
"""

from __future__ import annotations

import math
import re

from ..functions.fuzzy import indel_ratio

THRESHOLD = 0.5
GAP_PENALTY = -0.05
HEADER_SIMILARITY_THRESHOLD = 90
TOP_OF_PAGE_THRESHOLD = 0.2
REPEATED_HEADER_THRESHOLD = 0.2

_REGULAR_RE = re.compile(
    r"[^a-zA-Z0-9\sа-яА-Яά-ωΑ-Ω؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻿]"
)


def paragraph_features(seg: dict, index: int) -> dict:
    """ParagraphFeatures analog (ParagraphFeatures.py:25-114): words,
    numeric tokens, digit runs, first word, non-alnum chars."""
    text = " ".join((seg.get("text") or "").split())
    words = text.split()
    return {
        "index": index,
        "page": int(seg.get("page") or 1),
        "seg_type": seg.get("seg_type") or "TEXT",
        "text": text,
        "words": words,
        "first_word": words[0] if words else "",
        "numbers": re.findall(r"\d+", text),
        "numbers_by_spaces": [w for w in words if w.isdigit()],
        "non_alnum": [c for c in text if not c.isalnum() and not c.isspace()],
        "left": seg.get("left"),
        "top": seg.get("top"),
        "width": seg.get("width"),
        "height": seg.get("height"),
    }


def _sorted_pair(p1: dict, p2: dict) -> tuple[dict, dict]:
    return (p1, p2) if len(p1["text"]) >= len(p2["text"]) else (p2, p1)


def match_score(p1: dict, p2: dict) -> float:
    """ParagraphMatchScore.calculate_overall_score: mean of 10 features
    with first_word double-weighted (/11)."""
    w1, w2 = p1["words"], p2["words"]
    type_score = 1.0 if p1["seg_type"] == p2["seg_type"] else 0.0
    text_score = len(set(w1) & set(w2)) / max(len(w1), len(w2)) if w1 else 0.0
    n_words_score = 1 - abs(len(w1) - len(w2)) / max(len(w1), len(w2)) if w1 else 0.0

    nbs1, nbs2 = p1["numbers_by_spaces"], p2["numbers_by_spaces"]
    nums1, nums2 = p1["numbers"], p2["numbers"]
    max_nbs, max_nums = max(len(nbs1), len(nbs2)), max(len(nums1), len(nums2))
    if not max_nbs or not max_nums:
        numbers_score = 1.0
    else:
        numbers_score = max(
            len(set(nbs1) & set(nbs2)) / max_nbs, len(set(nums1) & set(nums2)) / max_nums
        )

    lp, sp = _sorted_pair(p1, p2)
    first_word_score = indel_ratio(lp["first_word"], sp["first_word"]) / 100.0
    lchars, schars = lp["non_alnum"], sp["non_alnum"]
    if lchars:
        special_score = len(set(lchars) & set(schars)) / len(lchars)
    elif schars:
        special_score = 0.0
    else:
        special_score = 1.0

    # layout features when geometry present, neutral otherwise
    if p1.get("left") is not None and p2.get("left") is not None and p1.get("width"):
        c1 = p1["left"] + p1["width"] / 2
        c2 = p2["left"] + (p2["width"] or 0) / 2
        page_w = max(p1["left"] + (p1["width"] or 0), 1.0)
        indentation = max(0.0, 1 - abs(c1 - c2) / page_w)
        alignment = indentation
    else:
        alignment = indentation = 1.0
    font_style = font_size = 1.0  # no font metadata on web-text paragraphs

    return (
        type_score
        + text_score
        + n_words_score
        + numbers_score
        + 2 * first_word_score
        + special_score
        + alignment
        + indentation
        + font_style
        + font_size
    ) / 11.0


# ------------------------------ cleaning (F10/F12/F13) --------------------

def remove_no_text(paragraphs: list[dict]) -> list[dict]:
    """F10: drop paragraphs without alphanumerics or <=1 regular char."""
    out = []
    for p in paragraphs:
        text = p["text"]
        if not text or not any(c.isalnum() for c in text):
            continue
        if len(_REGULAR_RE.sub("", text).strip()) <= 1:
            continue
        out.append(p)
    return out


def remove_adjacent_duplicates(paragraphs: list[dict]) -> list[dict]:
    """F13: drop paragraph when next paragraph has identical text."""
    out = []
    for p, nxt in zip(paragraphs, paragraphs[1:]):
        if p["text"] == nxt["text"]:
            continue
        out.append(p)
    if paragraphs:
        out.append(paragraphs[-1])
    return out


def remove_repeated_headers(paragraphs: list[dict], page_height: float | None = None) -> list[dict]:
    """F12: top/bottom-20% paragraphs clustered by fuzz ratio > 90; clusters
    appearing on >= max(ceil(0.2*pages), 3) pages are removed."""
    if not paragraphs:
        return paragraphs
    if page_height is None:
        tops = [p["top"] for p in paragraphs if p.get("top") is not None]
        page_height = max(tops) + 1 if tops else None
    if page_height is None:
        return paragraphs

    def on_edge(p: dict) -> bool:
        top = p.get("top")
        if top is None:
            return False
        bottom = top + (p.get("height") or 0)
        return top < page_height * TOP_OF_PAGE_THRESHOLD or bottom > page_height * (
            1 - TOP_OF_PAGE_THRESHOLD
        )

    pages_number = max(p["page"] for p in paragraphs)
    clusters: dict[str, list[dict]] = {}
    for p in (x for x in paragraphs if on_edge(x)):
        for key in clusters:
            if indel_ratio(p["text"], key) > HEADER_SIMILARITY_THRESHOLD:
                clusters[key].append(p)
                break
        else:
            clusters[p["text"]] = [p]
    min_pages = max(math.ceil(pages_number * REPEATED_HEADER_THRESHOLD), 3)
    headers = {id(p) for v in clusters.values() if len(v) >= min_pages for p in v}
    return [
        p
        for p in paragraphs
        if id(p) not in headers and p["seg_type"] not in ("PAGE_HEADER", "PAGE_FOOTER", "FOOTNOTE")
    ]


import re as _re

_SEPARATOR_PATTERNS = [
    # X16 (ParagraphsFromLanguage.is_paragraph_separators:148-175)
    r"^\d+[\.\)\-]?\d*$", r"^\(\d+\)$",
    r"^[a-zA-Z][\.\)\-]?$", r"^\([a-zA-Z]\)$",
    r"^(?:i|ii|iii|iv|v|vi|vii|viii|ix|x|xi|xii|xiii|xiv|xv)[\.\)\-]?$",
    r"^\((?:i|ii|iii|iv|v|vi|vii|viii|ix|x|xi|xii|xiii|xiv|xv)\)$",
    r"^[-–—•∙◦○●\*\+]$",
    r"^\[\d+\]$", r"^\[[a-zA-Z]\]$",
    r"^§\s*\d+$", r"^¶\s*\d+$",
]


def is_paragraph_separator(text: str) -> bool:
    """X16: list markers / roman numerals / bullets / §¶ markers."""
    text = (text or "").strip()
    return any(_re.match(p, text, _re.IGNORECASE) for p in _SEPARATOR_PATTERNS)


def remove_big_no_text(paragraphs: list[dict], page_width: float | None = None, page_height: float | None = None) -> list[dict]:
    """F11 (ParagraphsFromLanguage.py:436-457): drop paragraphs whose box
    covers >=20% of the page with >100 area-per-character (figures). No-op
    without geometry."""
    if not paragraphs or page_width is None or page_height is None:
        return paragraphs
    threshold_area = 0.2 * page_width * page_height
    out = []
    for p in paragraphs:
        if not p["text"]:
            continue
        w, h = p.get("width") or 0.0, p.get("height") or 0.0
        area = w * h
        if area < threshold_area:
            out.append(p)
            continue
        if area / max(len(p["text"]), 1) > 100:
            continue
        out.append(p)
    return out


def _collide(p1: dict, p2: dict) -> bool:
    if p1.get("top") is None or p2.get("top") is None or p1["page"] != p2["page"]:
        return False
    b1 = (p1["top"], p1["top"] + (p1.get("height") or 0))
    b2 = (p2["top"], p2["top"] + (p2.get("height") or 0))
    return min(b1[1], b2[1]) - max(b1[0], b2[0]) > 0


def merge_colliding(paragraphs: list[dict]) -> list[dict]:
    """F14 (ParagraphsFromLanguage.merge_colliding_segments:60-81): merge
    consecutive paragraph pairs whose boxes vertically collide."""
    out, i = [], 0
    while i < len(paragraphs):
        p = paragraphs[i]
        if i + 1 < len(paragraphs) and _collide(p, paragraphs[i + 1]):
            nxt = paragraphs[i + 1]
            merged = paragraph_features(
                {
                    "text": p["text"] + " " + nxt["text"],
                    "page": p["page"],
                    "seg_type": p["seg_type"],
                    "left": min(x for x in (p.get("left"), nxt.get("left")) if x is not None) if p.get("left") is not None else None,
                    "top": min(x for x in (p.get("top"), nxt.get("top")) if x is not None) if p.get("top") is not None else None,
                    "width": p.get("width"),
                    "height": (p.get("height") or 0) + (nxt.get("height") or 0),
                },
                p["index"],
            )
            out.append(merged)
            i += 2
            continue
        out.append(p)
        i += 1
    return out


def clean_paragraphs(paragraphs: list[dict]) -> list[dict]:
    """Fixed cleaning order (MultilingualParagraphAlignerUseCase.py:26-35:
    big-no-text → no-text → headers → duplicates → colliding merges)."""
    return merge_colliding(
        remove_adjacent_duplicates(remove_repeated_headers(remove_no_text(paragraphs)))
    )


# ------------------------------ NW alignment (J4) -------------------------

def align_paragraphs(main: list[dict], other: list[dict]) -> list[tuple[int, int, float]]:
    """Global NW alignment; returns (main_index, other_index, score) for
    diagonal matches scoring >= THRESHOLD. O(n*m) per document pair."""
    n, m = len(main), len(other)
    if not n or not m:
        return []
    score_cache = [[None] * m for _ in range(n)]

    def s(i: int, j: int) -> float:
        if score_cache[i][j] is None:
            score_cache[i][j] = match_score(main[i], other[j])
        return score_cache[i][j]

    dp = [[0.0] * (m + 1) for _ in range(n + 1)]
    back = [[None] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        dp[i][0] = dp[i - 1][0] + GAP_PENALTY
        back[i][0] = "up"
    for j in range(1, m + 1):
        dp[0][j] = dp[0][j - 1] + GAP_PENALTY
        back[0][j] = "left"
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            match = dp[i - 1][j - 1] + s(i - 1, j - 1)
            delete = dp[i - 1][j] + GAP_PENALTY
            insert = dp[i][j - 1] + GAP_PENALTY
            best = max(match, delete, insert)
            dp[i][j] = best
            back[i][j] = "diag" if best == match else ("up" if best == delete else "left")

    matches = []
    i, j = n, m
    while i > 0 and j > 0:
        if back[i][j] == "diag":
            if s(i - 1, j - 1) >= THRESHOLD:
                matches.append((i - 1, j - 1, s(i - 1, j - 1)))
            i, j = i - 1, j - 1
        elif back[i][j] == "up":
            i -= 1
        else:
            j -= 1
    return list(reversed(matches))


def is_same_document(main: list[dict], matches: list[tuple[int, int, float]]) -> bool:
    """<50% of main paragraphs matched => different documents
    (ParagraphsFromLanguage.py:308-314)."""
    if not main:
        return True
    return 100 * len(matches) / len(main) > 50


# ------------------------------ Spark surface -----------------------------

def align_documents(main_df, other_df, id_col: str = "url"):
    """Distributed J4: cogroup the two segment tables by document id and
    run clean+align per pair. Returns (doc, main_idx, other_idx, score,
    main_text, other_text)."""
    import pandas as pd

    def run(key, main_pdf: pd.DataFrame, other_pdf: pd.DataFrame) -> pd.DataFrame:
        main_pars = clean_paragraphs(
            [paragraph_features(r, i) for i, r in enumerate(main_pdf.sort_values("seg_idx").to_dict("records"))]
        )
        other_pars = clean_paragraphs(
            [paragraph_features(r, i) for i, r in enumerate(other_pdf.sort_values("seg_idx").to_dict("records"))]
        )
        matches = align_paragraphs(main_pars, other_pars)
        if not is_same_document(main_pars, matches):
            matches = []
        return pd.DataFrame(
            [
                {
                    "doc": key[0],
                    "main_idx": mi,
                    "other_idx": oi,
                    "score": float(sc),
                    "main_text": main_pars[mi]["text"],
                    "other_text": other_pars[oi]["text"],
                }
                for mi, oi, sc in matches
            ],
            columns=["doc", "main_idx", "other_idx", "score", "main_text", "other_text"],
        )

    return main_df.groupBy(id_col).cogroup(other_df.groupBy(id_col)).applyInPandas(
        run,
        schema="doc string, main_idx int, other_idx int, score double, main_text string, other_text string",
    )
