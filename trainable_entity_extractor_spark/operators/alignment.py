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


def clean_paragraphs(
    paragraphs: list[dict],
    page_width: float | None = None,
    page_height: float | None = None,
) -> list[dict]:
    """Fixed cleaning order (MultilingualParagraphAlignerUseCase.py:26-35:
    big-no-text → no-text → headers → duplicates → colliding merges).

    F11 (remove_big_no_text) needs page dims: the reference reads them
    off its paragraph objects (`paragraphs[0].page_width/page_height`,
    ParagraphsFromLanguage.py:436-437); here they are passed in (the
    Spark path derives them per document from the segment boxes — see
    align_documents) and the pass is a geometry-gated no-op when absent
    (web-text paragraphs carry no boxes). The reference's two remaining
    cleanup passes are covered elsewhere: cross-page paragraph merging
    (W10) in methods/pdf_to_multi_option.py and typed no-text filtering
    inside remove_repeated_headers (which drops
    PAGE_HEADER/PAGE_FOOTER/FOOTNOTE like remove_no_text_types)."""
    return merge_colliding(
        remove_adjacent_duplicates(
            remove_repeated_headers(
                remove_no_text(
                    remove_big_no_text(paragraphs, page_width, page_height)
                ),
                page_height=page_height,
            )
        )
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


# ------------------------ segmentation repair (fix_segments) --------------
#
# Reference: ParagraphsFromLanguage.fix_segments (:46-51) = one alignment
# pass, then three repair passes over the UNASSIGNED paragraphs — split an
# other-language paragraph that swallowed two main paragraphs (:177-203),
# merge an unassigned other-language fragment into its aligned neighbor or
# split the main paragraph it straddles (:326-429), and merge two main
# paragraphs the other language kept as one (:366-399). The caller
# (MultilingualParagraphAlignerUseCase.align_languages:16-20) runs
# fix_segments once per other language, then re-aligns.


def _index_of(lst: list[dict], p: dict) -> int:
    """Identity-based index (dicts compare by value; two distinct
    paragraphs can be value-equal)."""
    for i, x in enumerate(lst):
        if x is p:
            return i
    return -1


def merge_paragraph_pair(p1: dict, p2: dict, in_place: bool = False) -> dict:
    """ParagraphFeatures.merge (:44-53): concatenated text/words/numbers/
    specials, p1's first_word and page kept, boxes merged on-page."""
    merged = p1 if in_place else dict(p1)
    merged["text"] = (p1["text"] + " " + p2["text"]).strip()
    merged["words"] = p1["words"] + p2["words"]
    merged["numbers"] = p1["numbers"] + p2["numbers"]
    merged["numbers_by_spaces"] = p1["numbers_by_spaces"] + p2["numbers_by_spaces"]
    merged["non_alnum"] = p1["non_alnum"] + p2["non_alnum"]
    if (
        p1.get("top") is not None
        and p2.get("top") is not None
        and p1["page"] == p2["page"]
    ):
        bottom = max(p1["top"] + (p1.get("height") or 0), p2["top"] + (p2.get("height") or 0))
        merged["top"] = min(p1["top"], p2["top"])
        merged["height"] = bottom - merged["top"]
    return merged


def should_merge_paragraphs(target: dict, prev_score: float, p1: dict, p2: dict) -> bool:
    """ParagraphsFromLanguage.should_merge_paragraphs (:421-429): merging
    p1+p2 must not lower the match score against the already-aligned
    target paragraph."""
    return prev_score <= match_score(target, merge_paragraph_pair(p1, p2))


def split_paragraph_at(paragraph_list: list[dict], splitter_word: str, to_fix: dict) -> bool:
    """ParagraphsFromLanguage.split_paragraph (:204-231): split `to_fix`
    (must be in `paragraph_list`) at `splitter_word` iff the word is a
    list/section separator occurring exactly once, strictly inside the
    text. The second part starts with the splitter."""
    if not is_paragraph_separator(splitter_word):
        return False
    text = to_fix["text"]
    if splitter_word not in text or text.count(splitter_word) > 1:
        return False
    stripped = text.strip()
    if stripped.startswith(splitter_word) or stripped.endswith(splitter_word):
        return False
    idx = _index_of(paragraph_list, to_fix)
    if idx < 0:
        return False
    part1 = text.split(splitter_word)[0].strip()
    part2 = (splitter_word + text.split(splitter_word)[1]).strip()
    halves = []
    for j, part in enumerate((part1, part2)):
        seed = {
            "text": part,
            "page": to_fix["page"],
            "seg_type": to_fix["seg_type"],
            "left": to_fix.get("left"),
            "width": to_fix.get("width"),
            "top": to_fix.get("top"),
            "height": to_fix.get("height"),
        }
        # half-height boxes like the reference (ParagraphFeatures.py:60-65,89-94)
        if to_fix.get("top") is not None and to_fix.get("height") is not None:
            seed["height"] = to_fix["height"] / 2
            seed["top"] = to_fix["top"] + j * to_fix["height"] / 2
        halves.append(paragraph_features(seed, to_fix["index"]))
    paragraph_list[idx : idx + 1] = halves
    return True


def _paragraph_distance(p1: dict, p2: dict) -> float:
    """ParagraphFeatures.get_distance (:265-269): normalized vertical gap,
    0 across pages. Without geometry (web-text paragraphs) the gap is
    unknowable — treated as 0 so the merge repair stays reachable
    (documented deviation; the score guard still gates the merge)."""
    if p1.get("top") is None or p2.get("top") is None or p1["page"] != p2["page"]:
        return 0.0
    page_height = max(p1["top"] + (p1.get("height") or 0), p2["top"] + (p2.get("height") or 0), 1.0)
    return (p2["top"] - (p1["top"] + (p1.get("height") or 0))) / page_height


def _fix_other_segmentation(
    main: list[dict], other: list[dict], m2o: dict, repaired_main: set
) -> bool:
    """Pass 1 (:177-203): an unassigned MAIN paragraph whose neighbor's
    aligned other-paragraph scores better after merging the two main
    paragraphs means the other language swallowed both — split the other
    paragraph at the unassigned main's first word.

    Deviation (documented): a main paragraph whose partner was CREATED by
    a successful split is recorded in `repaired_main` and treated as
    assigned by the later passes — the reference's object-keyed score map
    goes stale after a split, and replaying pass 3 against the stale
    pre-split score would immediately re-merge the mains the split just
    fixed."""
    before = len(other)
    for cur in [p for p in reversed(main)]:
        if id(cur) in m2o:
            continue
        idx = _index_of(main, cur)
        prev = main[idx - 1] if idx > 0 else None
        if prev is not None and id(prev) in m2o:
            to_receive, score = m2o[id(prev)]
            if should_merge_paragraphs(to_receive, score, prev, cur):
                if split_paragraph_at(other, cur["first_word"], to_receive):
                    repaired_main.add(id(cur))
                continue
        nxt = main[idx + 1] if idx + 1 < len(main) else None
        if nxt is None or id(nxt) not in m2o:
            continue
        # Reference quirk mirrored (:196-200): this branch passes the MAIN
        # paragraph (`.main_paragraph`) as the split target, which is
        # never in the other-language list, so the split's index lookup
        # fails and the branch is a no-op in practice.
        _, score = m2o[id(nxt)]
        if should_merge_paragraphs(nxt, score, cur, nxt):
            split_paragraph_at(other, nxt["first_word"], nxt)
    return len(other) != before


def _split_main_or_merge_other(
    main: list[dict],
    other: list[dict],
    main_to_receive: dict,
    previous: dict,
    nxt: dict,
    aligned_other: set,
) -> list[dict]:
    """:400-419 — try splitting the main paragraph at the other fragment's
    first word; else, if the two other fragments are vertically adjacent,
    merge them (in place, keeping identity-keyed scores valid)."""
    if split_paragraph_at(main, nxt["first_word"], main_to_receive):
        return []
    if _paragraph_distance(previous, nxt) > 0.02:
        return []
    if id(previous) in aligned_other:
        merge_paragraph_pair(previous, nxt, in_place=True)
        return [nxt]
    if id(nxt) in aligned_other:
        # merge the unassigned `previous` into the aligned `nxt` slot.
        # Deviation (documented): the reference replaces nxt's slot with
        # the merged `previous` and then tries to remove `nxt`, which is
        # no longer in the list — leaving the merged paragraph at TWO
        # indices (:411-416, reproduced on a fixture). Here the merged
        # paragraph keeps nxt's aligned slot and previous's own slot is
        # the one removed.
        merge_paragraph_pair(previous, nxt, in_place=True)
        i = _index_of(other, nxt)
        if i >= 0:
            other[i] = previous
        return [previous]
    return []


def _fix_other_unassigned(
    main: list[dict], other: list[dict], o2m: dict, aligned_other: set
) -> bool:
    """Pass 2 (:326-364): an unassigned OTHER fragment either marks a main
    paragraph that should be split, or is a broken-off piece to merge back
    into its aligned neighbor."""
    removed: list[dict] = []
    main_before = len(main)
    for cur in [p for p in reversed(other)]:
        if id(cur) in o2m:
            continue
        idx = _index_of(other, cur)
        if idx < 0:
            continue
        prev = other[idx - 1] if idx > 0 else None
        if prev is not None and id(prev) in o2m:
            main_to_receive, score = o2m[id(prev)]
            if should_merge_paragraphs(main_to_receive, score, prev, cur):
                removed += _split_main_or_merge_other(
                    main, other, main_to_receive, prev, cur, aligned_other
                )
                continue
        nxt = other[idx + 1] if idx + 1 < len(other) else None
        if nxt is None or id(nxt) not in o2m:
            continue
        main_to_receive, score = o2m[id(nxt)]
        if should_merge_paragraphs(main_to_receive, score, cur, nxt):
            removed += _split_main_or_merge_other(
                main, other, main_to_receive, cur, nxt, aligned_other
            )
    for p in removed:
        i = _index_of(other, p)
        if i >= 0:
            other.pop(i)
    return bool(removed) or len(main) != main_before


def _fix_main_unassigned(
    main: list[dict], other: list[dict], m2o: dict, repaired_main: set
) -> bool:
    """Pass 3 (:366-399): an unassigned MAIN paragraph whose neighbor's
    aligned other-paragraph scores better against the merged pair means
    the other language kept them as ONE paragraph — merge the mains.

    Documented deviation from the reference's next-neighbor branch
    (:391-394): the reference's in-place `cur.merge(next)` leaves the
    merged object in the list TWICE (at idx via mutation and at idx+1 via
    assignment) while the removal of `next` no-ops — a duplication bug we
    do not reproduce; here the merged paragraph replaces `next` and `cur`
    is dropped."""
    removed: list[dict] = []
    for cur in [p for p in reversed(main)]:
        if id(cur) in m2o or id(cur) in repaired_main:
            continue
        idx = _index_of(main, cur)
        if idx < 0:
            continue
        prev = main[idx - 1] if idx > 0 else None
        if prev is not None and id(prev) in m2o:
            other_to_compare, score = m2o[id(prev)]
            if should_merge_paragraphs(other_to_compare, score, prev, cur):
                merged = merge_paragraph_pair(prev, cur)
                main[idx - 1] = merged
                m2o[id(merged)] = m2o.pop(id(prev))
                removed.append(cur)
                continue
        nxt = main[idx + 1] if idx + 1 < len(main) else None
        if nxt is None or id(nxt) not in m2o:
            continue
        other_to_compare, score = m2o[id(nxt)]
        if should_merge_paragraphs(other_to_compare, score, cur, nxt):
            merged = merge_paragraph_pair(cur, nxt)
            main[idx + 1] = merged
            m2o[id(merged)] = m2o.pop(id(nxt))
            removed.append(cur)
    for p in removed:
        i = _index_of(main, p)
        if i >= 0:
            main.pop(i)
    return bool(removed)


def fix_segments(main: list[dict], other: list[dict]) -> tuple[list[dict], list[dict], bool]:
    """ParagraphsFromLanguage.fix_segments (:46-51): align once, then run
    the three repair passes against that alignment's scores. Returns the
    (possibly rebuilt) lists and whether anything changed; the caller
    re-aligns afterwards, like the reference use case."""
    main, other = list(main), list(other)
    # NOTE: no is_same_document gate here — the reference sets its
    # alignment scores before the same-pdf check and the repair passes
    # consume them regardless (:37-44 vs :46-51); only the final aligned
    # OUTPUT is emptied for different documents.
    matches = align_paragraphs(main, other)
    m2o = {id(main[mi]): (other[oi], sc) for mi, oi, sc in matches}
    o2m = {id(other[oi]): (main[mi], sc) for mi, oi, sc in matches}
    aligned_other = {id(other[oi]) for _, oi, _ in matches}
    repaired_main: set = set()
    changed = _fix_other_segmentation(main, other, m2o, repaired_main)
    changed = _fix_other_unassigned(main, other, o2m, aligned_other) or changed
    changed = _fix_main_unassigned(main, other, m2o, repaired_main) or changed
    return main, other, changed


# ------------------------------ Spark surface -----------------------------

def _page_dims(records: list[dict]) -> tuple[float | None, float | None]:
    """Per-document page dims derived from the segment boxes:
    (max(left+width), max(top+height)) — the Spark-side analog of the
    reference's paragraph-carried page_width/page_height
    (ParagraphsFromLanguage.py:436-437). None when the document has no
    geometry, which gates F11 off exactly like the reference's
    PDF-less path."""
    def num(v) -> bool:  # pandas to_dict yields NaN (not None) for nulls
        return v is not None and not (isinstance(v, float) and math.isnan(v))

    widths = [
        (r["left"] if num(r.get("left")) else 0.0) + r["width"]
        for r in records
        if num(r.get("width"))
    ]
    heights = [
        (r["top"] if num(r.get("top")) else 0.0) + r["height"]
        for r in records
        if num(r.get("height"))
    ]
    return (max(widths) if widths else None, max(heights) if heights else None)


def align_documents(main_df, other_df, id_col: str = "url", repair: bool = True):
    """Distributed J4: cogroup the two segment tables by document id and
    run clean (big-no-text → no-text → headers → duplicates → colliding,
    F11 geometry-derived per document) → fix_segments repair → align per
    pair (the reference's MultilingualParagraphAlignerUseCase order;
    repair=False skips the fix_segments passes). Returns (doc, main_idx,
    other_idx, score, main_text, other_text)."""
    import pandas as pd

    def run(key, main_pdf: pd.DataFrame, other_pdf: pd.DataFrame) -> pd.DataFrame:
        main_recs = main_pdf.sort_values("seg_idx").to_dict("records")
        other_recs = other_pdf.sort_values("seg_idx").to_dict("records")
        mw, mh = _page_dims(main_recs)
        ow, oh = _page_dims(other_recs)
        main_pars = clean_paragraphs(
            [paragraph_features(r, i) for i, r in enumerate(main_recs)],
            page_width=mw,
            page_height=mh,
        )
        other_pars = clean_paragraphs(
            [paragraph_features(r, i) for i, r in enumerate(other_recs)],
            page_width=ow,
            page_height=oh,
        )
        if repair:
            main_pars, other_pars, _ = fix_segments(main_pars, other_pars)
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
