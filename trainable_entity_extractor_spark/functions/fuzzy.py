"""Indel-similarity kernels compatible with rapidfuzz `fuzz.ratio` /
`fuzz.partial_ratio` (the reference depends on rapidfuzz; this container
doesn't ship it, so the scorer is reimplemented from the published
definition: ratio = 100 * (1 - indel_distance / (len1 + len2)) with
indel_distance = len1 + len2 - 2 * LCS).

Used by the fuzzy method family (reference FuzzyAll100.py:23-41,
TextFuzzyAll100.py:20-30, FuzzyFirst.py:21-31 — see SURVEY.md §2.3 J1/J2).

Design for scale: these run inside Arrow-batched pandas UDFs over millions
of rows. Three tiers keep the hot path cheap:
  1. threshold == 100  → plain substring test (ratio 100 on an equal-length
     window iff identical), expressible as a native Spark `contains`.
  2. character-multiset sliding upper bound prunes windows that cannot
     reach the cutoff (O(n) amortized per candidate string).
  3. bit-parallel LCS (Hyyro-style, arbitrary-precision ints) only on
     surviving windows.
"""

from __future__ import annotations

import math
from functools import lru_cache


def _bit_masks(needle: str) -> dict[str, int]:
    masks: dict[str, int] = {}
    for i, ch in enumerate(needle):
        masks[ch] = masks.get(ch, 0) | (1 << i)
    return masks


def _lcs_bitparallel(needle: str, haystack: str, masks: dict[str, int]) -> int:
    """Length of the longest common subsequence via bit-parallel DP.

    Standard bit-vector LCS recurrence: V starts all-ones over len(needle)
    bits; for each haystack char, U = V & mask(c); V = (V + U) | (V - U).
    LCS = number of zero bits in V.
    """
    m = len(needle)
    if m == 0 or not haystack:
        return 0
    full = (1 << m) - 1
    v = full
    for ch in haystack:
        u = v & masks.get(ch, 0)
        if u:
            v = ((v + u) | (v - u)) & full
    # zero bits of v within m bits = matched positions
    return m - bin(v).count("1")


def indel_ratio(s1: str, s2: str) -> float:
    """rapidfuzz fuzz.ratio equivalent: normalized Indel similarity * 100."""
    total = len(s1) + len(s2)
    if total == 0:
        return 100.0
    lcs = _lcs_bitparallel(s1, s2, _bit_masks(s1))
    return 100.0 * (2.0 * lcs) / total


def partial_ratio(needle: str, haystack: str, score_cutoff: float = 0.0) -> float:
    """rapidfuzz fuzz.partial_ratio equivalent.

    The shorter string slides over the longer; score is the best
    `indel_ratio(shorter, window)` over windows of len(shorter), including
    clipped prefix/suffix windows at the edges.
    """
    if len(needle) > len(haystack):
        needle, haystack = haystack, needle
    m, n = len(needle), len(haystack)
    if m == 0:
        return 100.0 if n == 0 else 0.0

    # Fast path: exact containment gives a perfect window.
    if needle in haystack:
        return 100.0

    masks = _bit_masks(needle)
    needle_counts: dict[str, int] = {}
    for ch in needle:
        needle_counts[ch] = needle_counts.get(ch, 0) + 1

    best = 0.0

    # Sliding character-multiset intersection for full-length windows:
    # LCS(needle, window) <= sum_c min(count_needle[c], count_window[c]).
    window_counts: dict[str, int] = {}
    inter = 0
    for i in range(n):
        ch_in = haystack[i]
        c_w = window_counts.get(ch_in, 0)
        window_counts[ch_in] = c_w + 1
        if c_w < needle_counts.get(ch_in, 0):
            inter += 1
        if i >= m:
            ch_out = haystack[i - m]
            c_o = window_counts[ch_out] - 1
            window_counts[ch_out] = c_o
            if c_o < needle_counts.get(ch_out, 0):
                inter -= 1
        if i >= m - 1:
            start = i - m + 1
            bound = 100.0 * (2.0 * inter) / (2 * m)
            if bound <= best or bound < score_cutoff:
                continue
            score = 100.0 * 2.0 * _lcs_bitparallel(needle, haystack[start : i + 1], masks) / (2 * m)
            if score > best:
                best = score
                if best == 100.0:
                    return best

    # Clipped edge windows (needle partially overlapping haystack ends).
    # Caps shrink as w decreases, so iterate w descending and stop early.
    for w in range(m - 1, 0, -1):
        denom = m + w
        cap = 100.0 * (2.0 * w) / denom
        if cap <= best or cap < score_cutoff:
            break
        for window in (haystack[:w], haystack[n - w :]):
            score = 100.0 * 2.0 * _lcs_bitparallel(needle, window, masks) / denom
            if score > best:
                best = score
    return best


@lru_cache(maxsize=100_000)
def _cached_partial_ratio(needle: str, haystack: str) -> float:
    return partial_ratio(needle, haystack)


# ---------------------------------------------------------------------------
# Batch kernels with exact reference semantics. Each takes plain Python data
# (called per Arrow batch inside pandas UDFs) and returns per-row results.
# ---------------------------------------------------------------------------


def text_fuzzy_all_appearances(text: str, options_lower: list[str], threshold: float) -> list[str]:
    """Reference TextFuzzyAll100.get_appearances (TextFuzzyAll100.py:20-30):
    length guard ceil(len(option)*0.85), partial_ratio >= threshold, dedup.
    Returns matched lowercase labels (input order of `options_lower`)."""
    if text is None:
        return []
    lowered = text.lower()
    out = []
    seen = set()
    for option in options_lower:
        if option in seen:
            continue
        if len(text) < math.ceil(len(option) * 0.85):
            continue
        if threshold >= 100.0:
            hit = option in lowered
        else:
            hit = partial_ratio(option, lowered, threshold) >= threshold
        if hit:
            out.append(option)
            seen.add(option)
    return out


def pdf_fuzzy_all_appearances(
    segment_texts: list[str], options_sorted: list[str], threshold: float
) -> list[tuple[str, str]]:
    """Reference FuzzyAll100.get_appearances (FuzzyAll100.py:23-41).

    Per segment (in order): normalize whitespace+lower; options visited
    longest-first; skip options already matched; length guard
    ceil(len(option)*threshold/100); partial_ratio >= threshold => match
    with the segment's original text as context; exact substring hits are
    consumed (text.replace) so shorter options can't re-match the span.
    Returns [(option_lower, context_text)] in appearance order.
    """
    appearances: list[tuple[str, str]] = []
    matched: set[str] = set()
    for seg_text in segment_texts:
        if seg_text is None:
            continue
        text = " ".join(seg_text.lower().split())
        for option in options_sorted:
            if option in matched:
                continue
            if len(text) < math.ceil(len(option) * threshold / 100.0):
                continue
            if threshold >= 100.0:
                hit = option in text
            else:
                hit = partial_ratio(option, text, threshold) >= threshold
            if hit:
                matched.add(option)
                appearances.append((option, seg_text))
            if option in text:
                text = text.replace(option, "")
    return appearances


def fuzzy_first_last_appearance(
    segment_texts: list[str], options_sorted: list[str], reverse: bool
) -> tuple[str, str] | None:
    """Reference FuzzyFirst/FuzzyLast (FuzzyFirst.py:21-31): scan segments in
    (reverse) order; thresholds 100,90,80,70; length guard on the RAW text
    length; first hit wins. Returns (option_lower, context) or None."""
    seq = reversed(segment_texts) if reverse else iter(segment_texts)
    for seg_text in seq:
        if seg_text is None:
            continue
        lowered = seg_text.lower()
        for threshold in range(100, 69, -10):
            for option in options_sorted:
                if len(seg_text) < math.ceil(len(option) * threshold / 100.0):
                    continue
                if threshold >= 100:
                    hit = option in lowered
                else:
                    hit = _cached_partial_ratio(option, lowered) >= threshold
                if hit:
                    return option, seg_text
    return None


def text_fuzzy_first_last_appearance(
    text: str, options: list[str], reverse: bool
) -> str | None:
    """Reference TextFuzzyFirst/TextFuzzyLast (TextFuzzyFirst.py:18-32):
    sliding word windows of width max(option word counts); per window,
    thresholds 100..70 step -10; options in given order; first hit wins."""
    if text is None or not options:
        return None
    all_text = text.lower()
    max_words = max(len(option.split()) for option in options)
    words = all_text.split()
    windows = [" ".join(words[i : i + max_words]) for i in range(len(words) - max_words + 1)]
    if reverse:
        windows = list(reversed(windows))
    for window in windows:
        for threshold in range(100, 69, -10):
            for option in options:
                if len(window) < math.ceil(len(option) * threshold / 100.0):
                    continue
                if threshold >= 100:
                    hit = option in window
                else:
                    hit = _cached_partial_ratio(option, window) >= threshold
                if hit:
                    return option
    return None
