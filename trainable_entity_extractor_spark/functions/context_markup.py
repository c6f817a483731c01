"""HTML context markup for suggestion values (X12 — reference
domain/FormatSegmentText.py:14-183 defines the output contract:
`<p class="ix_paragraph|ix_matching_paragraph|ix_adjacent_paragraph">`
paragraphs with `<span class="ix_match">` highlights; ISO dates are
highlighted by component (year / month name / day variants)).

Pure string assembly — runs inside the suggestion-building pandas kernel.
Fuzzy fallback uses our Indel ratio (>=75) in place of rapidfuzz.
"""

from __future__ import annotations

import re
from html import escape

from .fuzzy import indel_ratio

_MONTHS = [
    "", "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def _date_parts(label: str) -> tuple[str, str, list[str]] | None:
    bits = label.split("-")
    if len(bits) != 3:
        return None
    year, month, day = bits
    if not (year.isdigit() and len(year) == 4 and month.isdigit() and day.isdigit()):
        return None
    if not (1 <= int(month) <= 12 and 1 <= int(day) <= 31):
        return None
    day_variants = [str(int(day)), day.zfill(2)] if int(day) < 10 else [day]
    return year, _MONTHS[int(month)], day_variants


def _fuzzy_span(label: str, text: str) -> tuple[int, int] | None:
    """Best >=75-scoring span: word-level first, then substring sweep."""
    lo, hi = max(1, len(label) - 2), min(len(text), len(label) + 5)
    best, best_score = None, 0.0
    for m in re.finditer(r"\b[\w\-_.]+\b", text):
        word = m.group()
        if lo <= len(word) <= hi:
            score = indel_ratio(label.lower(), word.lower())
            if score >= 75 and score > best_score:
                best, best_score = (m.start(), m.end()), score
    if best:
        return best
    for start in range(len(text)):
        for length in range(lo, min(hi + 1, len(text) - start + 1)):
            score = indel_ratio(label.lower(), text[start : start + length].lower())
            if score >= 75 and score > best_score:
                best, best_score = (start, start + length), score
    return best


def _highlight_spans(text: str, spans: list[tuple[int, int]]) -> str:
    parts, last = [], 0
    for start, end in sorted(spans):
        if start < last:
            continue
        parts.append(escape(text[last:start]))
        parts.append(f'<span class="ix_match">{escape(text[start:end])}</span>')
        last = end
    parts.append(escape(text[last:]))
    return "".join(parts)


def format_segment_text(texts: list[str], label: str = "") -> str:
    """Render context paragraphs with label/date highlighting (the
    reference's FormatSegmentText.get_text contract)."""
    texts = [t for t in (texts or [])]
    if not texts or not any(texts):
        return ""
    label = (label or "").strip()
    if not label:
        return "".join(f'<p class="ix_paragraph">{escape(t)}</p>' for t in texts)

    date = _date_parts(label)
    if date:
        year, month_name, day_variants = date
        components = [c for c in [year, month_name, *day_variants] if c]
        patterns = [re.compile(r"\b" + re.escape(c) + r"\b", re.IGNORECASE) for c in components]

        def spans_of(text: str) -> list[tuple[int, int]]:
            return sorted((m.start(), m.end()) for p in patterns for m in p.finditer(text))

    else:
        exact = re.compile(re.escape(label), re.IGNORECASE)

        def spans_of(text: str) -> list[tuple[int, int]]:
            hits = [(m.start(), m.end()) for m in exact.finditer(text)]
            if hits:
                return hits
            fz = _fuzzy_span(label, text)
            return [fz] if fz else []

    match_idx = [i for i, t in enumerate(texts) if t and spans_of(t)]
    if not match_idx:
        return "".join(f'<p class="ix_paragraph">{escape(t)}</p>' for t in texts)

    context = sorted({j for i in match_idx for j in (i - 1, i, i + 1) if 0 <= j < len(texts)})
    match_set = set(match_idx)
    out = []
    for i in context:
        text = texts[i]
        if i in match_set:
            out.append(f'<p class="ix_matching_paragraph">{_highlight_spans(text, spans_of(text))}</p>')
        else:
            out.append(f'<p class="ix_adjacent_paragraph">{escape(text)}</p>')
    return "".join(out)
