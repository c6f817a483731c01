"""Deterministic multi-locale date search — replacement for the reference's
`dateparser.search_dates` dependency (DateParserMethod.py:32-57), which is
not available in this container. Covers the date shapes the reference's
fixtures exercise (ISO, slashed/dotted numeric, English/Spanish/French
month names), with the reference's dotted-DMY special case for the Slavic/
Baltic language set (DateParserMethod.py:12-13,26-30) and its
letters-preferred best-date pick (DateParserMethod.py:15-24).

Output format matches the reference predict: '%Y-%m-%d'
(DateParserMethod.py:83).
"""

from __future__ import annotations

import datetime
import re

DOTTED_DMY_LANGUAGES = {
    "ru", "uk", "pl", "sk", "bg", "be", "kk", "sr", "hr", "sl", "ro", "lt",
    "lv", "et", "cs", "fi",
}

_MONTHS = {
    # English
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7, "aug": 8,
    "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
    # Spanish
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5, "junio": 6,
    "julio": 7, "agosto": 8, "septiembre": 9, "setiembre": 9, "octubre": 10,
    "noviembre": 11, "diciembre": 12,
    # French
    "janvier": 1, "fevrier": 2, "février": 2, "mars": 3, "avril": 4, "mai": 5,
    "juin": 6, "juillet": 7, "aout": 8, "août": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "decembre": 12, "décembre": 12,
}

_MONTH_RE = "|".join(sorted(_MONTHS, key=len, reverse=True))

# (pattern, builder) — scanned in order, all matches collected by position.
_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\b(\d{4})-(\d{1,2})-(\d{1,2})\b"), "ymd"),
    (re.compile(rf"\b(\d{{1,2}})(?:st|nd|rd|th)?\s+(?:of\s+)?({_MONTH_RE})\s*,?\s+(\d{{4}})\b", re.I), "dmy_name"),
    (re.compile(rf"\b({_MONTH_RE})\s+(\d{{1,2}})(?:st|nd|rd|th)?\s*,?\s+(\d{{4}})\b", re.I), "mdy_name"),
    (re.compile(rf"\b(\d{{1,2}})\s+de\s+({_MONTH_RE})\s+de\s+(\d{{4}})\b", re.I), "dmy_name"),
    (re.compile(r"\b(\d{1,2})/(\d{1,2})/(\d{4})\b"), "num_dmy"),
    (re.compile(r"\b(\d{1,2})\.(\d{1,2})\.(\d{4})\b"), "num_dmy"),
    (re.compile(r"\b(\d{1,2})-(\d{1,2})-(\d{4})\b"), "num_dmy"),
]

DOTTED_DATE_PATTERN = re.compile(r"\b\d{1,2}\.\d{1,2}\.\d{4}\b")


def _build(kind: str, groups: tuple[str, ...], day_first: bool) -> datetime.date | None:
    try:
        if kind == "ymd":
            y, m, d = int(groups[0]), int(groups[1]), int(groups[2])
        elif kind == "dmy_name":
            d, m, y = int(groups[0]), _MONTHS[groups[1].lower()], int(groups[2])
        elif kind == "mdy_name":
            m, d, y = _MONTHS[groups[0].lower()], int(groups[1]), int(groups[2])
        else:  # num_dmy: ambiguous numeric — day-first unless impossible
            a, b, y = int(groups[0]), int(groups[1]), int(groups[2])
            if day_first:
                d, m = a, b
            else:
                m, d = a, b
            if m > 12 and d <= 12:
                d, m = m, d
        return datetime.date(y, m, d)
    except (ValueError, KeyError):
        return None


def search_dates(text: str, languages: list[str] | None = None) -> list[tuple[str, datetime.date]]:
    """Find (matched_text, date) pairs ordered by position in text.

    Numeric dd/mm vs mm/dd: day-first for every language except 'en'
    (mirrors dateparser locale defaults; the fixtures only exercise
    unambiguous or day-first cases).
    """
    if not text:
        return []
    day_first = not (languages and languages[0] == "en")
    found: list[tuple[int, str, datetime.date]] = []
    taken: list[tuple[int, int]] = []
    for pattern, kind in _PATTERNS:
        for m in pattern.finditer(text):
            span = (m.start(), m.end())
            if any(s < span[1] and span[0] < e for s, e in taken):
                continue
            date = _build(kind, m.groups(), day_first)
            if date is not None:
                taken.append(span)
                found.append((m.start(), m.group(), date))
    found.sort(key=lambda x: x[0])
    return [(g, d) for _, g, d in found]


def date_spans(text: str) -> list[dict]:
    """Tag date-like spans as {'text','start','end'} dicts — the
    deterministic stand-in for a neural span tagger's
    `predict_entities(text, ["date"])` output contract (X8). Overlap
    resolution is left to the caller (the reference resolves overlaps
    AFTER windowed tagging, GlinerDateExtractor.py:17-28)."""
    if not text:
        return []
    return [
        {"text": m.group(), "start": m.start(), "end": m.end()}
        for pattern, _ in _PATTERNS
        for m in pattern.finditer(text)
    ]


def get_best_date(dates: list[tuple[str, datetime.date]]) -> datetime.date | None:
    """Reference DateParserMethod.get_best_date: prefer matches containing
    letters; else first match."""
    if not dates:
        return None
    not_numbers = [d for d in dates if re.search("[a-zA-Z]", d[0])]
    if not_numbers:
        return not_numbers[0][1]
    return dates[0][1]


def extract_date(text: str, languages: list[str] | None = None) -> str | None:
    """Full reference get_date pipeline incl. dotted-DMY override
    (DateParserMethod.py:32-57); returns '%Y-%m-%d' or None."""
    if not text:
        return None
    languages = [l for l in (languages or []) if l]
    dates = search_dates(text, languages or None)
    if languages and any(l in DOTTED_DMY_LANGUAGES for l in languages) and DOTTED_DATE_PATTERN.search(text):
        de_dates: list[tuple[str, datetime.date]] = []
        for match in DOTTED_DATE_PATTERN.findall(text):
            de_dates.extend(search_dates(match, ["de"]))
        if de_dates:
            dates = de_dates + (dates or [])
    if not dates:
        dates = search_dates(text)
    best = get_best_date(dates)
    return best.strftime("%Y-%m-%d") if best else None
