"""Deterministic pattern tagger — NER stand-in for the flair model
(W8/M4 slot; reference NerFirstAppearanceMethod.py:13-49 loads
`ner-ontonotes-large`, which is absent in this container).

The method contract only needs typed spans: train learns the MODE tag
type whose spans contain the label, predict emits the first/last span
of that type. This tagger produces spans from a fixed pattern battery
(dates, countries via the gazetteer, organizations, capitalized person
names, cardinals) — deterministic, no model download, honestly weaker
recall than the real tagger but the same span/type interface, so the
flair model can drop in where available.
"""

from __future__ import annotations

import re

_DATE_RES = [
    re.compile(r"\b\d{1,2}(?:st|nd|rd|th)? (?:of )?[A-Z][a-z]+,? \d{4}\b"),
    re.compile(r"\b[A-Z][a-z]+ \d{1,2},? \d{4}\b"),
    re.compile(r"\b\d{4}-\d{2}-\d{2}\b"),
    re.compile(r"\b\d{1,2}[./]\d{1,2}[./]\d{2,4}\b"),
]
_ORG_KEYWORDS = frozenset(
    """council court commission committee organization organisation assembly
union ministry bank university institute agency office tribunal federation
association party congress senate parliament nations fund programme""".split()
)
_FUNCTION_WORDS = frozenset(
    """the a an of in on at by for with and or to from as is was were be
this that mr mrs ms dr""".split()
)
# role/title words preceding names ("Rapporteur Ana Gomez"): stripped from
# the front of PERSON spans (the real tagger segments these away)
_TITLE_WORDS = frozenset(
    """rapporteur president judge secretary minister professor general
ambassador chairman chairwoman chairperson director commissioner deputy
justice senator governor mayor""".split()
)
_CAP_SEQ_RE = re.compile(r"\b(?:[A-Z][a-zA-Z'\-]+)(?: (?:of|the|for|and|de|la|del)| [A-Z][a-zA-Z'\-]+)*\b")
_ACRONYM_RE = re.compile(r"\b[A-Z]{2,6}\b")
_CARDINAL_RE = re.compile(r"\b\d[\d,.]*\b")


def _countries() -> frozenset:
    from .countries import _VARIANT_TO_CANONICAL

    return frozenset(_VARIANT_TO_CANONICAL)


def tag_spans(text: str) -> list[tuple[str, str]]:
    """→ ordered, non-overlapping (span_text, tag) list. Tags follow the
    OntoNotes names the reference's tagger emits (DATE/GPE/ORG/PERSON/
    CARDINAL) so learned tag types transfer."""
    text = (text or "").replace("\n", " ").replace("\t", " ").strip()
    candidates: list[tuple[int, int, str, str]] = []  # (start, -len, tag, span)

    for rx in _DATE_RES:
        for m in rx.finditer(text):
            candidates.append((m.start(), -(m.end() - m.start()), "DATE", m.group()))

    try:
        countries = _countries()
    except Exception:
        countries = frozenset()
    lowered = text.lower()
    for name in countries:
        start = 0
        while True:
            i = lowered.find(name, start)
            if i < 0:
                break
            # word-boundary check
            before_ok = i == 0 or not lowered[i - 1].isalnum()
            after = i + len(name)
            after_ok = after >= len(lowered) or not lowered[after].isalnum()
            if before_ok and after_ok:
                candidates.append((i, -len(name), "GPE", text[i:after]))
            start = i + 1

    for m in _CAP_SEQ_RE.finditer(text):
        words = m.group().split()
        lower_words = [w.lower() for w in words]
        if all(w in _FUNCTION_WORDS for w in lower_words):
            continue
        content = [w for w in lower_words if w not in _FUNCTION_WORDS]
        if any(w in _ORG_KEYWORDS for w in lower_words):
            candidates.append((m.start(), -len(m.group()), "ORG", m.group()))
        else:
            start = m.start()
            while words and words[0].lower() in _TITLE_WORDS:
                start += len(words[0]) + 1
                words = words[1:]
                lower_words = lower_words[1:]
            content = [w for w in lower_words if w not in _FUNCTION_WORDS]
            if 2 <= len(content) <= 4 and all(
                w[0].isupper() for w in words if w.lower() not in _FUNCTION_WORDS
            ):
                span = " ".join(words)
                candidates.append((start, -len(span), "PERSON", span))

    for m in _ACRONYM_RE.finditer(text):
        candidates.append((m.start(), -(m.end() - m.start()), "ORG", m.group()))

    for m in _CARDINAL_RE.finditer(text):
        candidates.append((m.start(), -(m.end() - m.start()), "CARDINAL", m.group()))

    # longest-first greedy, non-overlapping, in document order
    out: list[tuple[str, str]] = []
    taken: list[tuple[int, int]] = []
    for start, neg_len, tag, span in sorted(candidates):
        end = start - neg_len
        if any(s < end and start < e for s, e in taken):
            continue
        taken.append((start, end))
        out.append((span, tag))
    order = sorted(range(len(taken)), key=lambda i: taken[i][0])
    return [out[i] for i in order]
