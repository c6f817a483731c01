"""Regex induction from examples — a from-scratch replacement for the tdda
`rexpy.extract` dependency the reference uses (RegexMethod.py:13-18,
RegexSubtractionMethod.py, FirstWordRegex.py:44-50). Not a port: a small
run-length generalizer sufficient for the reference's usage pattern
(structured codes, ids, boilerplate prefixes).

Contract mirrored from rexpy: `extract(examples) -> list[str]` where each
regex is anchored `^...$`; the reference strips the first and last chars
(`regex[1:-1]`) to unanchor, so we emit the same anchored shape.
"""

from __future__ import annotations

import re


def _char_class(ch: str) -> str:
    if ch.isdigit():
        return r"\d"
    if ch.isalpha():
        return "[A-Za-z]" if ch.isascii() else r"\w"
    if ch.isspace():
        return r"\s"
    return re.escape(ch)


def _tokenize(example: str) -> list[tuple[str, int]]:
    """Run-length encode into (char_class, length) tokens."""
    tokens: list[tuple[str, int]] = []
    for ch in example:
        cls = _char_class(ch)
        if tokens and tokens[-1][0] == cls:
            tokens[-1] = (cls, tokens[-1][1] + 1)
        else:
            tokens.append((cls, 1))
    return tokens


def _pattern_for_group(token_lists: list[list[tuple[str, int]]]) -> str:
    """All lists share the same class sequence; merge lengths."""
    parts = []
    n_tokens = len(token_lists[0])
    for i in range(n_tokens):
        cls = token_lists[0][i][0]
        lengths = [tl[i][1] for tl in token_lists]
        lo, hi = min(lengths), max(lengths)
        if lo == hi == 1:
            parts.append(cls)
        elif lo == hi:
            parts.append(f"{cls}{{{lo}}}")
        else:
            parts.append(f"{cls}{{{lo},{hi}}}")
    return "^" + "".join(parts) + "$"


def extract(examples: list[str]) -> list[str]:
    """Induce anchored regexes covering all non-empty examples.

    Examples whose char-class run sequence matches are merged into one
    pattern with {min,max} quantifiers; distinct shapes yield distinct
    patterns (rexpy behaves the same way: one regex per structural shape).
    """
    groups: dict[tuple[str, ...], list[list[tuple[str, int]]]] = {}
    order: list[tuple[str, ...]] = []
    for example in examples:
        if example is None or example == "":
            continue
        tokens = _tokenize(example)
        key = tuple(cls for cls, _ in tokens)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(tokens)

    return [_pattern_for_group(groups[key]) for key in order]
