"""Poppler pdf2xml source (S1/S2 + token filters F2/F3).

Reference behavior: domain/PdfData.py:77-97 parses poppler XML into a
token stream, then assembles segments (same-word merge F3 at
PdfData.py:152-175, superscript removal F2 at :112-150);
use_cases/FilterValidSegmentsPagesUseCase.py:120-140 drops <page> blocks
outside a keep-list before parsing (the predicate-pushdown analog).

From-scratch realization: xml.etree token parse + deterministic line/
paragraph assembly (vertical-overlap line clustering, gap-based paragraph
breaks). Runs per document inside Arrow-batched kernels; blank/missing
XML yields an empty document (reference blank fallback).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_PAGE_BLOCK_RE = re.compile(rb"<page\s+number=\"(\d+)\".*?</page>", re.S)


def filter_pages_xml(xml_bytes: bytes, keep_pages: list[int]) -> bytes:
    """S2: drop <page> blocks not in the keep-list (regex surgery on the
    raw XML, like FilterValidSegmentsPagesUseCase.py:120-140)."""
    keep = set(keep_pages)

    def repl(m: re.Match) -> bytes:
        return m.group(0) if int(m.group(1)) in keep else b""

    return _PAGE_BLOCK_RE.sub(repl, xml_bytes)


def parse_tokens(xml_bytes: bytes) -> list[dict]:
    """pdf2xml → token dicts (page, top, left, width, height, font_size,
    text). Malformed/blank input → []."""
    if not xml_bytes:
        return []
    try:
        root = ET.fromstring(xml_bytes.decode("utf-8", "replace"))
    except ET.ParseError:
        return []
    tokens = []
    for page in root.iter("page"):
        page_no = int(page.get("number", "1"))
        fonts = {
            f.get("id"): float(f.get("size", "10")) for f in page.iter("fontspec")
        }
        for t in page.iter("text"):
            text = "".join(t.itertext())
            if not text.strip():
                continue
            tokens.append(
                {
                    "page": page_no,
                    "top": float(t.get("top", "0")),
                    "left": float(t.get("left", "0")),
                    "width": float(t.get("width", "0")),
                    "height": float(t.get("height", "0")),
                    "font_size": fonts.get(t.get("font"), 10.0),
                    "text": text,
                }
            )
    return tokens


def merge_same_word_tokens(tokens: list[dict]) -> list[dict]:
    """F3 (PdfData.py:152-175): merge consecutive tokens with vertical
    intersection >= 4px and horizontal gap <= 1px (split words)."""
    out: list[dict] = []
    for tok in tokens:
        if out:
            prev = out[-1]
            v_inter = min(prev["top"] + prev["height"], tok["top"] + tok["height"]) - max(
                prev["top"], tok["top"]
            )
            h_gap = tok["left"] - (prev["left"] + prev["width"])
            if prev["page"] == tok["page"] and v_inter >= 4 and -1 <= h_gap <= 1:
                merged = dict(prev)
                merged["text"] = prev["text"] + tok["text"]
                merged["width"] = tok["left"] + tok["width"] - prev["left"]
                merged["height"] = max(prev["height"], tok["height"])
                merged["top"] = min(prev["top"], tok["top"])
                out[-1] = merged
                continue
        out.append(dict(tok))
    return out


def remove_superscripts(tokens: list[dict]) -> list[dict]:
    """F2 (PdfData.py:112-150): when the font-size spread within a group
    is >= 1.5, drop smallest-font numeric tokens < 999 unless leftmost."""
    if not tokens:
        return tokens
    sizes = [t["font_size"] for t in tokens]
    if max(sizes) - min(sizes) < 1.5:
        return tokens
    smallest = min(sizes)
    leftmost = min(tokens, key=lambda t: t["left"])
    kept = []
    for t in tokens:
        text = t["text"].strip()
        is_small_numeric = (
            t["font_size"] == smallest
            and text.isdigit()
            and int(text) < 999
            and t is not leftmost
        )
        if not is_small_numeric:
            kept.append(t)
    return kept


def assemble_segments(tokens: list[dict], line_gap: float = 4.0, para_gap_ratio: float = 1.6) -> list[dict]:
    """Tokens → reading-order segments: cluster into lines by vertical
    overlap, then group lines into paragraphs when the vertical gap stays
    under para_gap_ratio x median line height. Deterministic."""
    if not tokens:
        return []
    segments: list[dict] = []
    for page in sorted({t["page"] for t in tokens}):
        page_tokens = sorted(
            (t for t in tokens if t["page"] == page), key=lambda t: (t["top"], t["left"])
        )
        # line clustering
        lines: list[list[dict]] = []
        for tok in page_tokens:
            if lines:
                last = lines[-1]
                ref = min(x["top"] for x in last)
                if abs(tok["top"] - ref) <= line_gap:
                    last.append(tok)
                    continue
            lines.append([tok])
        line_heights = sorted(max(x["height"] for x in ln) for ln in lines)
        median_h = line_heights[len(line_heights) // 2]

        # paragraph grouping
        paras: list[list[list[dict]]] = []
        prev_bottom = None
        for ln in lines:
            top = min(x["top"] for x in ln)
            bottom = max(x["top"] + x["height"] for x in ln)
            if prev_bottom is not None and (top - prev_bottom) <= para_gap_ratio * median_h and paras:
                paras[-1].append(ln)
            else:
                paras.append([ln])
            prev_bottom = bottom

        for para in paras:
            toks = [t for ln in para for t in sorted(ln, key=lambda x: x["left"])]
            toks = remove_superscripts(toks)
            if not toks:
                continue
            text = " ".join(" ".join(t["text"].split()) for t in toks if t["text"].strip())
            if not text:
                continue
            left = min(t["left"] for t in toks)
            top = min(t["top"] for t in toks)
            segments.append(
                {
                    "page": page,
                    "left": left,
                    "top": top,
                    "width": max(t["left"] + t["width"] for t in toks) - left,
                    "height": max(t["top"] + t["height"] for t in toks) - top,
                    "seg_type": "TEXT",
                    "text": text,
                    "ml_label": 0,
                }
            )
    for i, seg in enumerate(segments):
        seg["seg_idx"] = i
    return segments


def xml_to_segments(xml_bytes: bytes, keep_pages: list[int] | None = None) -> list[dict]:
    """Full S1(+S2) path: optional page filter → tokens → same-word merge
    → segment assembly. Pure and deterministic (byte-identical per input)."""
    if keep_pages is not None:
        xml_bytes = filter_pages_xml(xml_bytes or b"", keep_pages)
    tokens = parse_tokens(xml_bytes)
    tokens = merge_same_word_tokens(tokens)
    return assemble_segments(tokens)
