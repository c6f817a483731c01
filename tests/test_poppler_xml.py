"""Poppler-XML source tests (S1/S2, F2/F3) — runs against the reference's
own XML fixtures when present (read-only), plus synthetic XML."""

import os

import pytest

from trainable_entity_extractor_spark.sources.poppler_xml import (
    filter_pages_xml,
    merge_same_word_tokens,
    parse_tokens,
    remove_superscripts,
    xml_to_segments,
)

REF_XML = "/root/reference/src/trainable_entity_extractor/tests/test_files/test.xml"

SYNTH = b"""<?xml version="1.0" encoding="UTF-8"?>
<pdf2xml producer="poppler" version="23.07.0">
<page number="1" position="absolute" top="0" left="0" height="792" width="612">
\t<fontspec id="0" size="10" family="F" color="#000000"/>
\t<fontspec id="1" size="5" family="F" color="#000000"/>
<text top="50" left="60" width="40" height="12" font="0">Hel</text>
<text top="50" left="100" width="30" height="12" font="0">lo</text>
<text top="50" left="140" width="40" height="12" font="0">world</text>
<text top="52" left="185" width="6" height="6" font="1">1</text>
<text top="80" left="60" width="90" height="12" font="0">Second line</text>
<text top="140" left="60" width="90" height="12" font="0">New paragraph</text>
</page>
<page number="2" position="absolute" top="0" left="0" height="792" width="612">
\t<fontspec id="0" size="10" family="F" color="#000000"/>
<text top="50" left="60" width="80" height="12" font="0">Page two</text>
</page>
</pdf2xml>
"""


def test_parse_and_same_word_merge():
    tokens = merge_same_word_tokens(parse_tokens(SYNTH))
    texts = [t["text"] for t in tokens]
    assert "Hello" in texts  # 'Hel'+'lo' merged (gap 0, same line)
    assert "world" in texts


def test_superscript_removed():
    segs = xml_to_segments(SYNTH)
    first_page_text = " ".join(s["text"] for s in segs if s["page"] == 1)
    assert "1" not in first_page_text.split()  # small-font numeric dropped


def test_paragraph_assembly_and_reading_order():
    segs = xml_to_segments(SYNTH)
    assert [s["seg_idx"] for s in segs] == list(range(len(segs)))
    p1 = [s["text"] for s in segs if s["page"] == 1]
    assert any("Hello world" in t for t in p1)
    assert any("New paragraph" in t for t in p1)
    # 'Second line' groups with the first paragraph or its own — but 'New
    # paragraph' (gap 48px) must start a fresh segment
    assert not any("Second line New paragraph" in t for t in p1)


def test_page_filter():
    segs = xml_to_segments(SYNTH, keep_pages=[2])
    assert {s["page"] for s in segs} == {2}
    assert segs[0]["text"] == "Page two"


def test_blank_and_malformed():
    assert xml_to_segments(b"") == []
    assert xml_to_segments(b"<not-xml") == []


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference fixture absent")
def test_reference_fixture_parses():
    data = open(REF_XML, "rb").read()
    segs = xml_to_segments(data)
    assert len(segs) >= 5
    all_text = " ".join(s["text"] for s in segs)
    assert "United Nations" in all_text
    # determinism
    assert xml_to_segments(data) == segs
    # page filter keeps only requested pages
    one = xml_to_segments(data, keep_pages=[1])
    assert {s["page"] for s in one} == {1}
