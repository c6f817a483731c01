"""X12 HTML context markup tests — mirrors the reference's
tests/unit_tests/domain/test_FormatSegmentText.py intent."""

from trainable_entity_extractor_spark.functions.context_markup import format_segment_text


def test_unlabeled_paragraphs():
    out = format_segment_text(["first", "second"], "")
    assert out == '<p class="ix_paragraph">first</p><p class="ix_paragraph">second</p>'


def test_exact_label_highlight_and_context():
    texts = ["before", "we like apple pie", "after", "unrelated far away"]
    out = format_segment_text(texts, "apple")
    assert '<p class="ix_matching_paragraph">we like <span class="ix_match">apple</span> pie</p>' in out
    assert '<p class="ix_adjacent_paragraph">before</p>' in out
    assert '<p class="ix_adjacent_paragraph">after</p>' in out
    assert "unrelated" not in out  # outside the +-1 context window


def test_fuzzy_label_highlight():
    out = format_segment_text(["the aple tree"], "apple")
    assert '<span class="ix_match">aple</span>' in out


def test_date_component_highlight():
    out = format_segment_text(["signed 5 March 2021 in Geneva"], "2021-03-05")
    assert '<span class="ix_match">5</span>' in out
    assert '<span class="ix_match">March</span>' in out
    assert '<span class="ix_match">2021</span>' in out


def test_html_escaped():
    out = format_segment_text(["a <b> & apple"], "apple")
    assert "&lt;b&gt;" in out and "&amp;" in out


def test_no_match_falls_back_to_plain():
    out = format_segment_text(["nothing here"], "zebra")
    assert out == '<p class="ix_paragraph">nothing here</p>'
