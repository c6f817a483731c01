"""Validation against the reference's OWN labeled fixtures
(text_to_multi_option_extractor/labeled_data/* — real human-labeled data
committed in the reference tree) — SURVEY §5.5 / north-rule P/R gate.

Two independent checks:
1. the from-scratch fuzzy kernel (bit-parallel LCS + window pruning) is
   verified against a plain-DP re-implementation of the same published
   definition on REAL fixture texts — different algorithm, different
   author-path, so a kernel bug cannot hide in both (de-circularizes the
   P/R gate, which previously oracled the kernel against itself);
2. the full tournament runs over the real fixture tasks and must reach
   the micro-F1 levels the deterministic (non-external-model) method
   family actually achieves there. The reference has no committed result
   tables for these tasks (performance_results/ covers text-to-text and
   segment-selector benchmarks on external corpora), so the bars below
   are this repo's pinned regression levels on identical data/splits.
"""

import json
import math
import tempfile
from pathlib import Path

import pandas as pd
import pytest

from trainable_entity_extractor_spark.domain import (
    ExtractionContext,
    ExtractionIdentifier,
    Option,
)
from trainable_entity_extractor_spark.extractors.registry import TextToMultiOptionExtractor
from trainable_entity_extractor_spark.functions.fuzzy import partial_ratio
from trainable_entity_extractor_spark.plans.tournament import run_tournament

FIXTURES = Path(
    "/root/reference/src/trainable_entity_extractor/adapters/extractors/"
    "text_to_multi_option_extractor/labeled_data"
)

pytestmark = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixture tree not mounted"
)


def load_task(task: str):
    labels = json.loads((FIXTURES / task / "labels.json").read_text())
    options = [Option(x, x) for x in json.loads((FIXTURES / task / "options.json").read_text())]
    rows = [
        {
            "sample_id": str(i),
            "source_text": r["text"],
            "label_text": "",
            "values": [{"id": v, "label": v} for v in r["values"]],
            "language_iso": "es" if "cejil" in task else "en",
            "segments": None,
        }
        for i, r in enumerate(labels)
    ]
    multi = any(len(r["values"]) > 1 for r in labels)
    return pd.DataFrame(rows), options, multi


# ------------------------------------------------------------------
# 1. independent-implementation kernel check on real fixture text
# ------------------------------------------------------------------


def _lcs_dp(a: str, b: str) -> int:
    """Textbook O(m*n) LCS table — deliberately nothing shared with the
    bit-parallel kernel under test."""
    n = len(b)
    prev = [0] * (n + 1)
    for ch in a:
        cur = [0] * (n + 1)
        for j in range(n):
            cur[j + 1] = prev[j] + 1 if ch == b[j] else max(prev[j + 1], cur[j])
        prev = cur
    return prev[n]


def oracle_partial_ratio(needle: str, hay: str) -> float:
    """partial_ratio per the published definition: best indel ratio of the
    shorter string against same-length windows of the longer, plus clipped
    edge windows."""
    if len(needle) > len(hay):
        needle, hay = hay, needle
    m, n = len(needle), len(hay)
    if m == 0:
        return 100.0 if n == 0 else 0.0
    best = 0.0
    for start in range(n - m + 1):
        best = max(best, 100.0 * 2 * _lcs_dp(needle, hay[start : start + m]) / (2 * m))
    for w_len in range(m - 1, 0, -1):
        if 100.0 * 2 * w_len / (m + w_len) <= best:
            break
        for w in (hay[:w_len], hay[n - w_len :]):
            best = max(best, 100.0 * 2 * _lcs_dp(needle, w) / (m + w_len))
    return best


def test_fuzzy_kernel_matches_independent_dp_on_real_fixtures():
    pdf, options, _ = load_task("cejil_president")
    labels = [o.label.lower() for o in options]
    checked = 0
    for _, row in pdf.head(12).iterrows():
        text = " ".join((row["source_text"] or "").split()).lower()[:300]
        for option in labels:
            got = partial_ratio(option, text)
            want = oracle_partial_ratio(option, text)
            assert math.isclose(got, want, abs_tol=1e-9), (option, text[:60], got, want)
            checked += 1
    assert checked >= 100


# ------------------------------------------------------------------
# 2. tournament micro-F1 gates on the real tasks
# ------------------------------------------------------------------


def _run(task: str):
    samples, options, multi = load_task(task)
    ctx = ExtractionContext(
        ExtractionIdentifier(task, output_path=tempfile.mkdtemp()), options, multi
    )
    perfs, winner = run_tournament(TextToMultiOptionExtractor(), samples, ctx)
    best = max((p.performance for p in perfs if not p.failed), default=0.0)
    return winner, best, perfs


def test_cejil_president_tournament():
    winner, best, _ = _run("cejil_president")
    assert best >= 90.0, (winner, best)
    assert winner.startswith("TextFuzzy"), winner  # name-in-text task


def test_cejil_secretary_tournament():
    winner, best, _ = _run("cejil_secretary")
    assert best >= 85.0, (winner, best)
    assert winner.startswith("TextFuzzy"), winner


def test_cejil_judge_tournament():
    winner, best, _ = _run("cejil_judge")
    assert best >= 84.0, (winner, best)


def test_rightdocs_vote_type_tournament():
    """Classification-flavored task: the trainable TF-IDF classifier must
    beat the fuzzy family here (the reference's winner on such tasks is
    its trainable-classifier slot)."""
    winner, best, perfs = _run("rightdocs_vote_type")
    assert best >= 90.0, (winner, best)
    assert winner == "TextTfIdf", winner
    fuzzy_best = max(
        (p.performance for p in perfs if p.method_name.startswith("TextFuzzy")), default=0.0
    )
    assert best > fuzzy_best


# ---------------------------------------------------------------------------
# segment selector on the reference's OWN committed labeled fixture
# ---------------------------------------------------------------------------

REF_XML = Path(
    "/root/reference/src/trainable_entity_extractor/tests/test_files/test.xml"
)


def test_full_segment_selector_on_reference_test_xml():
    """Replicates the reference's TestSegmentSelector.test_set_extraction_segments
    (tests/unit_tests/extractors/segment_selector/test_segment_selector.py:87-100)
    end-to-end on the reference's committed test.xml: label the segment
    under the SegmentBox(left=400, top=115, width=74, height=9, page 1),
    train the selector on that single labeled document, and assert it
    selects exactly the 'Original: English' segment.

    NOTE on coverage: this is the ONLY labeled segment-selector data
    committed in the reference tree. The P/R tables in the reference's
    performance_results/segment_selector.md come from corpora that are
    NOT committed (checked: no adapters/extractors/segment_selector/
    labeled_data exists), so this parity check plus the synthetic P/R
    gate in test_segment_selector_full.py is the strongest reproducible
    evidence available."""
    from trainable_entity_extractor_spark.methods.segment_selector_full import (
        FullSegmentSelector,
    )
    from trainable_entity_extractor_spark.sources.poppler_xml import (
        merge_same_word_tokens,
        parse_tokens,
    )

    if not REF_XML.exists():
        pytest.skip("reference test.xml not mounted")

    # line-level segments, like the reference's PdfData with no
    # xml_segments_boxes (each merged token line is its own segment)
    toks = merge_same_word_tokens(parse_tokens(REF_XML.read_bytes()))
    label_box = (400.0, 115.0, 74.0, 9.0)  # the reference test's SegmentBox

    def overlaps(s):
        l, t, w, h = label_box
        ix = max(0.0, min(l + w, s["left"] + s["width"]) - max(l, s["left"]))
        iy = max(0.0, min(t + h, s["top"] + s["height"]) - max(t, s["top"]))
        return s["page"] == 1 and ix * iy > 0

    doc = [
        {
            "seg_idx": i,
            "page": t["page"],
            "left": float(t["left"]),
            "top": float(t["top"]),
            "width": float(t["width"]),
            "height": float(t["height"]),
            "seg_type": "TEXT",
            "text": (t["text"] or "").strip(),
            "ml_label": 1 if overlaps(t) else 0,
        }
        for i, t in enumerate(toks)
    ]
    assert sum(s["ml_label"] for s in doc) == 1  # exactly one labeled line

    selector = FullSegmentSelector()
    artifact = selector.fit([doc])
    picked = selector.select([dict(s, ml_label=0) for s in doc], artifact)
    assert [s["text"] for s in picked] == ["Original: English"]
