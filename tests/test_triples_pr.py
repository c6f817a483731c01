"""The north-rule correctness gate: precision/recall >= 0.95 of the Spark
pipeline's emitted triples versus a pure-Python oracle implementing the
reference extractor's semantics (FuzzyAll family, FuzzyAll100.py:23-41) on
a labeled synthetic corpus with typo noise (FIXTURES.md §6).

The oracle is the same decision procedure the reference's own e2e tests
assert (test_end_to_end.py), so matching it at P/R >= 0.95 is the sandbox
equivalent of matching the reference's outputs on its labeled fixtures.
"""

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trainable_entity_extractor_spark.functions.fuzzy import partial_ratio
from trainable_entity_extractor_spark.kg.triples import extract_triples, options_df

OPTIONS = [
    ("1", "universal periodic review"),
    ("2", "human rights violations"),
    ("3", "sustainable development goals"),
    ("4", "freedom of expression"),
    ("5", "climate change mitigation"),
]

FILLER = (
    "the committee noted that several delegations expressed concern regarding "
    "implementation of the programme budget and requested further details on "
    "administrative arrangements for the forthcoming session"
).split()


def _typo(word: str, rng: random.Random) -> str:
    if len(word) < 4:
        return word
    i = rng.randrange(1, len(word) - 1)
    return word[:i] + word[i + 1 :]  # deletion


def build_corpus(n_docs: int = 120, seed: int = 7):
    """Labeled docs: filler + 0-3 embedded option phrases, 30% with typos."""
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        segments = []
        for s in range(rng.randrange(2, 5)):
            words = [rng.choice(FILLER) for _ in range(rng.randrange(6, 14))]
            if rng.random() < 0.55:
                phrase = rng.choice(OPTIONS)[1]
                pwords = phrase.split()
                if rng.random() < 0.30:  # typo noise
                    pwords = [_typo(w, rng) for w in pwords]
                insert_at = rng.randrange(len(words) + 1)
                words = words[:insert_at] + pwords + words[insert_at:]
            segments.append(" ".join(words))
        docs.append((f"doc{d:04d}", segments))
    return docs


def oracle_triples(docs, threshold: float = 88.0):
    """Reference FuzzyAll semantics (longest-first, consumption, length
    guard, partial_ratio >= threshold), pure Python."""
    labels_sorted = sorted((label.lower() for _, label in OPTIONS), key=len, reverse=True)
    label_to_id = {label.lower(): oid for oid, label in OPTIONS}
    out = set()
    for doc_id, segments in docs:
        matched = set()
        for seg in segments:
            text = " ".join(seg.lower().split())
            for option in labels_sorted:
                if option in matched:
                    continue
                if len(text) < math.ceil(len(option) * threshold / 100.0):
                    continue
                if partial_ratio(option, text, threshold) >= threshold:
                    matched.add(option)
                    out.add((doc_id, label_to_id[option]))
                if option in text:
                    text = text.replace(option, "")
    return out


def test_triples_precision_recall_gate(spark):
    docs = build_corpus()
    rows = [
        {"url": doc_id, "seg_idx": i, "page": 1, "text": seg}
        for doc_id, segments in docs
        for i, seg in enumerate(segments)
    ]
    segments_df = spark.createDataFrame(pd.DataFrame(rows))
    opts = options_df(spark, OPTIONS)

    spark_triples = {
        (r["subj"], r["obj_id"])
        for r in extract_triples(segments_df, opts, "phrase", threshold=88.0).collect()
    }
    expected = oracle_triples(docs, threshold=88.0)
    assert expected, "oracle produced no triples — corpus misconfigured"

    tp = len(spark_triples & expected)
    precision = tp / len(spark_triples) if spark_triples else 0.0
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"
    # deterministic kernels on both sides should in fact be exact:
    assert precision == 1.0 and recall == 1.0
