"""Method contract (reference ports/MethodBase.py:9-52 — the 4-call surface
can_be_used / train / predict / get_performance).

Spark-first split: `fit` runs on the driver over a small pandas frame (the
reference trains on <=hundreds of samples by design — e.g. caps at
FastSegmentSelectorFuzzy95.py:52-53, TextSingleLabelSetFit.py:71) and
returns a JSON-serializable artifact. `predict_pandas` is the bulk kernel:
it takes an Arrow batch as a pandas DataFrame and is applied distributed
via mapInPandas (see extractors/spark_predict.py). No per-row Python UDFs.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from ..domain import ExtractionContext


def input_texts_by_lines(row: dict) -> list[str]:
    """Reference PredictionSample.get_input_text_by_lines
    (domain/PredictionSample.py:26-33): source_text wins, else segment
    texts, else ''."""
    source_text = row.get("source_text")
    if source_text:
        return [source_text]
    segments = row.get("segments")
    if segments is not None and len(segments) > 0:
        return [s["text"] for s in segments]
    return [""]


def input_text(row: dict) -> str:
    return " ".join(input_texts_by_lines(row))


class MethodBase:
    """kind: 'to_text' methods emit a string per row; 'multi_option' methods
    emit list[{id,label,segment_text}] per row."""

    kind: str = "to_text"

    def name(self) -> str:
        return self.__class__.__name__

    def can_be_used(self, train_pdf: pd.DataFrame, ctx: ExtractionContext) -> bool:
        return True

    def fit(self, train_pdf: pd.DataFrame, ctx: ExtractionContext) -> dict[str, Any]:
        return {}

    def predict_pandas(
        self, pdf: pd.DataFrame, ctx: ExtractionContext, artifact: dict[str, Any]
    ) -> pd.Series:
        raise NotImplementedError
