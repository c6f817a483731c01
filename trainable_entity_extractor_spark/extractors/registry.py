"""The four concrete extractors + dispatch cascade (O1).

Reference: drivers/TrainableEntityExtractor.py:32-37 fixed priority order
Pdf→MultiOption, Text→MultiOption, Pdf→Text, Text→Text; first extractor
whose can_be_used passes wins (use_cases/TrainUseCase.py:47-59).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..domain import EMPTY_PLACEHOLDER, ExtractionContext
from ..methods.pdf_to_multi_option import PDF_TO_MULTI_OPTION_METHODS
from ..methods.text_to_multi_option import TEXT_TO_MULTI_OPTION_METHODS
from ..methods.text_to_text import TEXT_TO_TEXT_METHODS
from .base import ExtractorBase, get_stratified_split, get_train_test_split


def _has_any_text(samples: pd.DataFrame, column: str) -> bool:
    if column not in samples.columns:
        return False
    return any(bool(x) for x in samples[column].fillna("").tolist())


def _has_segments(samples: pd.DataFrame) -> bool:
    if "segments" not in samples.columns:
        return False
    return any(s is not None and len(s) > 0 for s in samples["segments"])


class PdfToMultiOptionExtractor(ExtractorBase):
    """PdfToMultiOptionExtractor.py: needs options + segment data."""

    METHODS = PDF_TO_MULTI_OPTION_METHODS
    name = "PdfToMultiOptionExtractor"

    def can_be_used(self, samples, ctx) -> bool:
        return bool(ctx.options) and _has_segments(samples)


class TextToMultiOptionExtractor(ExtractorBase):
    """TextToMultiOptionExtractor.py:124-132: needs options + source_text;
    empty texts become the 'EMPTY' placeholder; stratified split override."""

    METHODS = TEXT_TO_MULTI_OPTION_METHODS
    name = "TextToMultiOptionExtractor"

    def can_be_used(self, samples, ctx) -> bool:
        return bool(ctx.options) and _has_any_text(samples, "source_text")

    def prepare_samples(self, samples, ctx):
        samples = samples.copy()
        mask = samples["source_text"].fillna("").str.strip() == ""
        samples.loc[mask, "source_text"] = EMPTY_PLACEHOLDER
        return samples

    def prepare_for_training(self, samples, ctx):
        return get_stratified_split(self.prepare_samples(samples, ctx), ctx)

    def fix_empty_prediction(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "source_text",
            F.when(
                F.trim(F.coalesce(F.col("source_text"), F.lit(""))) == "", F.lit(EMPTY_PLACEHOLDER)
            ).otherwise(F.col("source_text")),
        )


class PdfToTextExtractor(ExtractorBase):
    """PdfToTextExtractor.py: segment input, free-text output. Methods are
    stand-alone (regex over 2-segment windows, first/last date) plus the
    selector × text-method cross product (pdf_to_text_method_builder.py)."""

    from ..methods.pdf_to_text import PDF_TO_TEXT_METHODS

    METHODS = PDF_TO_TEXT_METHODS
    name = "PdfToTextExtractor"

    def can_be_used(self, samples, ctx) -> bool:
        return not ctx.options and _has_segments(samples)

    def prepare_for_training(self, samples, ctx):
        """Reference split (PdfToTextExtractor.get_train_test_sets:97-137):
        prefer samples whose segments carry labels (ml_label as the
        label-box analog); <=10 samples → train=test=all."""
        import pandas as pd_mod

        n = len(samples)
        if n <= 10:
            return samples, samples
        has_labels = samples["segments"].apply(
            lambda segs: any(s.get("ml_label") for s in (segs or []))
        )
        labeled = samples[has_labels]
        if len(labeled) < 2:
            return get_train_test_split(samples)
        if len(labeled) < 10:
            return labeled, samples
        train_size = int(n * 0.7)
        if len(labeled) >= train_size:
            return labeled.iloc[:train_size], pd_mod.concat(
                [labeled.iloc[train_size:], samples[~has_labels]]
            )
        return get_train_test_split(samples)


class TextToTextExtractor(ExtractorBase):
    """TextToTextExtractor.py:41-56."""

    METHODS = TEXT_TO_TEXT_METHODS
    name = "TextToTextExtractor"

    def can_be_used(self, samples, ctx) -> bool:
        return not ctx.options and (
            _has_any_text(samples, "source_text") or _has_segments(samples)
        )


EXTRACTORS: list[ExtractorBase] = [
    PdfToMultiOptionExtractor(),
    TextToMultiOptionExtractor(),
    PdfToTextExtractor(),
    TextToTextExtractor(),
]


def pick_extractor(samples: pd.DataFrame, ctx: ExtractionContext) -> ExtractorBase | None:
    for extractor in EXTRACTORS:
        if extractor.can_be_used(samples, ctx):
            return extractor
    return None


def extractor_by_name(name: str) -> ExtractorBase:
    for extractor in EXTRACTORS:
        if extractor.name == name:
            return extractor
    raise ValueError(f"Extractor {name} not found")
