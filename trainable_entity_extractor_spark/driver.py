"""Top-level train/predict API — the Spark-native analog of
drivers/TrainableEntityExtractor.py.

train(): validates + sanitizes languages (F16), picks the first usable
extractor (O1), runs the method tournament on the driver (training data is
small by reference design), retrains the winner on all samples, persists
the extractor_job.json manifest.

predict(): loads the manifest, rebuilds the winning method, and applies it
to a Spark DataFrame of prediction samples via Arrow-batched mapInPandas —
this is the bulk path that scales to the full corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .domain import ExtractionContext, ExtractionIdentifier, ExtractorJob, Option
from .extractors.registry import extractor_by_name, pick_extractor
from .functions.text import py_sanitize_language
from .plans import tournament
from .schemas import PREDICTION_SCHEMA


class SparkTrainableEntityExtractor:
    def __init__(self, spark: SparkSession, identifier: ExtractionIdentifier):
        self.spark = spark
        self.identifier = identifier

    # ------------------------------------------------------------ train --

    def train(
        self,
        samples: pd.DataFrame,
        options: list[Option] | None = None,
        multi_value: bool = False,
    ) -> tuple[bool, str]:
        """samples: pandas frame with columns of schemas.SAMPLE_SCHEMA
        (sample_id, source_text, label_text, values, language_iso,
        segments). Returns (success, message)."""
        if samples is None or len(samples) == 0:
            return False, "Training validation failed: no samples"

        samples = samples.copy()
        if "language_iso" in samples.columns:
            samples["language_iso"] = [py_sanitize_language(x) for x in samples["language_iso"]]
        else:
            samples["language_iso"] = "en"
        for col in ("source_text", "label_text"):
            if col not in samples.columns:
                samples[col] = ""
        if "values" not in samples.columns:
            samples["values"] = [[] for _ in range(len(samples))]
        if "segments" not in samples.columns:
            samples["segments"] = None

        languages = sorted(set(samples["language_iso"]))
        ctx = ExtractionContext(
            identifier=self.identifier,
            options=options or [],
            multi_value=multi_value,
            languages=languages,
        )

        extractor = pick_extractor(samples, ctx)
        if extractor is None:
            return False, "No suitable extractors found for training"

        job = tournament.train(extractor, samples, ctx)
        return True, f"Trained {job.extractor_name}/{job.method_name} ({job.performance:.2f})"

    # ---------------------------------------------------------- predict --

    def get_extractor_job(self) -> ExtractorJob:
        return ExtractorJob.load(self.identifier)

    def predict(self, samples_df: DataFrame) -> DataFrame:
        """samples_df: (entity_name, source_text, segments) — returns the
        suggestions DataFrame (SUGGESTIONS_SCHEMA)."""
        job = self.get_extractor_job()
        extractor = extractor_by_name(job.extractor_name)
        ctx = ExtractionContext(
            identifier=self.identifier,
            options=[Option(**o) for o in job.options],
            multi_value=job.multi_value,
            languages=job.languages,
        )
        method = next(m() for m in extractor.METHODS if m.__name__ == job.method_name)
        artifact = tournament.load_artifact(ctx, job.method_name)
        return extractor.get_suggestions_spark(samples_df, method, ctx, artifact)

    def predict_pandas_input(self, rows: list[dict]) -> DataFrame:
        """Convenience: build a prediction DataFrame from plain dicts."""
        pdf = pd.DataFrame(rows)
        for col in ("source_text",):
            if col not in pdf.columns:
                pdf[col] = ""
        if "segments" not in pdf.columns:
            pdf["segments"] = None
        return self.spark.createDataFrame(pdf[["entity_name", "source_text", "segments"]], schema=PREDICTION_SCHEMA)
