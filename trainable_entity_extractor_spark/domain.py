"""Driver-side domain objects (light dataclasses; the bulk data lives in
Spark DataFrames — see schemas.py).

Mirrors reference pydantic models: Option (domain/Option.py:4-7),
ExtractionIdentifier (domain/ExtractionIdentifier.py:14-19),
TrainableEntityExtractorJob (domain/TrainableEntityExtractorJob.py:6-17),
Performance (domain/Performance.py:4-12).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

DEFAULT_WORKDIR = os.environ.get("TEE_SPARK_MODELS_DIR", "/tmp/tee_spark_models")

PERFECT_SCORE = 99.99  # early-exit threshold (ports/ExtractorBase.py:152)
EMPTY_PLACEHOLDER = "EMPTY"  # TextToMultiOptionExtractor.py:90


@dataclasses.dataclass(frozen=True)
class Option:
    id: str
    label: str

    def to_dict(self) -> dict:
        return {"id": self.id, "label": self.label}


@dataclasses.dataclass(frozen=True)
class ExtractionIdentifier:
    extraction_name: str
    run_name: str = "default"
    output_path: str = DEFAULT_WORKDIR

    def get_path(self) -> Path:
        return Path(self.output_path, self.run_name, self.extraction_name)


@dataclasses.dataclass
class ExtractionContext:
    """Per-extraction config carried through fit/predict — the analog of
    (ExtractionIdentifier, options, multi_value, languages)."""

    identifier: ExtractionIdentifier
    options: list[Option] = dataclasses.field(default_factory=list)
    multi_value: bool = False
    languages: list[str] = dataclasses.field(default_factory=list)

    @property
    def option_labels(self) -> list[str]:
        return [o.label for o in self.options]


@dataclasses.dataclass
class Performance:
    method_name: str
    performance: float = 0.0
    seconds: float = 0.0
    failed: bool = False

    @property
    def is_perfect(self) -> bool:
        return self.performance >= PERFECT_SCORE


@dataclasses.dataclass
class ExtractorJob:
    """Persisted winner manifest (reference TrainableEntityExtractorJob +
    LocalModelStorage.upload_model writing extractor_job.json)."""

    run_name: str
    extraction_name: str
    extractor_name: str
    method_name: str
    options: list[dict] = dataclasses.field(default_factory=list)
    multi_value: bool = False
    languages: list[str] = dataclasses.field(default_factory=list)
    performance: float = 0.0

    def save(self, identifier: ExtractionIdentifier) -> Path:
        path = identifier.get_path() / "extractor_job.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(dataclasses.asdict(self), indent=2))
        return path

    @staticmethod
    def load(identifier: ExtractionIdentifier) -> "ExtractorJob":
        path = identifier.get_path() / "extractor_job.json"
        return ExtractorJob(**json.loads(path.read_text()))
