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

    def is_old(self, max_age_days: int = 2) -> bool:
        """True when this extraction's artifact folder exists and hasn't
        been touched for `max_age_days` (ExtractionIdentifier.is_old:52-54
        in the reference: 2-day staleness window)."""
        import os
        import time

        path = self.get_path()
        return (
            path.exists()
            and path.is_dir()
            and os.path.getmtime(path) < time.time() - max_age_days * 24 * 3600
        )

    def ensure_fresh_folder(self, max_age_hours: int = 1) -> Path:
        """Create the artifact folder; if it exists but is older than
        `max_age_hours`, wipe and recreate it (LocalJobExecutor.
        ensure_fresh_model_folder:33-46 — a stale half-written model dir
        from a crashed run must not leak into a new fit)."""
        import os
        import shutil
        import time

        path = self.get_path()
        if path.exists():
            if os.path.getmtime(path) < time.time() - max_age_hours * 3600:
                shutil.rmtree(path)
                path.mkdir(parents=True, exist_ok=True)
        else:
            path.mkdir(parents=True, exist_ok=True)
        return path


def clean_stale_extractions(
    output_path: str = DEFAULT_WORKDIR, run_name: str | None = None, max_age_days: int = 2
) -> list[str]:
    """O7 model-folder hygiene: remove extraction artifact dirs untouched
    for `max_age_days` (the reference wipes these on a timer; here it is
    an explicit idempotent sweep the orchestrator calls between runs).
    Returns the removed paths."""
    import shutil

    base = Path(output_path)
    if not base.exists():
        return []
    removed: list[str] = []
    run_dirs = [base / run_name] if run_name else [d for d in base.iterdir() if d.is_dir()]
    for run_dir in run_dirs:
        if not run_dir.is_dir():
            continue
        for ext_dir in run_dir.iterdir():
            ident = ExtractionIdentifier(
                extraction_name=ext_dir.name, run_name=run_dir.name, output_path=str(base)
            )
            if ident.is_old(max_age_days):
                shutil.rmtree(ext_dir, ignore_errors=True)
                removed.append(str(ext_dir))
    return removed


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
