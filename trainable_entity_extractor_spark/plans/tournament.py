"""Tournament orchestration (O2-O4) + winner manifest.

Reference: use_cases/OrchestratorUseCase.py:110-148 (sequential evaluation,
early-cancel on perfect >= 99.99), use_cases/JobSelectorUseCase.py:9-29
(argmax with perfect short-circuit), use_cases/TrainUseCase.py:16-32
(retrain winner on all data), adapters/LocalModelStorage.py:13-35
(extractor_job.json manifest).
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd

from ..domain import ExtractionContext, ExtractorJob, Performance
from ..extractors.base import ExtractorBase


def run_tournament(
    extractor: ExtractorBase, samples: pd.DataFrame, ctx: ExtractionContext
) -> tuple[list[Performance], str | None]:
    """Evaluate usable methods in METHODS order; stop at the first perfect
    score (the reference cancels remaining sub-jobs the same way)."""
    train_pdf, test_pdf = extractor.prepare_for_training(samples, ctx)
    performances: list[Performance] = []
    for method_cls in extractor.METHODS:
        method = method_cls()
        try:
            if not method.can_be_used(train_pdf, ctx):
                continue
        except Exception:
            continue
        perf = extractor.score_method(method, train_pdf, test_pdf, ctx)
        performances.append(perf)
        if perf.is_perfect:
            break

    best = None
    best_score = -1.0
    for perf in performances:
        if perf.failed:
            continue
        if perf.is_perfect:
            best = perf
            break
        if perf.performance > best_score:
            best_score = perf.performance
            best = perf
    return performances, best.method_name if best else None


def train(
    extractor: ExtractorBase, samples: pd.DataFrame, ctx: ExtractionContext
) -> ExtractorJob:
    """Full fit pipeline (SURVEY §3.1): tournament → retrain winner on ALL
    samples → persist artifact + manifest."""
    performances, winner = run_tournament(extractor, samples, ctx)
    if winner is None:
        raise RuntimeError("No method succeeded in the tournament")

    method = next(m() for m in extractor.METHODS if m.__name__ == winner)
    # the training-prep transform (e.g. EMPTY placeholder rewrite) applies
    # to the winner's full-data retrain too — unconditionally, regardless of
    # how prepare_for_training split the tournament folds
    all_samples = extractor.prepare_samples(samples, ctx)
    artifact = method.fit(all_samples, ctx)

    job = ExtractorJob(
        run_name=ctx.identifier.run_name,
        extraction_name=ctx.identifier.extraction_name,
        extractor_name=extractor.name,
        method_name=winner,
        options=[o.to_dict() for o in ctx.options],
        multi_value=ctx.multi_value,
        languages=ctx.languages,
        performance=next(p.performance for p in performances if p.method_name == winner),
    )
    job.save(ctx.identifier)
    artifact_path = ctx.identifier.get_path() / winner / "artifact.json"
    artifact_path.parent.mkdir(parents=True, exist_ok=True)
    artifact_path.write_text(json.dumps(artifact))
    return job


def load_artifact(ctx: ExtractionContext, method_name: str) -> dict:
    path = ctx.identifier.get_path() / method_name / "artifact.json"
    if path.exists():
        return json.loads(path.read_text())
    return {}
