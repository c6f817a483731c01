"""Extractor base: train/test split policies (O6), tournament scoring
(A5 micro-F1 / A6 exact-match accuracy), and the Spark bulk-predict
application.

Reference: ports/ExtractorBase.py:60-76 (splits),
TextToMultiOptionMethod.get_performance:50-84 (micro-F1),
ToTextExtractorMethod.get_performance:61-86 (accuracy),
TextToMultiOptionExtractor.get_train_test_sets:134-194 (stratified split).

Fit + tournament run on the driver over small pandas frames (training data
is small by reference design); predict is the bulk path and runs as
mapInPandas over Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collections import OrderedDict

from ..domain import EMPTY_PLACEHOLDER, ExtractionContext, Performance
from ..methods.base import MethodBase
from ..schemas import SUGGESTIONS_SCHEMA

# LRU of live (method, ctx, artifact) broadcasts, keyed by payload md5 —
# see get_suggestions_spark. Bounded so a long-lived session holds at most
# this many broadcast payloads; evicted entries are unpersisted.
_BROADCAST_CACHE: OrderedDict = OrderedDict()
_BROADCAST_CACHE_MAX = 32


def get_train_test_split(samples: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """ports/ExtractorBase.get_train_test_sets:60-76: <8 → train=test=all;
    else train=first 80%; test=last 10 rows if n<15 else last 20%."""
    n = len(samples)
    if n < 8:
        return samples, samples
    train_size = int(n * 0.8)
    train = samples.iloc[:train_size]
    test = samples.iloc[-10:] if n < 15 else samples.iloc[train_size:]
    return train, test


def get_stratified_split(samples: pd.DataFrame, ctx: ExtractionContext) -> tuple[pd.DataFrame, pd.DataFrame]:
    """TextToMultiOptionExtractor split override: when >15% of options have
    no samples, build a label-stratified test set
    (TextToMultiOptionExtractor.py:134-194)."""
    n = len(samples)
    if n < 8:
        return samples, samples

    samples_by_label: dict[str, list[int]] = {o.label: [] for o in ctx.options}
    for idx, row in samples.iterrows():
        for v in row.get("values") or []:
            if v["label"] in samples_by_label:
                samples_by_label[v["label"]].append(idx)

    total = sum(len(v) for v in samples_by_label.values())
    pct_without = (
        (sum(1 for v in samples_by_label.values() if not v) / total) * 100 if total else 0.0
    )
    if pct_without <= 15:
        return get_train_test_split(samples)

    all_idx = list(dict.fromkeys(i for v in samples_by_label.values() for i in v))
    test_idx: set = set()
    for label in sorted(samples_by_label, key=lambda x: len(samples_by_label[x])):
        test_idx.update(samples_by_label[label])
        if all_idx and len(test_idx) / len(all_idx) >= 0.10:
            break
    if len(all_idx) - len(test_idx) < 8:
        test_idx = set(all_idx[: int(len(all_idx) * 0.30)])
    else:
        test_idx.update(all_idx[: int(len(all_idx) * 0.10)])
    train_idx = [i for i in all_idx if i not in test_idx]
    return samples.loc[sorted(train_idx)], samples.loc[sorted(test_idx)]


def micro_f1(truth: list[list[str]], preds: list[list[str]], option_ids: list[str]) -> float:
    """A5: one-hot micro-F1 * 100 over the option space (equivalent to
    sklearn f1_score(average='micro') on one-hot matrices)."""
    tp = fp = fn = 0
    id_set = set(option_ids)
    for t_ids, p_ids in zip(truth, preds):
        t = set(t_ids) & id_set
        p = set(p_ids) & id_set
        tp += len(t & p)
        fp += len(p - t)
        fn += len(t - p)
    denom = 2 * tp + fp + fn
    return 100.0 if denom == 0 else 100.0 * 2 * tp / denom


def exact_match_accuracy(truth: list[str], preds: list[str]) -> float:
    """A6: normalized exact match % (ToTextExtractorMethod.py:79-86)."""
    if not truth:
        return 0.0
    clean = lambda t: " ".join((t or "").split())
    correct = sum(1 for t, p in zip(truth, preds) if clean(t) == clean(p))
    return 100.0 * correct / len(truth)


class ExtractorBase:
    METHODS: list[type[MethodBase]] = []
    name = "ExtractorBase"

    def can_be_used(self, samples: pd.DataFrame, ctx: ExtractionContext) -> bool:
        raise NotImplementedError

    def prepare_samples(self, samples: pd.DataFrame, ctx: ExtractionContext) -> pd.DataFrame:
        """Training-prep transform applied to EVERY frame that reaches a
        method's fit — both tournament splits and the winner's full-data
        retrain (the reference applies e.g. the EMPTY placeholder to all
        data, TextToMultiOptionExtractor.py:90). Identity by default."""
        return samples

    def prepare_for_training(self, samples: pd.DataFrame, ctx: ExtractionContext):
        return get_train_test_split(self.prepare_samples(samples, ctx))

    # ---------------- tournament scoring (driver-side, small data) --------

    def score_method(
        self,
        method: MethodBase,
        train_pdf: pd.DataFrame,
        test_pdf: pd.DataFrame,
        ctx: ExtractionContext,
    ) -> Performance:
        import time

        start = time.time()
        try:
            artifact = method.fit(train_pdf, ctx)
            preds = method.predict_pandas(test_pdf, ctx, artifact)
            if method.kind == "multi_option":
                truth = [[v["id"] for v in (row or [])] for row in test_pdf["values"]]
                pred_ids = [[v["id"] for v in (p or [])] for p in preds]
                score = micro_f1(truth, pred_ids, [o.id for o in ctx.options])
            else:
                score = exact_match_accuracy(test_pdf["label_text"].tolist(), preds.tolist())
            return Performance(method.name(), score, time.time() - start)
        except Exception:  # a failing method loses the tournament, not the job
            return Performance(method.name(), 0.0, time.time() - start, failed=True)

    # ---------------- bulk predict (Spark, Arrow-vectorized) --------------

    def fix_empty_prediction(self, df: DataFrame) -> DataFrame:
        return df

    def get_suggestions_spark(
        self, df: DataFrame, method: MethodBase, ctx: ExtractionContext, artifact: dict
    ) -> DataFrame:
        """Apply a fitted method to a prediction DataFrame
        (entity_name, source_text, segments) → suggestions DataFrame.

        mapInPandas keeps the kernel Arrow-batched; the method object,
        context and artifact travel to executors as an explicit
        sparkContext.broadcast (one torrent transfer per executor) instead
        of being closure-serialized into every task — a FuzzyCommas alias
        dict or regex list can reach MBs, and per-task closures triggered
        'task of very large size' warnings in the round-1 bench.
        """
        df = self.fix_empty_prediction(df)
        # cloudpickle, not plain pickle: composed methods are dynamically
        # built classes (pdf_to_text_method_builder analog) that the stdlib
        # pickler can't resolve by module attribute lookup
        from pyspark import cloudpickle

        # one broadcast per distinct (method, ctx, artifact) payload, not
        # per infer call: tournaments call this per method × split, and a
        # never-unpersisted broadcast per call leaks driver/executor
        # broadcast storage across a long session. Content-keyed (md5 of
        # the pickled bytes), so identical re-infers reuse the torrent.
        import hashlib

        payload = cloudpickle.dumps((method, ctx, artifact))
        sc = df.sparkSession.sparkContext
        # applicationId in the key: a broadcast is only valid within the
        # SparkContext that created it (bench/tests start several sessions)
        key = (sc.applicationId, hashlib.md5(payload).hexdigest())
        cached = _BROADCAST_CACHE.get(key)
        if cached is None:
            if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
                _, old = _BROADCAST_CACHE.popitem(last=False)
                try:
                    old.unpersist()
                except Exception:
                    pass  # session may already be gone
            cached = sc.broadcast(payload)
            _BROADCAST_CACHE[key] = cached
        state_bc = cached
        for col in ("source_text", "segments"):
            if col not in df.columns:
                df = df.withColumn(col, F.lit(None).cast("string" if col == "source_text" else "array<struct<seg_idx:int,page:int,left:double,top:double,width:double,height:double,seg_type:string,text:string,ml_label:int>>"))

        kind = method.kind
        multi_value = ctx.multi_value

        use_context_from_end = "End" in method.name()  # Suggestion.py:156

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..functions.context_markup import format_segment_text

            SCALE_RATIO = 0.75  # SegmentBox.py:10
            from pyspark import cloudpickle as _cp

            bc_method, bc_ctx, bc_artifact = _cp.loads(state_bc.value)

            for pdf in batches:
                preds = bc_method.predict_pandas(pdf, bc_ctx, bc_artifact)
                if kind == "multi_option":
                    values, pages, boxes_col, seg_texts = [], [], [], []
                    for (_, row), p in zip(pdf.iterrows(), preds):
                        vals = list(p or [])
                        if not multi_value:
                            vals = vals[:1]
                        source_text = row.get("source_text") or ""
                        segments = list(row.get("segments") or [])
                        # context segments = those whose text matches a value
                        # context (our kernels don't mutate ml_label in place)
                        contexts = {v.get("segment_text") for v in vals if v.get("segment_text")}
                        ctx_segs = [s for s in segments if (s.get("text") or "") in contexts]
                        page = int(ctx_segs[0]["page"]) if ctx_segs and ctx_segs[0].get("page") else 1
                        boxes = [
                            {
                                "left": round((s.get("left") or 0.0) / SCALE_RATIO, 0),
                                "top": round((s.get("top") or 0.0) / SCALE_RATIO, 0),
                                "width": round((s.get("width") or 0.0) / SCALE_RATIO, 0),
                                "height": round((s.get("height") or 0.0) / SCALE_RATIO, 0),
                                "page_number": int(s.get("page") or 1),
                            }
                            for s in ctx_segs
                        ]
                        out_vals = [
                            {
                                "id": v["id"],
                                "label": v["label"],
                                "segment_text": format_segment_text(
                                    [v.get("segment_text") or source_text], v["label"]
                                ),
                            }
                            for v in vals
                        ]
                        values.append(out_vals)
                        pages.append(page)
                        boxes_col.append(boxes)
                        seg_texts.append(out_vals[0]["segment_text"] if out_vals else None)
                    yield pd.DataFrame(
                        {
                            "entity_name": pdf["entity_name"],
                            "values": values,
                            "text": None,
                            "segment_text": seg_texts,
                            "page_number": pages,
                            "segments_boxes": boxes_col,
                        }
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "entity_name": pdf["entity_name"],
                            "values": [[] for _ in range(len(pdf))],
                            "text": preds,
                            "segment_text": pdf["source_text"].fillna(""),
                            "page_number": None,
                            "segments_boxes": [[] for _ in range(len(pdf))],
                        }
                    )

        return df.mapInPandas(run, schema=SUGGESTIONS_SCHEMA)
