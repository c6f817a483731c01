"""Streaming adapter test: foreachBatch over a file source reuses the
batch triple-extraction stage and lands manifested output."""

import json
from pathlib import Path

from trainable_entity_extractor_spark.kg.triples import options_df
from trainable_entity_extractor_spark.sources.synth_pages import PHRASES, synth_pages
from trainable_entity_extractor_spark.streaming.micro_batch import stream_pages_to_triples


def test_stream_available_now(spark, tmp_path):
    input_path = str(tmp_path / "pages")
    synth_pages(spark, 200, seed=42).write.parquet(input_path)
    opts = options_df(spark, [(str(i + 1), p) for i, p in enumerate(PHRASES)])

    q = stream_pages_to_triples(
        spark,
        input_path,
        str(tmp_path / "triples"),
        str(tmp_path / "ckpt"),
        opts,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "triples"))
    assert out.count() > 0
    manifest = json.loads((tmp_path / "triples" / "_manifest.json").read_text())
    assert manifest["partitions"]


def test_stateful_first_seen_across_micro_batches(spark, tmp_path):
    """applyInPandasWithState dedup: keys repeated in a LATER micro-batch
    (separate input file → separate trigger) must be suppressed by state,
    not just within-batch logic."""
    import pandas as pd

    from trainable_entity_extractor_spark.streaming.micro_batch import (
        stream_first_seen_mentions,
    )

    input_path = tmp_path / "mentions"
    batch1 = pd.DataFrame({"mention_id": ["a", "b", "c"], "payload": [1, 2, 3]})
    batch2 = pd.DataFrame({"mention_id": ["b", "c", "d"], "payload": [20, 30, 4]})
    spark.createDataFrame(batch1).coalesce(1).write.parquet(str(input_path / "f1"))
    spark.createDataFrame(batch2).coalesce(1).write.parquet(str(input_path / "f2"))
    # flatten into one directory of files (one file per original frame)
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    import os
    import time as _time

    base = _time.time() - 1000
    for i, sub in enumerate(sorted(input_path.iterdir())):
        for f in sub.glob("*.parquet"):
            dest = flat / f"part-{i}.parquet"
            shutil.copy(f, dest)
            # the file source orders micro-batches by modification time —
            # pin mtimes so batch1 genuinely precedes batch2
            os.utime(dest, (base + i, base + i))

    q = stream_first_seen_mentions(
        spark, str(flat), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r["mention_id"]: r["payload"] for r in out.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    # b and c keep their FIRST payloads; later duplicates suppressed
    assert rows["b"] == 2 and rows["c"] == 3 and rows["d"] == 4
