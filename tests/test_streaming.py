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
