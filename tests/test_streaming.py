"""Streaming adapter test: foreachBatch over a file source reuses the
batch triple-extraction stage and lands manifested output."""

import json
from pathlib import Path

from pyspark.sql import functions as F

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


def test_watermarked_windowed_counts_drop_late_data(spark, tmp_path):
    """Watermark semantics end-to-end across three micro-batches:
    - batch 1: events inside window W1 [00:00, 00:10)
    - batch 2: an event at 01:00 — advances the watermark to 00:40,
      which closes W1 (it lands in the sink after this batch)
    - batch 3: a LATE event targeting W1 (must be dropped by the state
      store, NOT added) plus an event at 02:00 that finalizes the 01:00
      window.
    Output must hold W1 with the on-time count only, and the 01:00
    window; the 02:00 window never finalizes (watermark never passes it)
    so append mode never emits it."""
    import os
    import time as _time

    import pandas as pd

    from trainable_entity_extractor_spark.streaming.micro_batch import (
        stream_windowed_counts,
    )

    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def mk(ts_minutes, labels):
        return pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta(minutes=m) for m in ts_minutes],
                "label": labels,
            }
        )

    # NOTE the extra batch: Spark commits an advanced watermark one batch
    # AFTER the advancing event's batch (observed on 4.1 — the filter in
    # batch N uses the watermark committed from batch N-2's stats), so W1
    # closes during the 01:05 batch and the late row arrives strictly
    # after both the input-filter watermark (00:40) and W1's eviction.
    batches = [
        mk([1, 2, 7], ["x", "x", "y"]),   # W1: x=2, y=1
        mk([60], ["x"]),                   # advances watermark to 00:40
        mk([65], ["x"]),                   # watermark takes effect; W1 emits
        mk([3, 120], ["x", "y"]),          # late W1 event (dropped) + 02:00
    ]
    flat = tmp_path / "events"
    flat.mkdir()
    base = _time.time() - 1000
    for i, pdf in enumerate(batches):
        sub = tmp_path / f"b{i}"
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(sub))
        import shutil

        for f in sub.glob("*.parquet"):
            dest = flat / f"part-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (base + i, base + i))

    q = stream_windowed_counts(
        spark, str(flat), str(tmp_path / "out"), str(tmp_path / "ckpt_w")
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {
        (r["window_start"].strftime("%H:%M"), r["label"]): r["n"] for r in out.collect()
    }
    # W1 finalized with ON-TIME counts only — the late x@00:03 was dropped
    assert rows[("00:00", "x")] == 2
    assert rows[("00:00", "y")] == 1
    # the [01:00,01:10) window (x@01:00 + x@01:05) finalized by 02:00
    assert rows[("01:00", "x")] == 2
    # the 02:00 window never emitted (watermark never passed its end)
    assert ("02:00", "y") not in rows
    assert len(rows) == 3


def test_running_totals_across_micro_batches(spark, tmp_path):
    """Custom stateful aggregator: per-key (count, sum) state must
    accumulate across micro-batches, and max() over the emitted running
    totals must equal the batch GROUP BY no matter the file split."""
    from trainable_entity_extractor_spark.streaming.micro_batch import running_totals

    rows = [(i % 5, i) for i in range(100)]  # 5 keys x 20 rows
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    in_dir = str(tmp_path / "rt_in")
    df.repartition(4).write.parquet(in_dir)

    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_totals(stream, "user_id", "event_id")
        .writeStream.format("memory")
        .queryName("rt_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    emitted = spark.table("rt_test").collect()
    # multiple micro-batches actually ran: some key emitted more than once
    per_key_emits = {}
    for r in emitted:
        per_key_emits[r["user_id"]] = per_key_emits.get(r["user_id"], 0) + 1
    assert max(per_key_emits.values()) > 1

    final = {
        r["user_id"]: (r["n"], r["s"])
        for r in spark.table("rt_test")
        .groupBy("user_id")
        .agg(F.max("n_so_far").alias("n"), F.max("total_so_far").alias("s"))
        .collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert final == expect


def test_running_totals_string_key(spark, tmp_path):
    """The output/state struct must derive the key field's type from the
    input schema — a string-keyed stream used to miscast against the
    hardcoded `long` (ADVICE r5)."""
    from trainable_entity_extractor_spark.streaming.micro_batch import running_totals

    df = spark.createDataFrame(
        [(f"u{i % 3}", i) for i in range(30)], "user string, amount long"
    )
    in_dir = str(tmp_path / "rt_str_in")
    df.repartition(2).write.parquet(in_dir)
    stream = (
        spark.readStream.schema("user string, amount long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_totals(stream, "user", "amount")
        .writeStream.format("memory")
        .queryName("rt_str_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    final = {
        r["user"]: (r["n"], r["s"])
        for r in spark.table("rt_str_test")
        .groupBy("user")
        .agg(F.max("n_so_far").alias("n"), F.max("total_so_far").alias("s"))
        .collect()
    }
    expect = {
        r["user"]: (r["n"], r["s"])
        for r in df.groupBy("user")
        .agg(F.count("*").alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    assert final == expect
