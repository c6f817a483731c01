"""Structured-Streaming wrapper (optional stretch — SURVEY §2.10: the
reference is batch-only, and the north rule asks for resumable partitioned
batch; this adapter reuses the SAME batch stages under foreachBatch so a
page stream lands in the same triples/entities tables with the same
manifests).

Pattern: readStream (file source over the pages layout) → foreachBatch →
extract_triples → append to the bucketed output with manifest updates.
Checkpointing is Spark's streaming checkpoint + our per-bucket manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..kg.materialize import write_partitioned
from ..kg.triples import extract_triples
from ..sources.segmentation import pages_to_segments


def stream_pages_to_triples(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    options_df: DataFrame,
    pred_name: str = "mentions_phrase",
    availableNow: bool = True,
):
    """Start (or run-to-completion with availableNow) a stream that applies
    Stage A-C per micro-batch. Returns the StreamingQuery."""
    pages_schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(pages_schema).parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        segments = pages_to_segments(batch_df)
        triples = extract_triples(segments, options_df, pred_name)
        write_partitioned(triples, output_path, "subj")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def first_seen(stream_df: DataFrame, key_col: str):
    """Custom stateful streaming operator (applyInPandasWithState): emit
    each key's FIRST row across the whole stream, suppress every later
    occurrence. The streaming analog of the batch exact-dedup stage —
    state is one boolean per key, persisted in the streaming state store,
    so a mention that arrived in micro-batch 3 is still deduped in
    micro-batch 300.

    Arrow-batched like every other kernel: the state function sees pandas
    frames per key group, never per-row Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = stream_df.schema

    def dedup(key, pdfs, state):
        if state.exists:
            return iter([])  # key already emitted in an earlier batch
        first_row = None
        for pdf in pdfs:
            if len(pdf):
                first_row = pdf.iloc[:1]
                break
        state.update((True,))
        if first_row is None:
            return iter([])
        return iter([first_row])

    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals(
    stream_df: DataFrame, key_col: str, val_col: str
) -> DataFrame:
    """Custom stateful streaming AGGREGATOR (applyInPandasWithState):
    per-key state is (count, integer total); every micro-batch where a
    key appears emits that key's running totals AFTER the batch. The
    streaming analog of `groupBy(key).agg(count, sum)` with
    user-controlled state — the §2.10 'custom stateful operator' slot
    beyond first_seen's boolean dedup state.

    Order-insensitivity contract (what makes this oracle-able): the
    emission after the FINAL batch a key appears in always equals the
    key's whole-stream totals, and running counts/totals of nonnegative
    contributions only grow — so `max()` over all emitted rows per key
    reproduces the batch aggregate no matter how rows were split into
    micro-batches or ordered within them. State is two longs per key:
    O(distinct keys), crawl-scale safe."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                total += int(pdf[val_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_so_far": [n], "total_so_far": [total]}
        )

    # key field type derived from the input schema (ADVICE r5): a string-
    # keyed stream previously failed/miscast against the hardcoded `long`
    key_type = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n_so_far long, total_so_far long",
        stateStructType="n long, total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "label",
    window_dur: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts (§2.10 / task brief: 'watermarks
    + windowed aggs for late data').

    Append-mode semantics: a window row is emitted exactly once, when the
    event-time watermark (max seen ts - `watermark`) passes the window
    end; rows arriving for a window the watermark has already closed are
    DROPPED by the state store, bounding state at
    O(active windows x keys) regardless of stream length — the property
    that makes this runnable forever at crawl scale."""
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), key_col, "n")
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_col: str = "label",
    window_dur: str = "10 minutes",
    watermark: str = "20 minutes",
    availableNow: bool = True,
):
    """File-source stream → watermarked windowed counts → parquet sink
    (append mode: only watermark-finalized windows land)."""
    schema = spark.read.parquet(input_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    agg = windowed_counts(stream, ts_col, key_col, window_dur, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_first_seen_mentions(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    key_col: str = "mention_id",
    availableNow: bool = True,
):
    """File-source stream → stateful first-seen dedup → parquet sink."""
    schema = spark.read.parquet(input_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(input_path)
    )
    deduped = first_seen(stream, key_col)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if availableNow:
        writer = writer.trigger(availableNow=True)
    return writer.start()
