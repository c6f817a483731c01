"""Stage E: canonicalization — connected components over the similarity
edges via iterative DataFrame label propagation (hash-min), with
deterministic tie-breaking (lexicographic min id) and lineage truncation
per iteration (north_rule; SURVEY §7.3: GraphFrames is external, so the
loop is plain DataFrame joins).

Scale notes: each iteration is one shuffle (groupBy min over neighbor
labels). Convergence is O(diameter) iterations; localCheckpoint every
iteration truncates the logical plan so Catalyst doesn't re-analyze an
ever-growing lineage. Hot vertices (high-degree hubs from frequent surface
forms) are bounded upstream by the LSH block cap.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _scratch_dir(spark) -> str:
    """Root dir for driver→executor parquet handoffs.

    Resolution order: `spark.tee.scratch.dir` conf → the session's
    checkpoint dir → the driver's tempdir. The last fallback works in
    LOCAL MODE ONLY (executors share the driver's filesystem); on a real
    multi-node cluster set `spark.tee.scratch.dir` (or a checkpoint dir)
    to shared storage — an executor cannot read the driver's /tmp.
    """
    conf_dir = None
    try:
        conf_dir = spark.conf.get("spark.tee.scratch.dir")
    except Exception:
        conf_dir = None
    if conf_dir:
        return conf_dir
    ckpt = spark.sparkContext.getCheckpointDir()
    if ckpt:
        # the write below uses local-filesystem APIs (mkdtemp + pyarrow),
        # so only a LOCAL checkpoint dir is usable: strip a file: scheme,
        # ignore remote schemes (hdfs://, s3a://, …) — for those, point
        # spark.tee.scratch.dir at a locally-mounted shared path instead
        if ckpt.startswith("file:"):
            return ckpt[len("file:"):]
        if "://" not in ckpt:
            return ckpt
    return tempfile.gettempdir()


def _driver_union_find(spark, pdf, id_type: T.DataType) -> DataFrame:
    """Exact same contract as the distributed loop (component = min id),
    computed on the driver. Used below the size threshold where Spark's
    per-job latency would dominate; at cluster scale the distributed loop
    takes over.

    Two deliberate choices for the serial floor (this runs at the same
    wall-time regardless of cluster width, so every ms here is Amdahl
    poison for scaling efficiency):
    - the component labels come from VECTORIZED numpy hash-min + pointer
      jumping over factorized edge arrays — no per-edge Python loop;
    - the result re-enters Spark as a driver-written parquet file read
      back as a scan. `spark.createDataFrame(pdf)` embeds every row into
      task closures (the round-2 bench's "task of very large size
      (3096 KiB)" warning came from exactly that); a file scan ships
      file paths, not rows.
    """
    import numpy as np
    import pandas as pd

    if len(pdf) == 0:
        # explicit schema: a zero-row pandas frame has object dtype and
        # createDataFrame(empty_pdf) raises CANNOT_INFER_EMPTY_SCHEMA.
        # The id/component types mirror the edges' endpoint column type.
        schema = T.StructType(
            [
                T.StructField("id", id_type, True),
                T.StructField("component", id_type, True),
            ]
        )
        return spark.createDataFrame([], schema=schema)

    both = pd.concat([pdf["u"], pdf["v"]], ignore_index=True)
    codes, uniq = pd.factorize(both)
    m = len(pdf)
    eu = np.asarray(codes[:m], dtype=np.int64)
    ev = np.asarray(codes[m:], dtype=np.int64)
    uniq_arr = np.asarray(uniq)
    n = len(uniq_arr)
    # work in sorted-rank space so numeric min == "min id" in the column's
    # natural order (lexicographic for strings, numeric for ints)
    order = np.argsort(uniq_arr, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    ru, rv = rank[eu], rank[ev]

    label = np.arange(n, dtype=np.int64)
    while True:
        old = label.copy()
        # hash-min sweep over all edges at once (unbuffered scatter-min)
        np.minimum.at(label, ru, old[rv])
        np.minimum.at(label, rv, old[ru])
        # pointer jumping: label <- label[label] until within-sweep fixpoint
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, old):
            break

    sorted_ids = uniq_arr[order]
    out = pd.DataFrame({"id": pd.Series(sorted_ids), "component": pd.Series(sorted_ids[label])})

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Handoff: parquet under a SHARED scratch dir (see _scratch_dir — the
    # driver-local tempdir fallback is local-mode-only), returned as a
    # plain scan. Round 6: the eager localCheckpoint copy job is GONE —
    # it existed only so local mode could delete the file immediately,
    # but it cost one full fixed-latency job (~0.3 s) in every pipeline
    # run at EVERY cluster width, i.e. pure Amdahl serial floor for the
    # scaling pairs. Downstream consumers rescan the (small, local)
    # parquet instead, which is also re-computable after executor loss on
    # a real cluster; the file is removed at interpreter exit (cleanup
    # now registered on every master, not just cluster ones). Trade-off,
    # documented: a LONG-LIVED driver that calls connected_components
    # many times accumulates one small dir per call until exit — the
    # price of keeping the returned frame re-scannable without a copy
    # job. Such services should point spark.tee.scratch.dir at a volume
    # sized for it (or periodically restart the session); the bench /
    # batch lifecycle this engine targets holds a handful at most.
    tmp = tempfile.mkdtemp(prefix="tee_uf_", dir=_scratch_dir(spark))
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), f"{tmp}/part-0.parquet")
    import atexit

    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return spark.read.parquet(tmp)


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
    pre_materialized: bool = False,
) -> DataFrame:
    """edges(a,b) → (id, component) where component = min id in component.

    Scale-adaptive: below `driver_threshold` edges, one collect + driver
    union-find (identical deterministic result, no iterative jobs); above
    it, hash-min label propagation — every vertex repeatedly adopts the
    min label among itself and its neighbors until fixpoint.

    `pre_materialized=True` promises the caller already checkpointed /
    cached `edges` (the pipeline does): the defensive checkpoint below is
    skipped, removing one stored-block copy job from the serial floor —
    at two cluster sizes that job costs the same wall-clock, so every
    skipped fixed-latency job buys scaling efficiency directly.
    """
    edges = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not pre_materialized:
        # checkpoint the EDGES before building the symmetric view: `sym`
        # scans the edge set twice (u→v and v→u), and without
        # materialization each scan would re-evaluate the whole upstream
        # linking stage inside the same job. One linking evaluation, one
        # stored (small) edge set.
        edges = edges.localCheckpoint(eager=True)
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))

    spark = edges.sparkSession
    # size probe and collect MERGED into one job (round 6): the old
    # count()-then-toPandas() pair cost two full fixed-latency jobs per
    # pipeline run — pure serial floor at every cluster width. The limit
    # probe collects at most threshold/2 + 1 edges (Arrow transfer); iff
    # it comes back under the cap we already hold the data and the
    # decision (same boundary as 2*count <= threshold). Only the rare
    # over-threshold path pays the separate count afterwards.
    cap = driver_threshold // 2
    probe = edges.limit(cap + 1).toPandas()  # Arrow — far cheaper than row collect
    if len(probe) <= cap:
        return _driver_union_find(spark, probe, edges.schema["u"].dataType)
    n_edges = 2 * edges.count()

    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = max(2, min(width, n_edges // 50_000 + 1))
    # explicit repartition on the loop frames — NOT a session-global
    # spark.sql.shuffle.partitions mutation, which concurrent queries in
    # the same session would observe (AQE coalesces the loop's wide
    # shuffles down to `parts`-sized outputs anyway).
    sym = sym.repartition(parts, "u").localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        # pass 1 — hash-min: candidate label per vertex = min over
        # neighbors' current labels
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("u", "id")
        )
        new_min = F.least(
            F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id", new_min.alias("component")
        )
        # pass 2 — pointer jumping: adopt the label of your label
        # (component -> that vertex's own component). Halves the remaining
        # path every iteration, so convergence is O(log diameter) rather
        # than O(diameter) — a 10^6-long chain converges in ~20 rounds.
        parent = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("jumped")
        )
        jumped = (
            stepped.join(parent, "component", "left")
            .select("id", F.least(F.col("component"), F.coalesce("jumped", "component")).alias("component"))
        )
        # change flag carried out of the same frame: the convergence check
        # scans the (small, checkpointed) result, no extra join job.
        new_labels = (
            jumped.withColumnRenamed("component", "new_component")
            .join(labels, "id")
            .select(
                "id",
                F.col("new_component").alias("component"),
                (F.col("new_component") != F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"(graph diameter > 2^{max_iter}); raise max_iter"
        )
    return labels


def canonical_entities(
    mentions: DataFrame,
    edges: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "mention",
    pre_materialized: bool = False,
) -> DataFrame:
    """mentions + edges → (mention_id, entity_id, canonical). Singleton
    mentions form their own entity; canonical surface form = the
    lexicographically smallest mention text in the component
    (deterministic).

    The canonical form is a min-over-partition WINDOW, not a
    groupBy+join-back: same result, ONE shuffle on entity_id instead of
    two (agg exchange + join exchange) — at two cluster sizes the saved
    exchange+AQE round is fixed latency that would otherwise sit in the
    scaling serial floor, and at 100 TB it is a whole avoided shuffle of
    the mention set."""
    from pyspark.sql import Window

    comps = connected_components(edges, pre_materialized=pre_materialized)
    assigned = mentions.join(
        comps.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("entity_id", F.coalesce(F.col("component"), F.col(id_col)))
    w = Window.partitionBy("entity_id")
    return assigned.select(
        id_col, "entity_id", text_col, F.min(text_col).over(w).alias("canonical")
    )
