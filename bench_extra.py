"""Supplementary benchmarks for optimization work (bench.py is frozen for
measurement; this file holds the guide-§1 isolation tooling: per-query
timing with the driver's own .count() methodology, noop-sink isolation,
and .explain("formatted") plan capture).

Usage:
  python bench_extra.py queries [names...]      # time headline (or named) queries
  python bench_extra.py plans <outdir> [names]  # dump explain(formatted) per query
  python bench_extra.py pipeline [n_pages]      # stage-by-stage pipeline timing
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "sessionize",
    "top_words",
    "exact_dedup",
    "minhash_buckets",
    "ngram_jaccard_consecutive",
    "cosine_topk",
    "triples_phrases",
]


def _spark():
    from trainable_entity_extractor_spark.session import get_spark

    return get_spark("tee-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=max(int(CPUS), 8))


def time_queries(names: list[str], reps: int = 6, noop: bool = False):
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).count()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:{i}")
            df = fn(spark, SF_DIR)
            t0 = time.time()
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        print(f"{name:30s} min={min(samples):6.3f}  samples={samples}", flush=True)
    spark.stop()


def dump_plans(outdir: str, names: list[str]):
    import contextlib
    import io

    import __spark_entry__ as entrymod

    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {outdir}/{name}.txt", flush=True)
    spark.stop()


def pipeline_stages(n_pages: int):
    from pyspark.sql import functions as F

    from trainable_entity_extractor_spark.kg.canonicalize import canonical_entities
    from trainable_entity_extractor_spark.kg.linking import link_mentions, minhash_signatures, score_blocks
    from trainable_entity_extractor_spark.kg.triples import extract_triples
    from trainable_entity_extractor_spark.pipeline import default_options, run_pipeline
    from trainable_entity_extractor_spark.sources.segmentation import pages_to_segments

    import bench

    spark = _spark()
    # warmup (codegen, python workers)
    wpath = bench.ensure_pages_parquet(spark, 1200, seed=1)
    w = run_pipeline(spark, spark.read.parquet(wpath))
    w["triples"].count()
    w["entities"].count()

    path = bench.ensure_pages_parquet(spark, n_pages)
    pages = spark.read.parquet(path)

    def t(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label:34s} {dt:7.3f}s", flush=True)
        return out

    t0_all = time.time()
    segments = pages_to_segments(pages)
    t("segments noop", lambda: segments.write.format("noop").mode("overwrite").save())
    trip_raw = extract_triples(segments, default_options(spark), "mentions_phrase")
    t("triples (no ckpt) noop", lambda: trip_raw.write.format("noop").mode("overwrite").save())
    slim = trip_raw.drop("segment_text")
    t("triples localCheckpoint", lambda: slim.localCheckpoint(eager=True))

    # reuse run_pipeline's real frames for the downstream timing
    t1 = time.time()
    out = run_pipeline(spark, pages)
    t("run_pipeline construct (ckpts run)", lambda: None)
    print(f"  [construct took {time.time()-t1:7.3f}s]", flush=True)
    t("triples.count", lambda: out["triples"].count())
    t("entities.count", lambda: out["entities"].count())
    total = time.time() - t1
    print(f"pipeline total {total:.3f}s  -> {n_pages/total:.1f} pages/s", flush=True)
    print(f"(everything incl. isolation passes: {time.time()-t0_all:.1f}s)", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        names = sys.argv[2:] or HEADLINE
        time_queries(names)
    elif cmd == "noop":
        names = sys.argv[2:] or HEADLINE
        time_queries(names, noop=True)
    elif cmd == "plans":
        outdir = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        dump_plans(outdir, names)
    elif cmd == "pipeline":
        pipeline_stages(int(sys.argv[2]) if len(sys.argv) > 2 else 100000)
    else:
        raise SystemExit(f"unknown command {cmd}")
