"""Benchmark driver.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the KG pipeline pages/sec throughput and the
N-vs-4N scaling-efficiency evidence (local[8] vs local[32] on the same
deterministic synthetic corpus — sandbox stand-in for two cluster sizes,
see BASELINE.md targets).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
 "pages_per_sec": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"

# headline subset: one per operator family, heavier ones included on purpose
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


def _new_spark(master: str, shuffle_partitions: int):
    from trainable_entity_extractor_spark.session import get_spark

    spark = get_spark("tee-bench", master=master, shuffle_partitions=shuffle_partitions)
    return spark


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warmup: codegen compile + page cache
        t0 = time.time()
        fn(spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)
    return times


def pipeline_throughput(spark, n_pages: int, warmup: bool = True) -> float:
    """pages/sec of the full KG pipeline (segment → triples → link →
    canonicalize), counting entities to force full materialization."""
    from trainable_entity_extractor_spark.pipeline import run_pipeline
    from trainable_entity_extractor_spark.sources.synth_pages import synth_pages

    if warmup:  # amortize codegen/JIT so both scaling runs measure steady state
        w = run_pipeline(spark, synth_pages(spark, 500, seed=1))
        w["entities"].count()

    pages = synth_pages(spark, n_pages, seed=42)
    t0 = time.time()
    out = run_pipeline(spark, pages)
    out["triples"].count()
    out["entities"].count()
    dt = time.time() - t0
    return n_pages / dt


def main():
    t_start = time.time()

    spark = _new_spark(f"local[{CPUS}]", max(int(CPUS), 8))
    times = run_queries(spark)
    pps_main = pipeline_throughput(spark, BENCH_PAGES)
    spark.stop()

    scaling = {}
    if RUN_SCALING:
        # same input, two parallelism levels (N=8, 4N=32 cores)
        for cores in (8, 32):
            s = _new_spark(f"local[{cores}]", cores)
            t0 = time.time()
            pps = pipeline_throughput(s, BENCH_PAGES)
            scaling[f"local[{cores}]"] = round(pps, 1)
            s.stop()
        eff = scaling["local[32]"] / (scaling["local[8]"] * 4)
        scaling["efficiency_8_to_32"] = round(eff, 3)

    result = {
        "metric": "kg_pipeline_and_headline_queries",
        "value": round(time.time() - t_start, 2),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pages_per_sec": round(pps_main, 1),
        "bench_pages": BENCH_PAGES,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
