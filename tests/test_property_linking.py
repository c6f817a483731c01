"""Property test (round-2 verdict item 8): the fused block scorer
(`score_blocks`) must emit exactly the same edge set as the naive
pair-join scorer (`lsh_candidate_pairs` + `score_pairs`) for ANY block
layout — blocks straddling Arrow batch boundaries, oversized blocks at
batch start/end/split points, and batches consisting entirely of one
oversized block. The mapInPandas carry/skip logic (kg/linking.py
score_blocks._score) is the subtle code under test.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trainable_entity_extractor_spark.kg.linking import (
    lsh_candidate_pairs,
    score_blocks,
    score_pairs,
)

N_PERMS = 8
BANDS = 2
CAP = 4  # tiny cap so oversized-block skip paths trigger constantly
THRESHOLD = 0.3

# signatures drawn from a 2-symbol alphabet: band keys collide heavily,
# producing organic blocks of wildly varying sizes (many over the cap)
sig_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=1), min_size=N_PERMS, max_size=N_PERMS),
    min_size=2,
    max_size=60,
)


def _edge_set(df):
    return {(r["a"], r["b"], round(r["jaccard"], 6)) for r in df.collect()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sigs=sig_strategy, batch=st.sampled_from([3, 7, 10000]))
def test_score_blocks_equals_naive_pair_scorer(spark, sigs, batch):
    rows = [(f"m{i:03d}", [int(v) for v in s]) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "mention_id string, sig array<bigint>")

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
    try:
        fused = _edge_set(
            score_blocks(df, THRESHOLD, n_perms=N_PERMS, bands=BANDS, block_cap=CAP)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)

    naive_pairs = lsh_candidate_pairs(df, n_perms=N_PERMS, bands=BANDS, block_cap=CAP)
    naive = _edge_set(
        score_pairs(naive_pairs, df, threshold=THRESHOLD, n_perms=N_PERMS)
    )
    assert fused == naive
