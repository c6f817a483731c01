"""Salt-based skew mitigation (north_rule: hot entities like
high-frequency domains).

Where skew bites and what this engine does about it:
- **joins**: AQE skew-join splitting is enabled session-wide
  (session.py), and every dimension join is broadcast — hot probe keys
  never shuffle.
- **associative groupBy aggregations** (count/min/max/sum): Spark's
  partial (map-side) aggregation already collapses hot keys before the
  shuffle — no salt needed; asserted by the plan test.
- **non-associative or state-heavy aggregations** (collect_list,
  exact distinct sets, percentile buffers): partial aggregation cannot
  collapse these, so ONE hot key funnels its entire payload through one
  reducer. `salted_agg` runs them in two stages: stage 1 aggregates
  (key, salt) over `n_salts` shards, stage 2 merges the per-shard
  results — the hot key's payload crosses the shuffle in n_salts pieces.

Used for the LSH-block style collects when a key's fan-in is unbounded;
the linking path itself bounds fan-in with block caps instead (dropping
mega-blocks is the right call there — a capped block is a *semantic*
decision, salting is a *physical* one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): derived from the whole
    row (monotonically stable within a task), so identical inputs salt
    identically — replay-safe, unlike rand()."""
    cols = [F.col(c).cast("string") for c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 16, out_col: str = "values"
) -> DataFrame:
    """collect_set(value) per key with two-stage salting: a hot key's set
    is built in n_salts shards and merged with array_union-style flatten —
    the per-reducer buffer is 1/n_salts of the hot key's payload."""
    salted = with_salt(df.select(key, value), n_salts)
    stage1 = salted.groupBy(key, "_salt").agg(F.collect_set(value).alias("_part"))
    return (
        stage1.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("_part"))).alias(out_col))
    )


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact count-distinct per key without funneling a hot key's values
    through one reducer: shard on (key, hash(value) % n_salts) — the SAME
    value always lands in the same shard, so per-shard distinct counts
    add up exactly."""
    sharded = df.select(
        key, F.col(value).alias("_v"), F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    )
    stage1 = sharded.groupBy(key, "_salt").agg(F.count_distinct("_v").alias("_c"))
    return stage1.groupBy(key).agg(F.sum("_c").cast("long").alias(out_col))
