"""Stage D: entity linking — deterministic MinHash-LSH blocking over
mention shingles + a batched pairwise scorer (north_rule; SURVEY.md §7.1).

Spark-first design:
- shingling + 32-permutation MinHash signatures are pure native exprs
  (murmur3 `F.hash(shingle, seed)`): one explode + one groupBy — a single
  shuffle keyed by mention id.
- LSH banding (b bands × r rows) buckets candidates; blocks larger than
  `block_cap` are dropped (hot-key/skew mitigation — a mega-block on a
  high-frequency surface form would otherwise produce O(n²) pairs; the
  pairs it would contribute are overwhelmingly within-form duplicates that
  smaller bands still catch).
- candidate pairs are scored with exact Jaccard over shingle sets
  (array_intersect/array_union — native), optionally rescored with the
  Indel kernel.

Deterministic: hand-rolled hashing rather than pyspark.ml MinHashLSH whose
seeds/hashes are not pinned across versions (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERMS = 32
DEFAULT_BANDS = 8  # 8 bands x 4 rows


def normalize_mention(col):
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def shingles(col, k: int = 3):
    """Character k-gram shingle array (distinct) of a normalized mention."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(k))))


def minhash_signatures(
    mentions: DataFrame, id_col: str = "mention_id", text_col: str = "mention",
    n_perms: int = DEFAULT_PERMS, k: int = 3,
) -> DataFrame:
    """mentions → (id, shingles array, mh0..mh{n-1}) via explode + groupBy."""
    normed = mentions.select(
        F.col(id_col).alias("mention_id"),
        normalize_mention(F.col(text_col)).alias("norm"),
    ).withColumn("sh", shingles(F.col("norm"), k))

    exploded = normed.select("mention_id", "norm", F.explode("sh").alias("shingle"))
    aggs = [F.min(F.hash(F.col("shingle"), F.lit(i))).alias(f"mh{i}") for i in range(n_perms)]
    sigs = exploded.groupBy("mention_id").agg(
        F.first("norm").alias("norm"),
        F.collect_set("shingle").alias("shingles"),
        *aggs,
    )
    return sigs


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    block_cap: int = 64,
) -> DataFrame:
    """Band the signatures, bucket-join within bands, cap oversized blocks.

    Returns distinct (a, b) candidate pairs with a < b.
    """
    rows_per_band = n_perms // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.hash(*cols).alias("key")))

    banded = sigs.select(
        "mention_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("mention_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # per-block size; drop blocks above cap (skew mitigation, north rule)
    sized = banded.join(
        banded.groupBy("band", "key").agg(F.count("*").alias("bsz")), ["band", "key"]
    ).filter(F.col("bsz") <= block_cap)

    left = sized.select("band", "key", F.col("mention_id").alias("a"))
    right = sized.select("band", "key", F.col("mention_id").alias("b"))
    pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs


def score_pairs(pairs: DataFrame, sigs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact Jaccard rescoring of candidate pairs (native array ops)."""
    sa = sigs.select(F.col("mention_id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("mention_id").alias("b"), F.col("shingles").alias("sh_b"))
    scored = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("a", "b", "jaccard")
    )
    return scored.filter(F.col("jaccard") >= threshold)


def link_mentions(
    mentions: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "mention",
    threshold: float = 0.6,
    n_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    block_cap: int = 64,
) -> DataFrame:
    """Full Stage D: mentions → similarity edges (a, b, jaccard)."""
    sigs = minhash_signatures(mentions, id_col, text_col, n_perms)
    pairs = lsh_candidate_pairs(sigs, n_perms, bands, block_cap)
    return score_pairs(pairs, sigs, threshold)
