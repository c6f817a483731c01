"""Stage D: entity linking — deterministic MinHash-LSH blocking over
mention shingles + batched pair scoring (north_rule; SURVEY.md §7.1).

Spark-first design, tuned from profiling (see BENCH notes):
- signatures are a SINGLE narrow projection: per row,
  sig[i] = array_min(transform(shingles, s -> hash(s, i))). No explode, no
  groupBy, no shuffle — whole-stage codegen end to end. At 10^12 docs this
  is the difference between a map-only stage and a petabyte shuffle.
- LSH banding (b bands × r rows) buckets candidates; blocks larger than
  `block_cap` are dropped (hot-key/skew mitigation: a mega-block from a
  high-frequency surface form would contribute O(n²) pairs).
- pair scoring uses the MinHash signature-agreement estimator
  (fraction of equal slots ≈ Jaccard, unbiased) — no shingle arrays are
  carried through the join. Exact Jaccard rescoring is available for the
  survivors via `exact_rescore`.

Deterministic: hand-rolled murmur3 (`F.hash`) rather than pyspark.ml
MinHashLSH whose seeds are not pinned across versions (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERMS = 32
# 5 bands x 6 rows (30 of 32 slots): P(candidate | j=0.9) ≈ 98% while
# mid-similarity noise pairs (j≈0.5) only block at ~8% — an order of
# magnitude fewer candidates than r=4 banding on vocabulary-correlated
# corpora. Precision comes from the cheap signature-agreement scorer.
DEFAULT_BANDS = 5


def normalize_mention(col):
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def shingles(col, k: int = 3):
    """Character k-gram shingle array (distinct) of a normalized mention."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(k))))


def _perm_coeffs(n_perms: int, seed: int = 42):
    """Deterministic multiply-add hash coefficients (LCG-derived).

    Hashing is h_i(x) = a_i * x + b_i with natural uint64 wraparound —
    no modulo: numpy has no vectorized 64-bit integer division, so a mod-
    prime family is ~100x slower. Multiply-add wraparound (odd a_i) is the
    standard practical MinHash family (2-universal, well-mixed high bits).
    """
    a, b = [], []
    state = seed
    mask = (1 << 64) - 1
    for _ in range(n_perms):
        state = (6364136223846793005 * state + 1442695040888963407) & mask
        a.append(state | 1)  # odd multiplier
        state = (6364136223846793005 * state + 1442695040888963407) & mask
        b.append(state)
    return a, b


def _minhash_kernel(texts, n_perms: int, k: int, max_chars: int):
    """Batch-vectorized MinHash: char k-gram codes → min((a*x+b) mod p).

    The whole Arrow batch is processed as ONE numpy computation: all rows'
    k-gram codes are concatenated, hashed for every permutation in a
    single (n_perms, G) broadcast, and reduced per row with
    np.minimum.reduceat — no per-row Python. Deterministic at any
    parallelism. (Spark's higher-order array lambdas are interpreted, not
    codegen'd, which is why this is a pandas UDF and not a native expr.)
    """
    import numpy as np

    a, b = _perm_coeffs(n_perms)
    # int64 throughout: this numpy build has no SIMD kernel for uint64
    # multiply (~100x slower); two's-complement wraparound is bit-identical
    # and signed min is an equally valid fixed total order for min-wise
    # selection (the scorer compares slot equality only).
    to_i64 = lambda xs: np.array([x - (1 << 64) if x >= (1 << 63) else x for x in xs], dtype=np.int64)
    a = to_i64(a).reshape(-1, 1)
    b = to_i64(b).reshape(-1, 1)

    grams_per_row: list = []
    for t in texts:
        norm = " ".join((t or "").lower().split())[:max_chars]
        if len(norm) < k:
            norm = norm + "\x00" * (k - len(norm))
        codes = np.frombuffer(norm.encode("utf-8", "replace"), dtype=np.uint8).astype(np.int64)
        # polynomial k-gram codes via strided sum (< 257^k, keep k<=3)
        gram = np.zeros(len(codes) - k + 1, dtype=np.int64)
        for j in range(k):
            gram = gram * np.int64(257) + codes[j : len(codes) - k + 1 + j]
        grams_per_row.append(gram)

    if not grams_per_row:
        return []
    lengths = np.array([len(g) for g in grams_per_row])
    offsets = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    flat = np.concatenate(grams_per_row)
    # per-perm loop with preallocated buffers: a single (n_perms, G)
    # broadcast would allocate hundreds of MB of temporaries per batch —
    # fresh page faults dominate in VM environments. This keeps the
    # working set at one G-sized buffer.
    tmp = np.empty_like(flat)
    out = np.empty((len(lengths), len(a)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(len(a)):
            np.multiply(flat, a[i, 0], out=tmp)
            np.add(tmp, b[i, 0], out=tmp)
            out[:, i] = np.minimum.reduceat(tmp, offsets)
    return list(out)


def minhash_signatures(
    mentions: DataFrame, id_col: str = "mention_id", text_col: str = "mention",
    n_perms: int = DEFAULT_PERMS, k: int = 3, max_chars: int = 128,
) -> DataFrame:
    """mentions → (mention_id, norm, sig array<long>[n_perms]).

    Map-only (no shuffle): Arrow-batched pandas UDF running the numpy
    MinHash kernel."""
    import pandas as pd
    from pyspark.sql import types as T

    def _sig(texts: pd.Series) -> pd.Series:
        return pd.Series(_minhash_kernel(texts.tolist(), n_perms, k, max_chars))

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    sig_udf = F.pandas_udf(_sig, T.ArrayType(T.LongType()))

    return mentions.select(
        F.col(id_col).alias("mention_id"),
        normalize_mention(F.col(text_col)).alias("norm"),
        sig_udf(F.col(text_col)).alias("sig"),
    )


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
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + i + 1) for i in range(rows_per_band)])).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("mention_id", F.explode(band_structs).alias("bk")).select(
        "mention_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )

    # One groupBy gives blocks AND the size cap (skew mitigation, north
    # rule) — no count-join back onto the banded rows. Pair generation is a
    # bounded self-join on the block id (every block <= cap members).
    blocks = (
        banded.groupBy("band", "key")
        .agg(F.collect_list("mention_id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= block_cap))
        .select(F.monotonically_increasing_id().alias("block_id"), "ids")
    )
    members = blocks.select("block_id", F.explode("ids").alias("m"))
    left = members.select("block_id", F.col("m").alias("a"))
    right = members.select("block_id", F.col("m").alias("b"))
    # NOTE: a pair appearing in several bands is emitted once per band —
    # dedup happens after the (selective) score filter, where it is cheap.
    return left.join(right, "block_id").filter(F.col("a") < F.col("b")).select("a", "b")


def score_pairs(
    pairs: DataFrame,
    sigs: DataFrame,
    threshold: float = 0.6,
    n_perms: int = DEFAULT_PERMS,
    exact_rescore: bool = False,
    mentions: DataFrame | None = None,
    k: int = 3,
) -> DataFrame:
    """Signature-agreement Jaccard estimate per candidate pair; optional
    exact rescoring of survivors against the shingle sets."""
    sa = sigs.select(F.col("mention_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("mention_id").alias("b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(n_perms))
    )
    scored = (
        pairs.join(sa, "a").join(sb, "b").select("a", "b", est.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .distinct()  # multi-band duplicates — cheap after the score filter
    )
    if not exact_rescore:
        return scored

    assert mentions is not None, "exact_rescore needs the mentions frame"
    sh = mentions.select(
        F.col(mentions.columns[0]).alias("mid"),
        shingles(normalize_mention(F.col(mentions.columns[1])), k).alias("sh"),
    )
    exact = (
        scored.join(sh.select(F.col("mid").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col("mid").alias("b"), F.col("sh").alias("sh_b")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return exact.filter(F.col("jaccard") >= threshold)


def link_mentions_portable(
    mentions: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "mention",
    n_perms: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
    block_cap: int = 64,
) -> DataFrame:
    """Oracle-checkable Stage D variant: word-level md5 string-min MinHash
    (md5 is bit-identical in DuckDB, so an ANSI-SQL oracle can reproduce
    every step), banded LSH blocking with a block-size cap, and the same
    signature-agreement scorer as the fast path.

    `link_mentions` (murmur3 + numpy kernel) is the throughput path; this
    variant exists so the driver's DuckDB gate can verify the
    block → pair → score semantics end-to-end. Same plan shape: map-only
    signatures, bucketed self-join (never all-pairs), capped blocks.
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    sig_cols = [
        F.array_min(
            F.transform(words, lambda x: F.md5(F.concat(F.lit(f"{i}#"), x)))
        ).alias(f"mh{i}")
        for i in range(n_perms)
    ]
    sigs = mentions.select(F.col(id_col).alias("mid"), *sig_cols)

    rows_per_band = n_perms // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows_per_band + i}") for i in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    keys = sigs.select("mid", F.explode(band_structs).alias("bk")).select(
        "mid", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    blocks = (
        keys.groupBy("band", "key")
        .agg(F.collect_list("mid").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= block_cap))
    )
    members = blocks.select(
        F.monotonically_increasing_id().alias("block_id"), "ids"
    ).select("block_id", F.explode("ids").alias("m"))
    pairs = (
        members.select("block_id", F.col("m").alias("a"))
        .join(members.select("block_id", F.col("m").alias("b")), "block_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sigs.select(F.col("mid").alias("a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perms)])
    sb = sigs.select(F.col("mid").alias("b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perms)])
    agreement = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(n_perms)
    ) / F.lit(float(n_perms))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(agreement, 4).alias("agreement"))
        .filter(F.col("agreement") >= threshold)
    )


def link_mentions(
    mentions: DataFrame,
    id_col: str = "mention_id",
    text_col: str = "mention",
    threshold: float = 0.6,
    n_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    block_cap: int = 64,
) -> DataFrame:
    """Full Stage D: mentions → similarity edges (a, b, jaccard).

    Signatures are localCheckpointed: the banding self-join and the pair
    scorer consume them 4x — without materialization the Python MinHash
    stage would re-run per consumer."""
    sigs = minhash_signatures(mentions, id_col, text_col, n_perms).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(sigs, n_perms, bands, block_cap)
    return score_pairs(pairs, sigs, threshold, n_perms)
