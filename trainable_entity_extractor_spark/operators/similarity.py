"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: native `aggregate`/`zip_with` dot products —
  stays in codegen, no Python. O(n·d) per query vector; the right baseline
  and exact.
- LSH-bucketed ANN: random-hyperplane signs (deterministic seeded planes)
  bucket vectors; per-bucket brute force. The scale path for n >> 10^6 per
  query batch: candidate set shrinks by ~2^bits with recall controlled by
  multiple tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = embeddings.select(F.col(id_col), cosine(v, q).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_topk_self(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors of a vector already in the table (broadcast the
    1-row query side; the scan side never shuffles)."""
    q = F.broadcast(
        embeddings.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qv = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    return (
        embeddings.crossJoin(q)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), cosine(v, qv).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy RNG state)."""
    planes = []
    state = seed * 2654435761 % (2**31)
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / 2**31) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id (int) to each row."""
    planes = _planes(dim, bits, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0)
    for i, p in enumerate(planes):
        pv = F.array(*[F.lit(x) for x in p])
        sig = sig + F.when(_dot(v, pv) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return embeddings.withColumn("lsh_bucket", sig.cast("int"))


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's LSH bucket
    (single-probe; recall grows with multi-probe/multiple tables)."""
    planes = _planes(dim, bits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qsig += 1 << i
    bucketed = lsh_bucket_ids(embeddings, dim, bits, seed, vec_col)
    return cosine_topk(bucketed.filter(F.col("lsh_bucket") == qsig), query_vec, k, id_col, vec_col)


def ann_topk_multiprobe(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    n_tables: int = 2,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall-controlled ANN: `n_tables` independent hyperplane tables,
    each probed at the query's bucket plus every bucket within Hamming
    distance `probe_bits` (bit flips of near-zero margins are the usual
    recall killer of single-probe sign-LSH).

    Scale shape: the candidate filter is a native `isin` over int bucket
    columns — one scan, no shuffle, no Python; candidate count ≈
    n · n_tables · (1 + bits·probe_bits) / 2^bits, so recall is bought
    with a linear-in-tables scan budget, never an all-pairs join.
    """
    bucketed = embeddings
    probe_sets: list[tuple[str, list[int]]] = []
    for t in range(n_tables):
        tseed = seed + 7919 * t
        planes = _planes(dim, bits, tseed)
        qsig = 0
        for i, p in enumerate(planes):
            if sum(a * b for a, b in zip(query_vec, p)) > 0:
                qsig += 1 << i
        probes = {qsig}
        if probe_bits >= 1:
            probes |= {qsig ^ (1 << i) for i in range(bits)}
        if probe_bits >= 2:
            probes |= {
                qsig ^ (1 << i) ^ (1 << j)
                for i in range(bits)
                for j in range(i + 1, bits)
            }
        col = f"lsh_bucket_t{t}"
        bucketed = lsh_bucket_ids(bucketed, dim, bits, tseed, vec_col).withColumnRenamed(
            "lsh_bucket", col
        )
        probe_sets.append((col, sorted(probes)))

    cond = None
    for col, probes in probe_sets:
        c = F.col(col).isin(probes)
        cond = c if cond is None else (cond | c)
    candidates = bucketed.filter(cond).drop(*[c for c, _ in probe_sets])
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)
