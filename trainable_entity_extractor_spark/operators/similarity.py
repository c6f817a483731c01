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
    lookup: DataFrame | None = None,
) -> DataFrame:
    """Top-k neighbors of a vector already in the table (broadcast the
    1-row query side; the scan side never shuffles).

    `lookup` (round 6): optional frame to resolve the query vector from.
    When the caller pre-repartitions the scan side, deriving the 1-row
    broadcast from the SAME frame would drag that exchange under the
    BroadcastExchange too; passing the raw table here keeps the lookup a
    pushed-filter point read."""
    q = F.broadcast(
        (lookup if lookup is not None else embeddings)
        .filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("qvec"))
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


def fit_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 10,
    sample: int = 10_000,
    vec_col: str = "embedding",
    seed: int = 42,
    order_col: str | None = "vec_id",
):
    """Deterministic k-means coarse quantizer for IVF (driver-fit over a
    bounded sample, like every other trainable artifact in this engine).

    Returns a list[list[float]] of centroids (JSON-able artifact).
    Deterministic: fixed iteration count, seedless farthest-point-style
    init, ties broken by lowest index. The sample is taken in `order_col`
    order — `limit` on an unordered frame is NOT stable across partition
    layouts/AQE, so an explicit sort key is what makes the artifact
    reproducible (pass order_col=None only for throwaway fits).
    """
    import numpy as np

    sampled = embeddings
    if order_col is not None and order_col in embeddings.columns:
        sampled = embeddings.orderBy(order_col)
    rows = sampled.select(vec_col).limit(sample).collect()
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    if len(x) == 0:
        return []
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    xn = x / norms
    k = min(n_centroids, len(xn))
    # k-means++-style init without RNG: start at vector 0, then repeatedly
    # take the point farthest from its nearest chosen centroid
    chosen = [0]
    d = 1.0 - xn @ xn[0]
    for _ in range(1, k):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, 1.0 - xn @ xn[nxt])
    cents = xn[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(xn @ cents.T, axis=1)  # cosine on normalized
        for c in range(k):
            members = xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return [c.tolist() for c in cents]


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append the nearest-centroid id (`ivf_cell`) per row — the IVF
    partition key. Arrow-batched matmul (one GEMM per batch, no per-row
    Python); at crawl scale this column becomes the table's bucketing
    key so each query probes a few files."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype=np.float64)

    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([list(v) for v in vecs], dtype=np.float64)
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((x / norms) @ cents.T, axis=1).astype("int32"))

    _assign.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_assign, T.IntegerType())
    return embeddings.withColumn("ivf_cell", udf(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: brute-force cosine restricted to the `nprobe` cells
    whose centroids are nearest the query. The scan predicate is a native
    `isin` over the int cell column — partition-prunable when the table
    is written bucketed/partitioned by ivf_cell."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(cents @ qn), kind="stable")[: max(nprobe, 1)]
    cells = [int(c) for c in order]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    return cosine_topk(
        assigned.filter(F.col("ivf_cell").isin(cells)), query_vec, k, id_col, vec_col
    )


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
