"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``     : brute-force exact top-k — the correctness
                        baseline. Query set broadcast; per-partition
                        ranking via window. All arithmetic in double
                        with a fixed fold order → engine-comparable.
- ``lsh_bucketed_topk``: random-hyperplane LSH (sign-bit bucketing) —
                        the scale path. Probes only same-bucket (and
                        optionally neighboring-bucket) candidates.

The dot product is a built-in higher-order-function fold
(zip_with → aggregate) — JVM-side, no UDF, no per-row Python.
Embeddings in the testdata are L2-normalized, so cosine ≡ dot; the
code still normalizes explicitly to stay correct on raw vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine), k rows per query,
    deterministic ties by neighbor_id. The query side is broadcast —
    the corpus is scanned once, never shuffled; ranking shuffles only
    (query_id, candidate) pairs, i.e. |queries| × |corpus| rows. For
    large query sets switch to lsh_bucketed_topk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qvec"), F.col("cvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("cvec"))
    )
    scored = pairs.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign bits of dot products with fixed hyperplanes."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1).otherwise(0)
        for p in planes
    ]
    out = F.lit(0)
    for bit in bits:
        out = out * 2 + bit
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing with
    multi-probe, exact rerank within the probed buckets.

    2^n_planes buckets shrink each query's candidate set by ~2^n_planes.
    Multi-probe (Lv et al., VLDB 2007): each query also probes the
    buckets at Hamming distance 1 from its own (``n_probes`` of them,
    default all n_planes single-bit flips) — recovering neighbors that
    sit just across one hyperplane, the dominant LSH failure mode, at
    the cost of (n_probes+1)× candidate fan-out on the (small,
    broadcast) query side only. The planes derive deterministically
    from ``seed`` so results are reproducible (rows-only check —
    approximation is the point).
    """
    import numpy as np

    dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    probes = n_planes if n_probes is None else n_probes

    v = F.col(vec_col).cast("array<double>")
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("neighbor_id_vec"),
        hyperplane_bucket(v, planes).alias("bucket"),
    )
    base_bucket = hyperplane_bucket(v, planes)
    probe_buckets = F.array(
        base_bucket, *[base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(probes)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("query_id_vec"),
        F.explode(probe_buckets).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), on="bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("query_id_vec"), F.col("neighbor_id_vec")) / (
        _norm(F.col("query_id_vec")) * _norm(F.col("neighbor_id_vec"))
    )
    scored = pairs.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ thr).

    All-pairs within the frame — intended for post-LSH candidate sets or
    modest corpora; the LSH variants are the scale path.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
