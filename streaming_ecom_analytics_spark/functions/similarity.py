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
    # Norms are projected once per vector BEFORE the join — the naive
    # form recomputes both norms inside every pair (2·|Q|·|C| redundant
    # folds). cos = dot/(na*nb) keeps the exact expression shape of the
    # oracle, so precomputation changes cost, not bits.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("qnorm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
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
        _norm(v).alias("neighbor_norm"),
        hyperplane_bucket(v, planes).alias("bucket"),
    )
    base_bucket = hyperplane_bucket(v, planes)
    probe_buckets = F.array(
        base_bucket, *[base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(probes)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("query_id_vec"),
        _norm(v).alias("query_norm"),
        F.explode(probe_buckets).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), on="bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("query_id_vec"), F.col("neighbor_id_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    scored = pairs.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    + probe-the-nearest-lists exact rerank — the other classic ANN
    scale path beside hyperplane LSH.

    - Train: Spark ML KMeans over the corpus (distributed Lloyd's).
    - Index: each corpus vector assigned to its nearest centroid's
      list — at scale this is the partitioning/bucketing key, so one
      query touches n_probe/n_lists of the data.
    - Search: each query scores the n_lists centroids (tiny,
      broadcast-literal dot products), explodes its n_probe nearest
      list ids, joins corpus lists, exact cosine rerank, window top-k.

    Deterministic via fixed seed. Approximate by design → rows-only
    check; recall asserted in unit tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(vec_col).cast("array<double>")
    # cached: Lloyd's iterations rescan the features maxIter times, and
    # the transform scans once more
    feat = embeddings.select(
        F.col(id_col), v.alias("arr"), array_to_vector(v).alias("features")
    ).persist()
    model = KMeans(k=n_lists, seed=seed, maxIter=5, tol=1e-3).fit(feat)
    corpus = model.transform(feat).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("arr").alias("nvec"),
        _norm(F.col("arr")).alias("nnorm"),
        F.col("prediction").alias("list_id"),
    )

    centers = [c.tolist() for c in model.clusterCenters()]
    # per-query centroid scores as literal-array dot products; keep the
    # n_probe nearest lists (euclidean on unit-ish vectors ≈ max dot)
    dists = F.array(*[
        F.struct(
            (-_dot(v, F.array(*[F.lit(float(x)) for x in c]))).alias("neg_dot"),
            F.lit(i).alias("list_id"),
        )
        for i, c in enumerate(centers)
    ])
    probe = F.slice(F.array_sort(dists), 1, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("qvec"),
        _norm(v).alias("qnorm"),
        F.explode(probe).alias("p"),
    ).select("query_id", "qvec", "qnorm", F.col("p.list_id").alias("list_id"))

    pairs = corpus.join(F.broadcast(q), on="list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))
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
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ thr).

    Two-phase plan:
    1. *Prefilter* — the corpus (when under ``broadcast_limit`` rows) is
       collected into one L2-normalized float64 matrix, broadcast, and
       each partition computes its block's Gram product against it in
       BLAS (mapInPandas). Pairs scoring ≥ threshold−1e-6 become
       candidates: the 1e-6 margin dwarfs the ~1e-15 difference between
       BLAS summation order and a sequential fold, so recall is exact.
    2. *Verify* — candidates (a tiny set) join back to the vectors and
       are re-scored with the sequential-fold expression, so the output
       bits match the naive definition (and the DuckDB oracle) exactly.

    Above the broadcast limit, fall back to the exact quadratic join —
    at that scale use minhash/simhash/LSH blocking instead (this
    operator is the within-candidate-set verifier in those pipelines).
    """
    n_rows = embeddings.count()
    if n_rows <= broadcast_limit:
        return _near_dups_gram_prefiltered(
            embeddings, id_col=id_col, vec_col=vec_col, threshold=threshold
        )
    # Per-vector norms precomputed before the quadratic join (see
    # cosine_topk) — the per-pair work is a single dot fold.
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        _norm(F.col(vec_col).cast("array<double>")).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _near_dups_gram_prefiltered(
    embeddings: DataFrame, *, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """BLAS prefilter + exact-fold verify (see embedding_near_dup_pairs)."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, matn))
    margin = 1e-6

    def candidates(batches):
        all_ids, all_mat = bc.value
        for block in batches:
            if not len(block):
                continue
            bids = block[id_col].to_numpy(dtype=np.int64)
            bmat = np.stack([np.asarray(v, dtype=np.float64) for v in block[vec_col]])
            bmat = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
            sims = bmat @ all_mat.T
            ia, ib = np.nonzero(sims >= threshold - margin)
            lo, hi = bids[ia], all_ids[ib]
            keep = lo < hi
            yield pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})

    cand = embeddings.select(id_col, vec_col).mapInPandas(
        candidates, schema="id_a long, id_b long"
    )
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        _norm(F.col(vec_col).cast("array<double>")).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        F.broadcast(cand)
        .join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
