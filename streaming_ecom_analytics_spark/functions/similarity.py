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

from streaming_ecom_analytics_spark.functions import guards


def _require_dim(dim: int | None, fn_name: str) -> None:
    """The vector dimension is a required input for every function that
    derives projection planes / codebooks at PLAN-BUILD time. Spark's
    schema types the column as array<float> without an element count,
    so inferring dim would mean a LIMIT-1 collect — a Spark job running
    inside query construction, which is forbidden package-wide (the
    no-plan-build-jobs listener tests pin this). Raise loudly instead
    of probing silently."""
    if dim is None:
        raise ValueError(
            f"{fn_name} requires dim=<vector length> (e.g. dim=64 for the "
            "testdata embeddings). It is not inferred from the data: the "
            "Spark schema does not carry array lengths, and probing a row "
            "would run a Spark job during query construction."
        )
    if dim <= 0:
        raise ValueError(f"{fn_name}: dim must be positive, got {dim}")


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
    max_rows: int | None = guards.DEFAULT_BRUTE_FORCE_MAX_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine), k rows per query,
    deterministic ties by neighbor_id. The query side is broadcast —
    the corpus is scanned once, never shuffled; ranking shuffles only
    (query_id, candidate) pairs, i.e. |queries| × |corpus| rows. For
    large query sets switch to lsh_bucketed_topk.

    Guarded: raises BruteForceGuardError when |queries| exceeds
    ``max_rows`` (the quadratic axis is the query fan-out; the corpus
    side is a single scan). ``max_rows=None`` disables the guard.

    Composes lazily (no driver action); for recall contracts that only
    need the exact neighbor SET, ``cosine_topk_blas`` is ~10x faster.
    """
    guards.guard_brute_force(
        queries, max_rows=max_rows, op="cosine_topk", scale_path="lsh_bucketed_topk/ivf_topk"
    )
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


def _dlit(x: float) -> str:
    """SQL double literal with exact round-trip (repr is the shortest
    decimal that parses back bit-identically; the D suffix types it)."""
    return repr(float(x)) + "D"


def _dot_lit_sql(vec_sql: str, values) -> str:
    """SQL text of ``_dot(vec, literal-array)`` — the identical
    fixed-fold-order aggregate/zip_with expression, built as ONE parser
    call instead of one py4j round-trip per element. Plan-construction
    cost, not execution cost: a 16×64 centroid grid costs ~1.2 s of
    driver time per query through per-element ``F.lit`` (measured
    round-11) and ~5 ms through the parser; the analyzed expression —
    and therefore every computed value — is the same."""
    arr = ",".join(_dlit(x) for x in values)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _hyperplane_bucket_sql(vec_sql: str, planes) -> str:
    """SQL text of :func:`hyperplane_bucket` (same sign-bit values; see
    ``_dot_lit_sql`` for why the SQL form exists). The per-element and
    SQL forms are pinned equal in tests/test_round11_shared.py."""
    out = "0"
    for p in planes:
        bit = f"(CASE WHEN {_dot_lit_sql(vec_sql, p)} >= 0 THEN 1 ELSE 0 END)"
        out = f"(({out}) * 2 + {bit})"
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
    n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing with
    multi-probe and multi-table amplification, exact rerank within the
    probed buckets.

    2^n_planes buckets shrink each query's candidate set by ~2^n_planes.
    Multi-probe (Lv et al., VLDB 2007): each query also probes the
    buckets at Hamming distance 1 from its own (``n_probes`` of them,
    default all n_planes single-bit flips) — recovering neighbors that
    sit just across one hyperplane, the dominant LSH failure mode, at
    the cost of (n_probes+1)× candidate fan-out on the (small,
    broadcast) query side only. Multi-table (the classic AND-OR
    amplification): ``n_tables`` independent plane sets, a candidate if
    ANY table collides — per-table miss rate m becomes m^n_tables,
    which is what makes sign-LSH usable on near-uniform vectors where
    any single table's recall is modest. Cost is n_tables× candidate
    generation; the exact rerank dedupes first, so each surviving pair
    is scored once. Tables live in ONE plan (a union of bucket joins
    over the same scan) — at scale the corpus bucket assignments are
    one projection per table of a shared scan, not extra passes.
    The planes derive deterministically from ``seed`` so results are
    reproducible (rows-only check — approximation is the point).

    All tables share ONE corpus projection: each row emits its
    (table_id, bucket) assignment for every table via posexplode, and
    the per-table bucket joins collapse into a single equi-join on
    (table_id, bucket) — the union over tables of per-table joins is
    identical to one join whose key carries the table id (round-11:
    n_tables corpus scans → 1; the candidate multiset is unchanged,
    so the deduped pair set and the rerank output are too).
    """
    import numpy as np

    _require_dim(dim, "lsh_bucketed_topk")
    rng = np.random.default_rng(seed)
    probes = n_planes if n_probes is None else n_probes

    v = F.col(vec_col).cast("array<double>")
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    # Same RNG consumption order as the historical per-table loop, so
    # every table's planes (and hence every bucket id) are unchanged.
    # Bucket expressions are built as SQL text (_hyperplane_bucket_sql:
    # one parser call instead of n_tables·n_planes·dim py4j literal
    # round-trips — ~1 s of driver plan-construction per query at the
    # registered 4×4×64 grid); values are identical and pinned so in
    # tests/test_round11_shared.py.
    table_planes = [rng.standard_normal((n_planes, dim)).tolist() for _ in range(n_tables)]
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(
            F.expr(
                "array("
                + ",".join(_hyperplane_bucket_sql(vec_sql, p) for p in table_planes)
                + ")"
            )
        ).alias("table_id", "bucket"),
    )
    q_tables = []
    for t, planes in enumerate(table_planes):
        base_bucket = F.expr(_hyperplane_bucket_sql(vec_sql, planes))
        q_tables.append(
            F.struct(
                F.lit(t).alias("table_id"),
                F.array(
                    base_bucket,
                    *[base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(probes)],
                ).alias("buckets"),
            )
        )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(F.array(*q_tables)).alias("t"),
        )
        .select("query_id", F.col("t.table_id").alias("table_id"),
                F.explode("t.buckets").alias("bucket"))
    )
    cand = (
        c.join(F.broadcast(q), on=["table_id", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )

    # exact cosine rerank over the deduped candidates: join vectors
    # back (query side broadcast — it is the small side by contract)
    nbr = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("neighbor_id_vec"),
        _norm(v).alias("neighbor_norm"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("query_id_vec"),
        _norm(v).alias("query_norm"),
    )
    cos = _dot(F.col("query_id_vec"), F.col("neighbor_id_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    scored = (
        cand.join(nbr, on="neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
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
    train_fraction: float | None = None,
    max_train_rows: int = 200_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    + probe-the-nearest-lists exact rerank — the other classic ANN
    scale path beside hyperplane LSH.

    - Train: deterministic numpy Lloyd (``_lloyd_np``) on the bounded
      id-sorted driver-side sample (``_ivf_training_sample`` — the SAME
      training policy as pq_topk/ivfpq_topk and the IVF similarity
      join; ~``max_train_rows`` rows: quantizer quality needs
      ~100-1000 points per centroid, not the whole corpus; fitting
      Lloyd's on 100 TB of vectors would rescan everything per
      iteration for no recall gain). Round-11: this replaced a Spark ML
      ``KMeans.fit`` — at bench scale MLlib's k-means|| init + per-
      iteration jobs cost ~1 s of pure scheduling per query, and its
      training order/parallelism is float-nondeterministic across
      hosts, which is why the registered recall floor carried a
      nondeterminism margin; the numpy trainer is bit-deterministic.
    - Index: each corpus vector assigned to its nearest centroid's
      list IN-PLAN (argmin over centroid-literal squared distances,
      codegen'd — no MLlib transform, no vector-UDT conversion) — at
      scale this is the partitioning/bucketing key, so one query
      touches n_probe/n_lists of the data.
    - Search: each query scores the same centroid literals, explodes
      its n_probe nearest list ids, joins corpus lists, exact cosine
      rerank, window top-k. Corpus assignment and query probing use
      the SAME distance expression (|c|² − 2·x·c: the |x|² term is
      row-constant and cannot move an argmin), so the probed lists are
      exactly the index's nearest lists.

    Deterministic via fixed seed (sampling included). Approximate by
    design → rows-only check; recall asserted in unit tests.
    """
    del train_fraction  # superseded by the bounded id-sorted sample policy

    v = F.col(vec_col).cast("array<double>")
    mat = _ivf_training_sample(
        embeddings, id_col=id_col, vec_col=vec_col, train_rows=max_train_rows
    )
    if mat is None:
        # empty corpus: no candidate can exist; the exact path returns
        # the same (query_id, neighbor_id, cosine) empty frame
        return cosine_topk(embeddings, queries, id_col=id_col, vec_col=vec_col, k=k)
    k_eff, cent = _ivf_centroids(mat, n_lists, seed)
    c2 = (cent * cent).sum(axis=1)

    # squared euclidean to each centroid literal, up to the
    # row-constant |x|²: d'_i = |c_i|² − 2·x·c_i. Sorted structs break
    # ties by list_id — deterministic on every engine. Built as ONE
    # SQL string (see _dot_lit_sql): per-element F.lit over the
    # n_lists×dim centroid grid cost ~1.2 s of driver plan-construction
    # per call site (measured round-11).
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    nearest_sql = "array_sort(array(" + ",".join(
        f"named_struct('d2', {_dlit(c2[i])} - 2.0D * {_dot_lit_sql(vec_sql, cent[i])}, "
        f"'list_id', {i})"
        for i in range(k_eff)
    ) + "))"

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("nvec"),
        _norm(v).alias("nnorm"),
        F.expr(nearest_sql)[0]["list_id"].alias("list_id"),
    )
    probe = F.slice(F.expr(nearest_sql), 1, min(n_probe, k_eff))
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


# minimum cosine the LSH near-dup path is contracted for (the 'auto'
# routing boundary); the band/bit schedule holds recall at THIS
# threshold, so every higher threshold is strictly safer
MIN_LSH_NEAR_DUP_THRESHOLD = 0.95
# target banded miss rate at MIN_LSH_NEAR_DUP_THRESHOLD
_LSH_TARGET_MISS = 1e-6


def _lsh_near_dup_params(
    *, n_rows: int | None, n_bands: int, band_bits: int
) -> tuple[int, int]:
    """(n_bands, band_bits) schedule for banded sign-LSH near-dup.

    bits widen with corpus size so per-bucket occupancy stays ~16
    (linear candidate volume); bands co-scale so banded recall
    1-(1-p^bits)^n_bands keeps the miss rate ≤ _LSH_TARGET_MISS at the
    minimum supported threshold t=0.95 (p=1-arccos(t)/π≈0.899) —
    widening bits alone shrinks p^bits and silently degrades recall
    with corpus growth (round-7 advisor: at 10M rows, bits=20 with a
    fixed 24 bands misses ~5% of true t=0.95 pairs; at 1B rows ~20%).
    Caller-provided values are floors, never caps.
    """
    import math

    bits = band_bits
    if n_rows is not None and n_rows > (16 << band_bits):
        bits = max(band_bits, math.ceil(math.log2(max(n_rows, 2) / 16)))
    bands = n_bands
    if bits > band_bits:
        p_min = 1.0 - math.acos(MIN_LSH_NEAR_DUP_THRESHOLD) / math.pi
        bands = max(
            n_bands,
            math.ceil(math.log(_LSH_TARGET_MISS) / math.log(1.0 - p_min**bits)),
        )
    return bands, bits


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    method: str = "auto",
    n_blocks: int = 16,
    n_bands: int = 24,
    band_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    n_rows: int | None = None,
    block_max_rows: int | None = 250_000,
    ivf_n_lists: int | None = None,
    ivf_n_assign: int | None = None,
    ivf_train_rows: int = 65_536,
    ivf_target_occupancy: int = 128,
    ivf_max_list_rows: int | None = 65_536,
    ivf_assign_mode: str = "sym",
    partition_col: str | None = None,
    ivf_train_df: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ thr).

    Candidate generation (method):
    - ``"lsh"`` — banded sign-bit LSH (SimHash over random hyperplanes):
      each vector gets n_bands band hashes of band_bits sign bits; a
      pair is a candidate iff some band collides. The 100 TB path for
      thresholds ≥ 0.95: candidate generation is a bucketed equi-join,
      linear-ish in corpus size. Recall for a true pair at cos=t is
      1-(1-p^band_bits)^n_bands with p = 1-arccos(t)/π; the defaults
      (24×8) give a ~5e-13 miss rate at t=0.99 and ~2e-6 at t=0.95.
    - ``"ivf"`` — IVF coarse quantizer with ``ivf_n_assign``-way
      multi-assignment: a pair is a candidate iff the two vectors share
      one of their top-m nearest lists (the IVF-join). The 100 TB path
      for MID thresholds (t < 0.95), where sign-LSH banding has
      near-zero recall (at t=0.45, p^14≈2e-3 per band) and the exact
      block path is quadratic: with ``ivf_n_lists`` auto-sized to
      ``ivf_target_occupancy`` the candidate volume is linear in corpus
      size. Approximate — recall is measured, not proven (RECALL
      ledger: 1.0 at the shipped SFs, 0.99 at the 10x probe decade,
      0.92 at 100x under the default auto ``ivf_n_assign``).
      ``ivf_n_assign=None`` (default) scales multi-assignment with the
      list count — m = max(4, ceil(1.5·log2(n_lists))), capped at 32 —
      because a FIXED m loses recall decade-over-decade: the chance
      that both members of a boundary pair share one of m lists falls
      as n_lists grows linearly with the corpus (round-8 verdict #1:
      fixed m=4 measured pair recall 1.0/0.71/0.30 at sf0.1/10x/100x;
      the auto schedule measures 1.0/0.99/0.92 — tuning run in
      scripts/_ivf_recall_experiment.py). Gram compute grows as
      n·occ·m² = n·occ·log²(n/occ) — linear with a polylog factor.
      ``ivf_max_list_rows`` (default 65_536, None disables) is the
      skew guard: list sizing targets AVERAGE occupancy, but duplicate-
      heavy corpora — exactly what a near-dup operator targets — can
      concentrate one hot list into a single scoring task. Lists over
      the cap are deterministically salt-split into ceil(size/cap)
      sub-blocks and scored as sub-block PAIRS (the block kernel
      applied within a list), so single-task memory stays bounded by
      the cap while the pair output is identical (round-8 advisor).
      ``ivf_assign_mode``: ``"sym"`` (default) scores every list
      all × all — a pair is a candidate iff the top-m sets intersect;
      ``"asym"`` (round-11, the FAISS IVF-search shape) Grams only
      HOME rows (each vector's single nearest list) against the
      probe rows, cutting per-list flops from (occ·m)² to occ²·m —
      n·occ·m total, one m factor instead of two — at a weaker
      candidate rule (one member's home ∈ the other's probes), bought
      back by doubling the auto probe width (2m probes still cost
      m/2× less than sym). Recall is measured per mode in the RECALL
      ledger; the scalable registered queries run asym.
    - ``"block"`` — distributed exact block-Gram prefilter: vectors are
      hashed into n_blocks blocks, every block PAIR (n_blocks(n_blocks+1)/2
      of them) is scored as one BLAS matrix product, and pairs scoring
      ≥ threshold−1e-6 become candidates. Exact at any threshold —
      inherently quadratic in blocks, which is the cost of an exact
      all-pairs answer; the guarded oracle twin for the other two.
    - ``"auto"`` — "lsh" when threshold ≥ 0.95 (the near-dup regime the
      operator is named for), else "ivf" (scale-safe at every
      threshold; rounds ≤7 routed mid-thresholds to the guarded
      quadratic "block" path — round-7 verdict #1).

    Either way, candidates are then *verified*: joined back to the
    vectors and re-scored with the sequential-fold double expression,
    so output bits match the naive definition (and the DuckDB oracle)
    exactly. Nothing is ever collected to the driver and no row-level
    crossJoin exists in any path.

    Scale posture (round-7 3-decade probe findings):
    - the block path is guarded at ``block_max_rows`` (default 250k —
      the probe measured the 200k exact answer at ~8 min on 32 cores):
      it is quadratic BY DESIGN, and without a guard a low-threshold
      caller at 100 TB silently gets an all-pairs Gram; pass
      ``block_max_rows=None`` to override.
    - fixed ``band_bits`` makes the LSH path quadratic too once bucket
      occupancy n/2^bits grows (the probe measured it): pass ``n_rows``
      (a driver-side parquet-footer count, never a Spark job) and bits
      scale as max(band_bits, log2(n_rows/16)) so per-bucket occupancy
      stays ~16 and candidate volume stays linear. Growing bits alone
      shrinks per-band collision probability p^bits, so ``n_bands``
      co-scales to hold the banded recall 1-(1-p^bits)^n_bands at a
      ≤1e-6 miss rate for the MINIMUM supported lsh threshold t=0.95
      (p=1-arccos(0.95)/π≈0.899) — without the co-scaling, 10M rows at
      bits=20, bands=24 would miss ~5% of true t=0.95 pairs (round-7
      advisor). At t=0.99 the miss rate is strictly smaller. Explicit
      ``n_bands`` acts as a floor, never a cap.

    Raises:
        BruteForceGuardError: on ``method='block'`` (directly or via
            ``auto`` with threshold < 0.95) when the input exceeds
            ``block_max_rows`` (default 250k; a behavior change in
            round 7 — this previously ran unguarded). Pass
            ``block_max_rows=None`` to run the quadratic path anyway,
            or use ``method='ivf'`` for a scale-safe mid-threshold
            join. When ``n_rows`` is provided the guard is a pure
            comparison (no Spark count job).
    """
    if method == "auto":
        method = "lsh" if threshold >= MIN_LSH_NEAR_DUP_THRESHOLD else "ivf"
    if partition_col is not None and method != "ivf":
        raise ValueError(
            "partition_col (partition-local pair generation) is only "
            "supported on method='ivf' — the lsh/block candidate "
            "generators have no partitioned kernel; filter their exact "
            "pair output instead."
        )
    if method == "lsh":
        bands, bits = _lsh_near_dup_params(
            n_rows=n_rows, n_bands=n_bands, band_bits=band_bits
        )
        cand = _near_dup_candidates_lsh(
            embeddings, id_col=id_col, vec_col=vec_col,
            n_bands=bands, band_bits=bits, seed=seed, dim=dim,
        )
    elif method == "ivf":
        cand = _near_dup_candidates_ivf(
            embeddings, id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_lists=ivf_n_lists, n_assign=ivf_n_assign, seed=seed,
            train_rows=ivf_train_rows, target_occupancy=ivf_target_occupancy,
            n_rows=n_rows, max_list_rows=ivf_max_list_rows,
            assign_mode=ivf_assign_mode, partition_col=partition_col,
            train_df=ivf_train_df,
        )
        # the per-list BLAS prefilter makes the candidate set
        # output-sized per ROW, but the output of a near-dup join is
        # itself corpus-proportional — force-broadcasting it would put
        # an unbounded frame on the driver at 100 TB, so let AQE pick
        # the verify join strategy (round-8 advisor: broadcast_cand
        # was documented but never passed)
        return _verify_pairs_exact(
            embeddings, cand, id_col=id_col, vec_col=vec_col,
            threshold=threshold, broadcast_cand=False,
        )
    elif method == "block":
        guards.guard_brute_force(
            embeddings,
            max_rows=block_max_rows,
            op="embedding_near_dup_pairs(method='block')",
            scale_path=(
                "method='ivf' (coarse-quantizer bucketed join, any threshold) "
                "or method='lsh' with n_rows for t>=0.95"
            ),
            n_rows=n_rows,
        )
        cand = _near_dup_candidates_block(
            embeddings, id_col=id_col, vec_col=vec_col,
            threshold=threshold, n_blocks=n_blocks,
        )
    else:
        raise ValueError(
            f"method must be 'auto', 'lsh', 'ivf' or 'block', not {method!r}"
        )
    return _verify_pairs_exact(
        embeddings, cand, id_col=id_col, vec_col=vec_col, threshold=threshold
    )


def _near_dup_candidates_block(
    embeddings: DataFrame, *, id_col: str, vec_col: str, threshold: float,
    n_blocks: int,
) -> DataFrame:
    """Exact candidate pairs via distributed block-pair BLAS Gram.

    One shuffle packs each hash block into (ids, vecs) arrays; the
    block-pair join replicates each block n_blocks times (the inherent
    (N/B)² data amplification of exact all-pairs — tune n_blocks so a
    block pair fits an executor); each pair row is scored as a single
    float64 matrix product. The 1e-6 margin dwarfs the ~1e-15 BLAS-vs-
    sequential-fold summation difference, so recall is exact.
    """
    import numpy as np
    import pandas as pd

    blocks = (
        embeddings.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("bid"),
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .groupBy("bid")
        .agg(F.collect_list("id").alias("ids"), F.collect_list("vec").alias("vecs"))
    )
    # Block-pair enumeration as an explode + EQUI-join, not the naive
    # non-equi self-join on bid_a <= bid_b: a range self-join compiles
    # to BroadcastNestedLoopJoin only while the packed-block frame fits
    # the broadcast threshold, then silently degrades to a
    # CartesianProduct (caught by the probe's per-decade join-strategy
    # telemetry at 10x). Exploding each block's partner-id list keeps
    # the identical (N/B)² replication volume but ships it through a
    # hash-partitioned join at every scale.
    a = blocks.select(
        F.col("bid").alias("bid_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
        F.explode(F.sequence(F.col("bid"), F.lit(n_blocks - 1))).alias("bid_b"),
    )
    b = blocks.select(
        F.col("bid").alias("bid_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    pairs = a.join(b, on="bid_b")
    margin = 1e-6

    def score(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_a])
                mb = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_b])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                sims = ma @ mb.T
                ia, ib = np.nonzero(sims >= threshold - margin)
                lo, hi = ids_a[ia], ids_b[ib]
                if row.bid_a == row.bid_b:
                    # diagonal block pair: sims holds BOTH (i,j) and
                    # (j,i) plus the self diagonal — keep the strict
                    # upper triangle by id
                    keep = lo < hi
                else:
                    # off-diagonal: each unordered pair appears exactly
                    # once (ids are globally unique, so lo != hi always)
                    # — keep all, normalize orientation below
                    keep = lo != hi
                yield pd.DataFrame(
                    {"id_a": np.minimum(lo, hi)[keep], "id_b": np.maximum(lo, hi)[keep]}
                )

    return pairs.mapInPandas(score, schema="id_a long, id_b long")


def _near_dup_candidates_lsh(
    embeddings: DataFrame, *, id_col: str, vec_col: str,
    n_bands: int, band_bits: int, seed: int, dim: int | None = None,
) -> DataFrame:
    """Candidate pairs via banded sign-bit LSH (bucketed equi-join)."""
    import numpy as np
    import pandas as pd

    _require_dim(dim, "embedding_near_dup_pairs(method='lsh')")
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * band_bits, dim))
    weights = (1 << np.arange(band_bits, dtype=np.uint64)).astype(np.uint64)

    def band_hashes(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (mat @ planes.T >= 0).astype(np.uint64)  # (n, bands*bits)
            hashes = bits.reshape(len(ids), n_bands, band_bits) @ weights  # (n, bands)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_bands),
                    "band_id": np.tile(np.arange(n_bands, dtype=np.int32), len(ids)),
                    "band_hash": hashes.astype(np.int64).ravel(),
                }
            )

    stacked = embeddings.select(id_col, vec_col).mapInPandas(
        band_hashes, schema="id long, band_id int, band_hash long"
    )
    a = stacked.select(F.col("id").alias("id_a"), "band_id", "band_hash")
    b = stacked.select(F.col("id").alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _ivf_training_sample(
    embeddings: DataFrame, *, id_col: str, vec_col: str, train_rows: int
):
    """Bounded, id-sorted driver-side training sample as a normalized
    float64 matrix (the pq_topk/ivf_topk training policy — one bounded
    job, the codebook becomes a plan literal), or None when the input
    is empty. Shared by the IVF-join candidate generator and the Gram
    cost contract so both see the SAME codebook.

    Memoized per pass (round 11, caching.shared_driver_value): up to
    five consumers per bench pass collected the identical sample from
    the identical session-cached DataFrame object (~0.2–0.5 s of
    collect each). Keyed on the frame OBJECT (strong ref — no id()
    aliasing) + the sampling params; the returned matrix is marked
    read-only so an accidental in-place mutation downstream fails
    loudly instead of corrupting later hits."""
    import numpy as np

    from streaming_ecom_analytics_spark.caching import shared_driver_value

    def build():
        sample = [
            r[0]
            for r in embeddings.select(vec_col)
            .orderBy(id_col)
            .limit(train_rows)
            .collect()
        ]
        if not sample:
            return ()  # sentinel: memoizable "empty input"
        mat = np.asarray(sample, dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        mat.flags.writeable = False
        return mat

    out = shared_driver_value(
        embeddings, ("ivf_sample", id_col, vec_col, train_rows), build
    )
    return None if isinstance(out, tuple) else out


def _ivf_centroids(mat, n_lists: int, seed: int):
    """(k_eff, unit-normalized centroids) from the deterministic numpy
    Lloyd over a prepared training matrix — the IVF coarse quantizer
    shared by the join and the cost contract. Memoized per pass keyed
    on the (memoized, read-only) sample matrix object + (n_lists,
    seed) — consumers with the same corpus and list sizing skip the
    repeated numpy Lloyd (round 11)."""
    import numpy as np

    from streaming_ecom_analytics_spark.caching import shared_driver_value

    def build():
        rng = np.random.default_rng(seed)
        k_eff, cent = _lloyd_np(mat, n_lists, rng)
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
        )
        cent.flags.writeable = False
        return k_eff, cent

    return shared_driver_value(mat, ("ivf_centroids", n_lists, seed), build)


def _ivf_auto_n_assign(n_lists: int) -> int:
    """Multi-assignment schedule for the IVF similarity join: m grows
    with log2 of the list count so pair recall holds decade-over-decade
    (round-8 verdict #1 — fixed m=4 measured 1.0/0.71/0.30 at
    sf0.1/10x/100x; this schedule measures 1.0/0.99/0.92 on the same
    corpora, tuning grid in scripts/_ivf_recall_experiment.py). The
    floor 4 keeps tiny corpora at full pigeonhole recall; the cap 32
    bounds the worst-case Gram blow-up at m²=1024× a single-assignment
    pass — reached only past ~2^21 lists (≈550M rows at 256-row
    occupancy), where a two-level coarse quantizer is the honest next
    step anyway.

    Why NOT the "raise occupancy with scale so m falls" lever (round-9
    verdict #3 prose): total Gram work is n·occ·m(n/occ)² with
    m = 1.5·log2(n_lists); minimizing over occ gives a scale-INDEPENDENT
    optimum m* = 3/ln2 ≈ 4.3 — i.e. the cost-optimal schedule is
    round-8's fixed m≈4, which measured pair recall 0.30 at 100×.
    The super-linear m² factor is therefore recall-bought, not an
    inefficiency: RECALL_r10's Gram-cost contract measures observed ≈
    0.98-0.99 of the n·occ·m²·d flops model at the probe decades, so
    wall time IS the model. The implemented cost levers keep recall
    intact instead: float32 Gram + float32 shuffle bytes (round 10),
    fp16 inputs as the next documented ~2× (needs a wider re-verified
    margin: (d+2)·eps_fp16 ≈ the threshold band), and the two-level
    quantizer past the cap."""
    import math

    return max(4, min(32, math.ceil(1.5 * math.log2(max(n_lists, 2)))))


def _near_dup_candidates_ivf(
    embeddings: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_lists: int | None,
    n_assign: int | None,
    seed: int,
    train_rows: int,
    target_occupancy: int,
    n_rows: int | None,
    max_list_rows: int | None,
    assign_mode: str = "sym",
    partition_col: str | None = None,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs via an IVF coarse quantizer with multi-assignment
    — the scale-safe MID-THRESHOLD candidate generator (round-7 verdict
    #1: sign-LSH banding has near-zero recall at t≈0.45 and the exact
    block-Gram path is quadratic).

    Shape: numpy Lloyd trains ``n_lists`` spherical centroids on a
    bounded, id-sorted driver-side sample (the pq_topk/ivf_topk training
    policy — one bounded job, codebook becomes a plan literal); one
    Arrow-batched mapInPandas pass assigns every vector to its
    ``n_assign`` nearest lists (multi-assignment is the symmetric form
    of the classic IVF-join's same-list ∪ adjacent-probe rule: a pair
    is a candidate iff the two top-m list sets intersect); each list is
    then packed by ONE shuffle of (n·m) vectors and scored as a single
    per-list BLAS Gram (the block-Gram kernel applied to IVF lists
    instead of hash blocks — and only to the diagonal, never to list
    PAIRS), emitting pairs ≥ threshold−1e-6. With ``n_lists`` sized to
    a fixed ``target_occupancy`` (n/occ lists), per-list work is occ²
    and list count is n/occ, so compute is n·occ·m² — LINEAR in corpus
    size, never all-pairs — and the emitted candidate set is
    OUTPUT-sized (true pairs + margin noise), so the exact re-verify
    stays a broadcast join at any corpus size. An earlier shape
    (round-8 first cut) materialized all Σ occ² candidate id-pairs
    through a self-equi-join + distinct and re-joined vectors twice:
    the probe measured it at 59 s / exp 1.12 at the 10x decade vs this
    shape's 2.8-5.5 s — shuffling 40M id pairs costs far more than
    BLAS-scoring them in place. Vectors travel the packing shuffle as
    little-endian FLOAT16 bytes (round 12 — the round-10 docstring's
    "fp16 inputs as the next documented ~2x" lever, now taken: the
    packing shuffle is the n·m byte term that dominates at 100 TB
    when output is sparse) and each list is scored in applyInArrow as
    a float32 Gram over one bulk fp16→f32 upcast, with a 2e-3
    prefilter margin — 2x the certified fp16 dot error bound (~1e-3,
    derivation at the margin_threshold assignment), so no
    exact-threshold pair is ever dropped; candidates only WIDEN and
    the float64 re-verify keeps output bits identical. The
    array<double> + collect_list form this replaced spent ~40 s of
    the 100x point in per-element Python boxing (measured; the round-9
    query ran that decade in ~30 s, exponent 0.69).

    Approximate by design: a qualifying pair whose list sets are
    disjoint is missed, so callers hold it to a measured recall
    contract (RECALL ledger / registered recall queries) rather than
    an exactness proof — on the repo testdata the registered settings
    (footer-count auto-sizing at 256-row occupancy, log-scaled
    multi-assignment via _ivf_auto_n_assign) measure pair recall 1.0
    at sf0.001/sf0.01/sf0.1 vs the exact block twin, 0.99 at the 10x
    probe decade (m=10 over 79 lists) and 0.92 at 100x (m=15 over 782
    lists) — qualifying t=0.45 pairs in this near-uniform testdata are
    ~3.6σ distribution tails, the hardest case for metric
    partitioning; clustered real embeddings sit higher.

    ``partition_col`` (round-10, SemDeDup pushdown — round-9 verdict
    #4): when set (a long-castable column on ``embeddings``), lists
    are keyed by (partition, list_id) and pairs are only generated
    WITHIN a partition value. For a caller that would filter the pair
    set to same-partition anyway (SemDeDup's cluster-locality rule),
    this is output-identical to filter-after-join — a same-partition
    pair that shares an IVF list also shares the (partition, list)
    key — but cross-partition candidates are never Gram-scored: with
    k roughly-even partitions, per-list Gram work drops ~k× (Σ_c f_c²
    of the occ² term). Training/assignment are unchanged (centroids
    see the whole corpus), so recall events are identical too.
    """
    import numpy as np
    import pandas as pd

    # ``train_df``: an alternate frame to draw the bounded training
    # sample from (round 11). SemDeDup's cluster-pushdown path calls
    # this generator on embeddings ⋈ cluster-assignment — a 1:1 join
    # that leaves (id, vec) values identical — so sampling from the
    # UNJOINED corpus frame yields the same id-sorted sample while
    # letting the per-pass sample/centroid memo hit the same entry as
    # the plain IVF-join consumers (one collect + one Lloyd per pass
    # for the whole family instead of one per query).
    mat = _ivf_training_sample(
        embeddings if train_df is None else train_df,
        id_col=id_col,
        vec_col=vec_col,
        train_rows=train_rows,
    )
    if mat is None:
        # empty (or filtered-to-empty) input: np.linalg.norm on a
        # shape-(0,) array raises AxisError at plan construction —
        # return the empty candidate frame the block path would have
        # produced (round-8 advisor)
        return embeddings.sparkSession.createDataFrame(
            [], "id_a long, id_b long"
        )
    if n_lists is None:
        if n_rows is not None:
            n = n_rows
        elif mat.shape[0] < train_rows:  # sample not capped → full corpus
            n = mat.shape[0]
        else:
            raise ValueError(
                "embedding_near_dup_pairs(method='ivf'): auto n_lists needs "
                "the corpus size — pass n_rows=<parquet-footer count> (the "
                "training sample was capped, so it cannot infer it) or pass "
                "n_lists explicitly."
            )
        n_lists = max(4, -(-n // target_occupancy))  # ceil
    if assign_mode not in ("sym", "asym"):
        raise ValueError(
            f"assign_mode must be 'sym' or 'asym', not {assign_mode!r}"
        )
    # 'asym' (FAISS home×probe Gram, n·occ·m flops vs sym's n·occ·m²)
    # is an explicit OPT-IN for BLAS-degraded deployments only: round-11
    # measured it on a healthy host (820 GFLOP/s) at 2x SLOWER at both
    # probe decades (118.7 s vs 61.2 s at 100x) with ~0.66 relative
    # recall at the doubled auto probe width — because on healthy hosts
    # the kernel is bound by the n·m per-row costs (assignment
    # serialization, the vec shuffle), not the Gram, so doubling m to
    # buy back recall doubles the actual bottleneck. The r10 "wall time
    # IS the flops model" adjudication held on 121-360 GFLOP/s hosts,
    # where the Gram term really dominates — there asym's m-for-m²
    # trade pays. The registered queries run sym; the shipped round-11
    # scale lever is the Arrow-native kernel below (2.6x at 100x).
    asym = assign_mode == "asym"
    k_eff, cent = _ivf_centroids(mat, n_lists, seed)
    if n_assign is None:
        n_assign = _ivf_auto_n_assign(n_lists)
        if asym:
            # asym trades the m² Gram factor for m (see below), so it can
            # afford double the probe width at still far fewer flops:
            # 2m ≤ m² for every m ≥ 2 on the auto schedule (m ≥ 4)
            n_assign = min(32, 2 * n_assign)
    m = min(n_assign, k_eff)
    # the assignment threshold travels with the Gram scorer. Round 10:
    # the per-list Gram runs in FLOAT32 (the round-9 verdict's "fp16
    # Gram if recall margin allows" lever, taken at fp32): ~2x BLAS
    # throughput and half the packing-shuffle bytes, paid for by a
    # wider prefilter margin — a float32 dot of dim-64 unit vectors is
    # within (dim+2)·eps_f32 ≈ 8e-6 of the exact value (plus ~2e-7
    # normalization error), so a 1e-4 margin can NEVER drop a pair
    # whose exact cosine clears the threshold: candidates only widen,
    # recall is monotonically >= the float64/1e-6 shape's, and the
    # exact float64 re-verify prunes the extra margin noise so output
    # bits are unchanged. (The block path keeps float64 + 1e-6: it is
    # the EXACT oracle twin and 1e-6 would not dwarf float32 error.)
    # Round 12 (§2.3 narrower types): vectors travel the packing shuffle
    # as little-endian FLOAT16 — half of round-10's float32 bytes, and
    # the packing shuffle is the n·m term that dominates at 100 TB when
    # output is sparse. Certified error chain for a dot of f64-unit
    # vectors quantized f64→f32→f16 and accumulated in float32:
    #   per-component relative error ≤ 2^-11 (+2^-24), two operands →
    #   |dot16 − dot64| ≤ 2·2^-11·Σ|x_i||y_i| ≤ 2·2^-11·‖x‖‖y‖ = 2^-10
    #   (Cauchy-Schwarz), plus f32 accumulation ≤ (d+2)·2^-24 ≈ 4e-6
    #   and ~2e-7 normalization error → bound ≈ 1.0e-3.
    # The margin is set to 2e-3 (2x the bound): a pair whose exact
    # cosine clears the threshold can NEVER fall below it, so the
    # candidate set only WIDENS vs the float32/1e-4 shape — recall is
    # monotonically >= and the float64 re-verify prunes the extra
    # margin noise, so output bits are unchanged (unit-pinned).
    margin_threshold = threshold - 2e-3

    def assign(batches):
        # Arrow-NATIVE (round-11): the mapInPandas form of this stage
        # spent ~27 s of the 100x decade's wall in per-row Python —
        # 200k list→ndarray conversions on the way in and n·m tobytes()
        # boxings on the way out — while its Gram flops were ~1.5 TFLOP
        # (≈5-10 s of BLAS on a healthy host): the kernel is bound by
        # per-row serialization, not arithmetic (see assign_mode note).
        # mapInArrow removes both loops: the input ListArray flattens
        # to one (n, dim) ndarray view, and the output vec column is
        # built as ONE binary Array over the repeated float32 buffer
        # (fixed 2·dim-byte stride offsets). Measured: assignment
        # 27 s → 11.6 s, full candidate stage 130.7 s → 49.3 s cold /
        # 21.5 s warm at the 100x decade, byte-identical pair output.
        # Vectors travel as little-endian FLOAT16 since round 12 (half
        # of round-10's float32 bytes, margin-covered — see the
        # margin_threshold note); assignment top-m stays float64 so
        # the list schedule is bit-stable.
        import pyarrow as pa

        names = (
            (["pc"] if partition_col is not None else [])
            + ["list_id", "id", "vec"]
            + (["is_home"] if asym else [])
        )
        for b in batches:
            if b.num_rows == 0:
                continue
            cols_in = {n_: i for i, n_ in enumerate(b.schema.names)}
            ids = (
                b.column(cols_in[id_col])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            v = np.asarray(
                b.column(cols_in[vec_col]).flatten(), dtype=np.float64
            ).reshape(b.num_rows, -1)
            # not in-place: asarray over an Arrow float64 buffer is a
            # read-only zero-copy view (float32 inputs copy on cast)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            dots = v @ cent.T  # (n, k_eff) cosine to centroids
            top = np.argpartition(-dots, m - 1, axis=1)[:, :m]
            # float16 copies: see the margin_threshold note — the 2e-3
            # margin certifies no exact-threshold pair is ever dropped
            rep = np.repeat(v.astype(np.float16), m, axis=0)
            nm, dim_ = rep.shape
            offsets = pa.py_buffer(
                (np.arange(nm + 1, dtype=np.int32) * (dim_ * 2)).tobytes()
            )
            vec = pa.Array.from_buffers(
                pa.binary(), nm, [None, offsets, pa.py_buffer(rep.tobytes())]
            )
            arrays = [
                pa.array(top.astype(np.int32).ravel()),
                pa.array(np.repeat(ids, m)),
                vec,
            ]
            if asym:
                # home = the single nearest list; the scorer Grams
                # home-rows × all-rows instead of all × all
                home = np.argmax(dots, axis=1)
                arrays.append(
                    pa.array((top == home[:, None]).ravel().astype(np.int8))
                )
            if partition_col is not None:
                arrays.insert(
                    0,
                    pa.array(
                        np.repeat(
                            b.column(cols_in[partition_col])
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                            m,
                        )
                    ),
                )
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    keys = (["pc"] if partition_col is not None else []) + ["list_id"]
    sel = [id_col, vec_col] + (
        [partition_col] if partition_col is not None else []
    )
    pc_ddl = "pc long, " if partition_col is not None else ""
    home_ddl = ", is_home byte" if asym else ""
    stacked = embeddings.select(*sel).mapInArrow(
        assign, schema=f"{pc_ddl}list_id int, id long, vec binary{home_ddl}"
    )

    # sims row-tile so the Gram scratch is TILE×occ, never occ² — the
    # raw group input (occ·dim·4 bytes, float32) stays the only
    # occ-linear allocation in a scoring task
    tile = 4096

    def _emit_pairs(ids_a, mat_a, ids_b, mat_b):
        outs_a, outs_b = [], []
        for i0 in range(0, len(ids_a), tile):
            sims = mat_a[i0 : i0 + tile] @ mat_b.T
            ia, ib = np.nonzero(sims >= margin_threshold)
            lo, hi = ids_a[ia + i0], ids_b[ib]
            keep = lo != hi
            outs_a.append(np.minimum(lo, hi)[keep])
            outs_b.append(np.maximum(lo, hi)[keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outs_a) if outs_a else np.empty(0, np.int64),
                "id_b": np.concatenate(outs_b) if outs_b else np.empty(0, np.int64),
            }
        )

    def _binary_col_matrix(tbl, col):
        # zero-copy: every row is a fixed 2·dim-byte value, so the
        # BinaryArray data buffer IS the packed float16 matrix — one
        # frombuffer instead of n_rows bytes objects re-joined. The
        # Gram still runs in float32 (sgemm): one bulk upcast per list.
        import pyarrow as pa  # noqa: F401

        arr = tbl.column(col).combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        return np.frombuffer(
            arr.buffers()[2],
            dtype="<f2",
            count=(int(offs[-1]) - int(offs[0])) // 2,
            offset=int(offs[0]),
        ).reshape(len(arr), -1).astype(np.float32)

    def score(tbl):
        # one group = one IVF list, delivered as ONE Arrow table by
        # applyInArrow (round-11: the applyInPandas form re-boxed every
        # vec row into a Python bytes object; this reads the packed
        # buffer directly — see the assign note for measurements)
        import pyarrow as pa

        ids = tbl.column("id").to_numpy().astype(np.int64)
        mat_l = _binary_col_matrix(tbl, "vec")
        # vectors arrive pre-normalized (float64 norm, then f32 cast)
        if asym:
            # asym (FAISS IVF-search shape): Gram only home-rows × all
            # probe-rows — occ × occ·m flops per list instead of
            # (occ·m)², i.e. n·occ·m total instead of n·occ·m². A pair
            # is caught iff one member's HOME list is in the other's
            # top-m probes (a subset of the sym intersect rule, bought
            # back with the doubled auto probe width).
            hm = tbl.column("is_home").to_numpy().astype(np.int8) == 1
            out = _emit_pairs(ids[hm], mat_l[hm], ids, mat_l)
        else:
            out = _emit_pairs(ids, mat_l, ids, mat_l)
        return pa.Table.from_pandas(out, preserve_index=False)

    if max_list_rows is None:
        return (
            stacked.groupBy(*keys)
            .applyInArrow(score, schema="id_a long, id_b long")
            .distinct()
        )

    # ---- fat-list skew guard (round-8 advisor / verdict #2) ----
    # list sizing targets AVERAGE occupancy; a duplicate-heavy corpus
    # can put one hot list's entire membership into a single scoring
    # task. Exact per-list counts come from a lightweight second
    # assignment pass that ships only the int32 list_id (no vector
    # bytes) — one extra columnar scan, no unbounded state. Lists over
    # the cap are salt-split into ceil(size/cap) sub-blocks and scored
    # as sub-block PAIRS (the block kernel applied WITHIN a list), so
    # a degenerate corpus costs many bounded tasks instead of one
    # unbounded one; pair output is identical (union ∪ distinct).
    def assign_counts(batches):
        # Arrow-native like assign: int32 list ids only, no vector bytes
        import pyarrow as pa

        names = (["pc"] if partition_col is not None else []) + ["list_id"]
        for b in batches:
            if b.num_rows == 0:
                continue
            cols_in = {n_: i for i, n_ in enumerate(b.schema.names)}
            v = np.asarray(
                b.column(cols_in[vec_col]).flatten(), dtype=np.float64
            ).reshape(b.num_rows, -1)
            # not in-place: asarray over an Arrow float64 buffer is a
            # read-only zero-copy view (float32 inputs copy on cast)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            dots = v @ cent.T
            top = np.argpartition(-dots, m - 1, axis=1)[:, :m]
            arrays = [pa.array(top.astype(np.int32).ravel())]
            if partition_col is not None:
                arrays.insert(
                    0,
                    pa.array(
                        np.repeat(
                            b.column(cols_in[partition_col])
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                            m,
                        )
                    ),
                )
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    fat = (
        embeddings.select(*sel[1:])  # vec_col (+ partition_col)
        .mapInArrow(assign_counts, schema=f"{pc_ddl}list_id int")
        .groupBy(*keys)
        .agg(F.count("*").alias("list_rows"))
        .filter(F.col("list_rows") > max_list_rows)
        .select(
            *keys,
            F.ceil(F.col("list_rows") / max_list_rows).cast("int").alias("n_salts"),
        )
    )
    # the fat set is bounded by total_assignments/cap rows — broadcast
    enriched = stacked.join(F.broadcast(fat), on=keys, how="left")
    small_pairs = (
        enriched.filter(F.col("n_salts").isNull())
        .select(*keys, "id", "vec", *(["is_home"] if asym else []))
        .groupBy(*keys)
        .applyInArrow(score, schema="id_a long, id_b long")
    )
    # NOTE: the fat-list salt-split path below scores sub-blocks
    # symmetrically (all × all within the hot list) in BOTH modes —
    # a candidate SUPERSET of the asym rule, flop-bounded by the cap²
    # sub-block size, so the skew guard never costs asym recall.

    packed = (
        enriched.filter(F.col("n_salts").isNotNull())
        .withColumn(
            "salt", F.pmod(F.xxhash64(F.col("id")), F.col("n_salts")).cast("int")
        )
        .groupBy(*keys, "salt")
        .agg(F.collect_list("id").alias("ids"), F.collect_list("vec").alias("vecs"))
    )
    pa_ = packed.select(
        *[F.col(k).alias(f"{k}_a") for k in keys],
        F.col("salt").alias("salt_a"),
        F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a"),
    )
    pb_ = packed.select(
        *[F.col(k).alias(f"{k}_b") for k in keys],
        F.col("salt").alias("salt_b"),
        F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b"),
    )
    key_eq = [F.col(f"{k}_a") == F.col(f"{k}_b") for k in keys]
    cond = key_eq[0]
    for e in key_eq[1:]:
        cond = cond & e
    sub_pairs = pa_.join(pb_, cond & (F.col("salt_a") <= F.col("salt_b")))

    def score_sub_blocks(batches):
        # collect_list(binary) boxes one bytes object per ROW (not per
        # element — the array<double> boxing the round-8 shape avoided)
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.frombuffer(b"".join(row.vecs_a), dtype="<f2").reshape(
                    len(ids_a), -1
                ).astype(np.float32)
                mb = np.frombuffer(b"".join(row.vecs_b), dtype="<f2").reshape(
                    len(ids_b), -1
                ).astype(np.float32)
                yield _emit_pairs(ids_a, ma, ids_b, mb)

    fat_pairs = sub_pairs.mapInPandas(
        score_sub_blocks, schema="id_a long, id_b long"
    )
    return small_pairs.unionByName(fat_pairs).distinct()


def _verify_pairs_exact(
    embeddings: DataFrame, cand: DataFrame, *, id_col: str, vec_col: str,
    threshold: float, broadcast_cand: bool = True,
) -> DataFrame:
    """Re-score candidate pairs with the sequential-fold expression —
    output bits match the naive all-pairs definition exactly. For the
    high-threshold paths the candidate set is output-sized (plus margin
    noise), hence broadcast; the IVF path's candidates are
    occupancy-bounded (linear in corpus size but potentially large), so
    it passes ``broadcast_cand=False`` and lets AQE pick the join."""
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
        (F.broadcast(cand) if broadcast_cand else cand)
        .join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def recall_vs_exact(
    approx: DataFrame, exact: DataFrame, *, min_mean_recall: float
) -> DataFrame:
    """Checkable ANN quality assertion: mean recall of ``approx``
    against the brute-force ``exact`` top-k (both (query_id,
    neighbor_id, ...) frames).

    Output is ONE row — (n_queries, mean_recall_ok) — so an external
    oracle can verify the claim without replicating engine-specific
    hashing: the SQL twin just asserts the same row. Per-query recall
    floors don't hold for sign-LSH over near-uniform vectors (cosine
    concentrates at high dim), so the aggregate is the honest bound;
    the actual neighbor lists remain unit-tested library surface.
    """
    hits = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), on=["query_id", "neighbor_id"]
    )
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("n_true"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            on="query_id",
            how="left",
        )
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias("recall"),
        )
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        (F.avg("recall") >= F.lit(min_mean_recall)).alias("mean_recall_ok"),
    )


def pairs_recall_vs_exact(
    approx_pairs: DataFrame, exact_pairs: DataFrame, *, min_recall: float
) -> DataFrame:
    """Checkable similarity-JOIN quality assertion: recall of an
    approximate (id_a, id_b) pair set against the exact one.

    Output is ONE row — (n_exact_pairs, recall_ok) — the pairs-join
    counterpart of ``recall_vs_exact``: the SQL oracle recomputes the
    exact pair count (quadratic SQL is fine at oracle scale) and
    asserts the same row, so a candidate-generation recall regression
    flips a driver-checked boolean instead of hiding in an
    approximate-by-design rows-only check."""
    hits = approx_pairs.select("id_a", "id_b").join(
        exact_pairs.select("id_a", "id_b"), on=["id_a", "id_b"]
    )
    return exact_pairs.agg(F.count("*").alias("n_exact_pairs")).crossJoin(
        F.broadcast(hits.agg(F.count("*").alias("__n_hit")))
    ).select(
        "n_exact_pairs",
        (
            F.coalesce(F.col("__n_hit"), F.lit(0))
            >= F.ceil(F.lit(float(min_recall)) * F.col("n_exact_pairs"))
        ).alias("recall_ok"),
    )


def ivf_gram_cost_contract(
    embeddings: DataFrame,
    *,
    n_rows: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_occupancy: int = 256,
    train_rows: int = 65_536,
    seed: int = 42,
    max_skew_ratio: int = 4,
    emit_observed: bool = False,
) -> DataFrame:
    """Cost-at-scale contract for the IVF similarity join (round-9
    verdict #7): one row carrying the join's multi-assignment schedule
    and its PREDICTED Gram work, plus a falsifiable skew bound on the
    OBSERVED work — so the join's compute curve is a driver-checkable
    number alongside its recall, not prose in SCALE.md.

    - ``n_lists`` / ``m_assign`` — the schedule the join derives from
      the parquet-footer count: n_lists = max(4, ceil(n/occ)),
      m = max(4, min(32, ceil(1.5·log2(n_lists)))). (The join's
      effective m is min(m_assign, k_eff); they are equal whenever
      Lloyd retains ≥ m lists — true on every shipped corpus and
      unit-asserted.)
    - ``predicted_gram_mflops`` — the uniform-occupancy model
      n·occ·m²·dim·2 (each of n/occ lists holds ~occ·m multi-assigned
      members and costs (occ·m)²·dim·2 flops), in integer megaflops —
      exactly reproducible by the SQL twin from COUNT(*).
    - ``gram_skew_ok`` — observed Σ_l cnt_l²·dim·2 (cnt_l from a real
      assignment pass over the corpus with the SAME codebook the join
      trains) ≤ max_skew_ratio × predicted. Observed/predicted =
      1 + CV² of list occupancy, so the default 4 tolerates CV ≤ √3;
      a skew regression (degenerate centroids, hot lists) flips the
      boolean. The exact measured ratio per decade lives in the RECALL
      ledger, where cross-engine exactness is not required.

    One bounded training job + one columnar assignment-count scan
    (int32 list ids only — no vector bytes); scalar aggregate output.
    ``emit_observed=True`` adds the raw ``observed_gram_mflops``
    column for ledgers (scripts/recall_report.py) — data-dependent on
    the trained codebook, hence NOT part of the oracle-checked row.
    """
    import numpy as np
    import pandas as pd

    n_lists = max(4, -(-n_rows // target_occupancy))  # ceil
    m_sched = _ivf_auto_n_assign(n_lists)
    # keep the bound in RAW flops: flooring to integer megaflops first
    # made predicted 0 for any corpus under ~1e6 raw flops, so
    # gram_skew_ok was spuriously false on tiny non-empty inputs even
    # with perfectly uniform lists (round-10 advisor); the mflops
    # column below is reporting-only
    predicted_flops = n_rows * target_occupancy * m_sched * m_sched * dim * 2
    predicted_mflops = predicted_flops // 1_000_000
    mat = _ivf_training_sample(
        embeddings, id_col=id_col, vec_col=vec_col, train_rows=train_rows
    )
    spark = embeddings.sparkSession
    if mat is None:  # empty corpus: zero observed work, bound holds
        obs = spark.range(1).select(F.lit(0).cast("long").alias("sum_c2"))
    else:
        k_eff, cent = _ivf_centroids(mat, n_lists, seed)
        m_eff = min(m_sched, k_eff)

        def assign_counts(batches):
            # Arrow-native like the join kernel's counting pass (r11)
            import pyarrow as pa

            for b in batches:
                if b.num_rows == 0:
                    continue
                v = np.asarray(
                    b.column(0).flatten(), dtype=np.float64
                ).reshape(b.num_rows, -1)
                v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
                dots = v @ cent.T
                top = np.argpartition(-dots, m_eff - 1, axis=1)[:, :m_eff]
                yield pa.RecordBatch.from_arrays(
                    [pa.array(top.astype(np.int32).ravel())], names=["list_id"]
                )

        obs = (
            embeddings.select(vec_col)
            .mapInArrow(assign_counts, schema="list_id int")
            .groupBy("list_id")
            .agg(F.count("*").alias("c"))
            .agg(
                F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)).alias(
                    "sum_c2"
                )
            )
        )
    cols = [
        F.lit(n_lists).cast("long").alias("n_lists"),
        F.lit(m_sched).cast("long").alias("m_assign"),
        F.lit(predicted_mflops).cast("long").alias("predicted_gram_mflops"),
        (
            F.col("sum_c2") * F.lit(dim * 2)
            <= F.lit(max_skew_ratio * predicted_flops)
        ).alias("gram_skew_ok"),
    ]
    if emit_observed:
        cols.append(
            (F.col("sum_c2") * F.lit(dim * 2) / F.lit(1_000_000))
            .cast("long")
            .alias("observed_gram_mflops")
        )
    return obs.select(*cols)


def _lloyd_np(sub, k: int, rng, iters: int = 12):
    """Deterministic numpy Lloyd over one (already-prepared) matrix:
    seeded choice init, fixed iteration count, empty clusters re-seeded
    from the rng stream. Returns (k_eff, centroids).

    The centroid update is one vectorized scatter-add pass
    (np.add.at + bincount) — the earlier per-cluster masked-mean loop
    rescanned the whole sample k times per iteration, which at the
    IVF join's corpus-scaled k (782 lists at the 100x probe) cost
    18.5 s of pure Python/numpy overhead vs ~2 s vectorized; results
    are deterministic and numerically equivalent within final-ULP
    rounding of the mean (np.add.at accumulates sequentially where
    np.mean may sum pairwise, so individual centroid coordinates can
    differ in the last ULP — all round-8 ledgers were regenerated
    through this helper, so PQ/IVF/IVFPQ hashes reflect it; the rng
    stream is consumed in the same order because reseeds draw one
    integer per empty cluster in ascending cluster order, as before)."""
    import numpy as np

    n = sub.shape[0]
    k_eff = min(k, n)
    cent = sub[rng.choice(n, size=k_eff, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via the expanded form; argmin
        # assignment; empty clusters re-seeded deterministically
        d2 = (
            (sub * sub).sum(1, keepdims=True)
            - 2.0 * sub @ cent.T
            + (cent * cent).sum(1)
        )
        assign = d2.argmin(1)
        counts = np.bincount(assign, minlength=k_eff)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, sub)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        for c in np.nonzero(~nonempty)[0]:
            cent[c] = sub[rng.integers(0, n)]
    return k_eff, cent


def _train_codebooks_mat(mat, m: int, n_centroids: int, seed: int, iters: int = 12):
    """Per-subspace k-means codebooks over a prepared (n, dim) float64
    matrix — no normalization applied here, so callers can train on raw
    unit vectors (flat PQ) or on coarse residuals (IVFPQ). Returns an
    array of shape (m, n_centroids, dim//m)."""
    import numpy as np

    n, dim = mat.shape
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        k_eff, cent = _lloyd_np(sub, n_centroids, rng, iters)
        if k_eff < n_centroids:  # tiny corpora: pad by repeating
            cent = np.vstack([cent, cent[: n_centroids - k_eff]])
        books.append(cent)
    return np.stack(books)  # (m, n_centroids, dsub)


def _pq_train_codebooks(sample, m: int, n_centroids: int, seed: int, iters: int = 12):
    """Per-subspace k-means codebooks over a bounded, already-collected
    training sample (numpy Lloyd, deterministic seed). Returns an array
    of shape (m, n_centroids, dim//m)."""
    import numpy as np

    mat = np.asarray(sample, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return _train_codebooks_mat(mat, m, n_centroids, seed, iters)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_centroids: int = 256,
    seed: int = 42,
    dim: int | None = None,
    train_rows: int = 8192,
    refine: int = 4,
) -> DataFrame:
    """Product-quantization ANN: the memory-compressed scale path.

    At 100 TB the raw float corpus (dim × 4 bytes/vector) doesn't fit
    executor memory for in-partition scoring; PQ (Jégou et al., TPAMI
    2011) stores each vector as ``m`` uint8 codes (64 dims × 4 B =
    256 B → 8 B at m=8: 32× compression) and scores queries against the
    codes with per-subspace lookup tables (ADC — asymmetric distance
    computation).

    Spark realization:
    - TRAIN driver-side on a bounded deterministic sample
      (``train_rows`` rows, one job — the same bounded-training policy
      as ivf_topk's KMeans; quantizer quality needs thousands of
      points, never the corpus). Codebooks become plan literals.
    - ENCODE the corpus via one Arrow-batched mapInPandas pass
      (vectorized nearest-centroid per subspace). At scale this is the
      materialized index you'd write back to the lake.
    - SCORE with a JVM-side higher-order expression — the hot path is
      ``aggregate(sequence, ...)`` over ``luts[j][codes[j]]``: no
      Python, no shuffle of the codes beyond the final top-K window.
      Each query's LUT (m × n_centroids subvector dot products) is a
      small Spark-computed frame, cross-joined broadcast.
    - REFINE: ADC top ``k*refine`` candidates per query re-scored
      exactly against the true vectors (broadcast candidate set),
      final exact top-k — the standard PQ rerank that recovers most
      quantization loss.

    Deterministic via ``seed`` (sampling sorted by id; fixed-iteration
    Lloyd). Approximate by design → recall-contract checks, same as
    LSH/IVF.
    """
    import numpy as np

    _require_dim(dim, "pq_topk")
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m

    # --- train (bounded sample; ORDER BY id makes the sample stable) ---
    sample = [
        r[0]
        for r in embeddings.select(vec_col)
        .orderBy(id_col)
        .limit(train_rows)
        .collect()
    ]
    books = _pq_train_codebooks(sample, m, n_centroids, seed)  # (m, K, dsub)

    # --- encode corpus (vectorized mapInPandas; codes are the index) ---
    import pandas as pd

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(ids), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                cent = books[j]
                d2 = (
                    (sub * sub).sum(1, keepdims=True)
                    - 2.0 * sub @ cent.T
                    + (cent * cent).sum(1)
                )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({"neighbor_id": ids, "codes": list(codes)})

    coded = embeddings.select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, codes array<int>"
    )

    # --- per-query LUTs (m x K dot products; tiny, Spark-computed) ---
    def build_luts(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            luts = [
                [
                    (books[j] @ mat[i, j * dsub : (j + 1) * dsub]).tolist()
                    for j in range(m)
                ]
                for i in range(len(ids))
            ]
            yield pd.DataFrame({"query_id": ids, "luts": luts})

    luts = queries.select(id_col, vec_col).mapInPandas(
        build_luts, schema="query_id long, luts array<array<double>>"
    )

    # --- ADC scoring: pure JVM higher-order fold, no Python ---
    adc = (
        coded.crossJoin(F.broadcast(luts))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE),"
                " (acc, j) -> acc + luts[j][codes[j]])"
            ).alias("score_adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_adc"), F.asc("neighbor_id")
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k * refine)
        .select("query_id", "neighbor_id")
    )

    return _exact_rerank(
        embeddings, queries, cand, id_col=id_col, vec_col=vec_col, k=k
    )


def _exact_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact-cosine rerank of a small (query_id, neighbor_id) candidate
    set — the standard ANN refine step shared by PQ and IVFPQ. The
    candidate frame broadcasts (it is per-query bounded); true vectors
    are fetched by equi-join, scored with the fixed-fold double
    expression, and the per-query top-k kept."""
    v = F.col(vec_col).cast("array<double>")
    nbr = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("nv"),
        _norm(v).alias("nn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("qv"),
        _norm(v).alias("qn"),
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    scored = (
        F.broadcast(cand)
        .join(nbr, on="neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 256,
    seed: int = 42,
    dim: int | None = None,
    train_rows: int = 8192,
    refine: int = 4,
) -> DataFrame:
    """IVF+PQ composed ANN (the FAISS IVFPQ shape, Jégou et al. TPAMI
    2011 §IV): coarse quantizer partitions the corpus into inverted
    lists, product quantization encodes each vector's RESIDUAL against
    its coarse centroid, and a query scans only its n_probe nearest
    lists' codes. This is the actual 100 TB ANN posture: flat PQ still
    ADC-scans every code (compute-bound at corpus scale) and IVF with
    raw floats keeps the full float corpus alive (memory-bound); IVFPQ
    touches n_probe/n_lists of the data AND stores 8 bytes/vector.

    Spark realization:
    - TRAIN driver-side on one bounded deterministic sample
      (``train_rows`` rows, one job — the bounded-training policy of
      ivf_topk/pq_topk): numpy Lloyd coarse centroids (seed), then
      per-subspace codebooks on the sample's coarse RESIDUALS (seed+1).
      Both become plan literals / Arrow-closure constants.
    - ENCODE the corpus in one Arrow-batched mapInPandas pass:
      normalize, assign nearest coarse list, PQ-encode the residual →
      (neighbor_id, list_id, codes). At scale this is the lake-resident
      index, naturally partitionable BY list_id — a query's probe join
      prunes to n_probe partitions.
    - SEARCH: each query emits n_probe rows (list_id, q·c_list, LUT of
      m×n_centroids residual-codebook dot products); candidates join
      the coded corpus on list_id — a bucket-keyed EQUI-join, not
      pq_topk's full crossJoin. ADC score = q·c_list +
      Σ_j lut[j][codes[j]], a pure JVM higher-order fold (score(q,x) =
      q·(c+r̂) decomposes exactly because the codebooks quantize
      residuals).
    - REFINE: exact rerank of the per-query ADC top ``k*refine``.

    Deterministic via ``seed`` (id-sorted sample, fixed-iteration
    Lloyd). Approximate by design → recall-contract checks, same as
    LSH/IVF/PQ.
    """
    import numpy as np
    import pandas as pd

    _require_dim(dim, "ivfpq_topk")
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m

    # --- train (bounded sample; ORDER BY id makes the sample stable) ---
    sample = [
        r[0]
        for r in embeddings.select(vec_col)
        .orderBy(id_col)
        .limit(train_rows)
        .collect()
    ]
    mat = np.asarray(sample, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    n_lists_eff, coarse = _lloyd_np(mat, n_lists, rng)  # (n_lists_eff, dim)
    d2 = (
        (mat * mat).sum(1, keepdims=True)
        - 2.0 * mat @ coarse.T
        + (coarse * coarse).sum(1)
    )
    resid = mat - coarse[d2.argmin(1)]
    books = _train_codebooks_mat(resid, m, n_centroids, seed + 1)  # (m, K, dsub)

    # --- encode corpus: list assignment + residual PQ codes ---
    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vecs = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            dd = (
                (vecs * vecs).sum(1, keepdims=True)
                - 2.0 * vecs @ coarse.T
                + (coarse * coarse).sum(1)
            )
            lists = dd.argmin(1)
            res = vecs - coarse[lists]
            codes = np.empty((len(ids), m), dtype=np.int32)
            for j in range(m):
                sub = res[:, j * dsub : (j + 1) * dsub]
                cent = books[j]
                dj = (
                    (sub * sub).sum(1, keepdims=True)
                    - 2.0 * sub @ cent.T
                    + (cent * cent).sum(1)
                )
                codes[:, j] = dj.argmin(1)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "list_id": lists.astype(np.int32),
                    "codes": list(codes),
                }
            )

    coded = embeddings.select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, list_id int, codes array<int>"
    )

    # --- per-query probes: n_probe (list_id, q·c, residual LUT) rows ---
    n_probe_eff = min(n_probe, n_lists_eff)

    def build_probes(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            qs = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            qs /= np.maximum(np.linalg.norm(qs, axis=1, keepdims=True), 1e-12)
            qdotc = qs @ coarse.T  # (nq, n_lists_eff)
            out_q, out_l, out_d, out_luts = [], [], [], []
            for i in range(len(ids)):
                # one LUT per query — the residual codebooks are global,
                # so only the q·c term varies across probed lists
                lut = [
                    (books[j] @ qs[i, j * dsub : (j + 1) * dsub]).tolist()
                    for j in range(m)
                ]
                order = np.argsort(-qdotc[i], kind="stable")[:n_probe_eff]
                for l in order:
                    out_q.append(ids[i])
                    out_l.append(int(l))
                    out_d.append(float(qdotc[i, l]))
                    out_luts.append(lut)
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "list_id": out_l,
                    "qdotc": out_d,
                    "luts": out_luts,
                }
            )

    probes = queries.select(id_col, vec_col).mapInPandas(
        build_probes,
        schema="query_id long, list_id int, qdotc double, luts array<array<double>>",
    )

    # --- ADC over probed lists only: bucket-keyed equi-join + JVM fold ---
    adc = (
        coded.join(F.broadcast(probes), on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("qdotc")
                + F.expr(
                    f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE),"
                    " (acc, j) -> acc + luts[j][codes[j]])"
                )
            ).alias("score_adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_adc"), F.asc("neighbor_id")
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(
        embeddings, queries, cand, id_col=id_col, vec_col=vec_col, k=k
    )


def cosine_topk_blas(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via per-partition BLAS Gram products — the
    fast exact twin for recall contracts.

    ``cosine_topk`` (the oracle-checked baseline) folds dot products in
    a fixed order so DuckDB reproduces it bit-for-bit; that fold is
    ~10× slower than a matrix product. Recall contracts only need the
    exact NEIGHBOR SET, not bit-reproducible scores, so they can use
    this instead: each Arrow batch of the corpus scores all queries as
    one float64 matmul and emits only its local top-k per query; the
    global window keeps the true top-k (the global top-k is a subset
    of the union of per-batch top-ks). Same output schema/rounding as
    cosine_topk; ±1-ulp BLAS-vs-fold differences can reorder exact
    ties only.
    """
    import numpy as np
    import pandas as pd

    q_rows = [
        (int(r[0]), np.asarray(r[1], dtype=np.float64))
        for r in queries.select(id_col, vec_col).collect()
    ]
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    q_ids = np.array([i for i, _ in q_rows], dtype=np.int64)
    q_mat = np.stack([v for _, v in q_rows])
    q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = q_mat @ mat.T  # (|Q|, batch)
            for qi in range(len(q_ids)):
                row = sims[qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                top = cand_idx[np.argsort(-row[cand_idx], kind="stable")[: k + 1]]
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        "neighbor_id": ids[top],
                        "cosine": np.round(row[top], 6),
                    }
                )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _assigned_pairs(
    embeddings: DataFrame,
    *,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest-of-k-fixed-centroids assignment, shared by the K-means
    step queries. Centroids are the k lowest-id vectors — selected via
    ORDER BY id LIMIT k (TakeOrdered over a tiny frame), which is
    correct for ANY id distribution; the previous ``id < k`` filter
    silently yielded fewer than k seeds on 1-based or sparse ids.
    Deterministic, derived in-plan — no driver action, no RNG. Squared
    distance uses
    the dot-product identity |x|²−2x·c+|c|², with both self-dots
    projected ONCE per row before the broadcast cross join (the naive
    form refolds them inside every pair). The argmin is a
    groupBy-min(struct(d2, cluster_id, ...)) — a partial-aggregable
    struct min with map-side combine, NOT a per-vector row_number
    window, so no (|corpus|·k)-row sort shuffle.

    Output: (vec_id, cluster_id, d2, xv).
    """
    c = (
        embeddings.select(
            F.col(id_col).alias("cluster_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("cluster_id")
        .limit(k)
    )
    c = c.withColumn("cc", _dot(F.col("cv"), F.col("cv")))
    x = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("xv"),
    ).withColumn("xx", _dot(F.col("xv"), F.col("xv")))
    d2 = F.col("xx") - F.lit(2.0) * _dot(F.col("xv"), F.col("cv")) + F.col("cc")
    scored = x.crossJoin(F.broadcast(c)).select(
        "vec_id", "xv", F.col("cluster_id"), d2.alias("d2")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cluster_id", "xv")).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.cluster_id").alias("cluster_id"),
        F.col("b.d2").alias("d2"),
        F.col("b.xv").alias("xv"),
    )


def kmeans_assign_fixed(
    embeddings: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned_df: DataFrame | None = None,
) -> DataFrame:
    """K-means ASSIGNMENT step against a deterministic centroid set:
    per-cluster member count and exact integer-micro inertia
    (sum of floor(d2·10⁶) — per-row doubles are bit-mirrored by the
    oracle, the sum is an exact integer fold, so the result is
    independent of aggregation order).

    Output: (cluster_id, n_members, inertia_micros).
    """
    assigned = (
        _assigned_pairs(embeddings, k=k, id_col=id_col, vec_col=vec_col)
        if assigned_df is None
        else assigned_df
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.floor(F.col("d2") * F.lit(1000000.0)).cast("long")).alias(
                "inertia_micros"
            ),
        )
    )


def kmeans_lloyd_update(
    embeddings: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned_df: DataFrame | None = None,
) -> DataFrame:
    """One full Lloyd UPDATE step: recompute each cluster's centroid as
    the member mean, per dimension — the iterative-ML building block,
    expressed as explode + hash aggregate (no window, no driver-side
    math; an iteration loop would re-apply this plan with the returned
    centroids).

    Means are exact: elements quantize to integer micros
    (floor(x·10⁶), bit-mirrored per row), sum exactly as longs, and
    divide once at the end — so the result is independent of Spark's
    aggregation order AND engine-comparable, unlike a naive
    avg(double). The mean stays in integer micros (floor of one double
    division) rather than a rounded double: ROUND tie rules differ
    across engines (HALF_UP vs HALF_EVEN) and the micro grid makes
    exact .5 boundaries common enough to bite.

    Output: (cluster_id, dim_idx, n_members, centroid_micros) — k·dim
    rows.
    """
    assigned = (
        _assigned_pairs(embeddings, k=k, id_col=id_col, vec_col=vec_col)
        if assigned_df is None
        else assigned_df
    )
    exploded = assigned.select(
        "cluster_id", F.posexplode("xv").alias("pos", "val")
    ).select(
        "cluster_id",
        (F.col("pos") + 1).cast("long").alias("dim_idx"),
        F.floor(F.col("val") * F.lit(1000000.0)).cast("long").alias("vm"),
    )
    return exploded.groupBy("cluster_id", "dim_idx").agg(
        F.count("*").alias("n_members"),
        F.floor(F.sum("vm") / F.count("*")).alias("centroid_micros"),
    )


def kmeans_fit_trace(
    embeddings: DataFrame,
    *,
    k: int = 8,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FULL iterative K-means (Lloyd) fit with a per-round convergence
    trace — the distributed iterative-ML loop, built so every round is
    bit-exactly replayable by the SQL oracle:

    - centroids quantize to the integer-micro grid after every update
      (floor(mean·10⁶)/10⁶ — exactly representable doubles), so
      cross-engine float drift cannot accumulate across rounds;
    - each round = one broadcast-centroid assignment (map-side
      combinable struct-min argmin, same kernel as
      kmeans_assign_fixed) + one explode/hash-agg mean update;
    - each round's ASSIGNED frame is eagerly localCheckpointed — it
      feeds both the inertia trace row and the mean update, so the
      checkpoint makes the round's cross-join assignment run exactly
      once (and truncates lineage, the round-over-round rule shared
      with pagerank/kcore);
    - clusters that lose all members drop out (standard Lloyd on
      fixed data), so the trace also reports surviving cluster count.

    Output: (round, n_clusters, inertia_micros), rounds 1..n_rounds —
    inertia_micros is the exact integer sum of floor(d2·10⁶) under
    the round's INCOMING centroids (round 1 = the k lowest-id seeds),
    monotonically non-increasing by Lloyd's theorem (unit-tested; the
    oracle checks every value).
    """
    x = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("xv"),
    ).withColumn("xx", _dot(F.col("xv"), F.col("xv")))
    centroids = (
        embeddings.select(
            F.col(id_col).alias("cluster_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("cluster_id")
        .limit(k)
    )
    traces = []
    for rnd in range(1, n_rounds + 1):
        c = centroids.withColumn("cc", _dot(F.col("cv"), F.col("cv")))
        d2 = F.col("xx") - F.lit(2.0) * _dot(F.col("xv"), F.col("cv")) + F.col("cc")
        scored = x.crossJoin(F.broadcast(c)).select(
            "vec_id", "xv", "cluster_id", d2.alias("d2")
        )
        assigned = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cluster_id", "xv")).alias("b"))
            .select(
                F.col("b.cluster_id").alias("cluster_id"),
                F.col("b.d2").alias("d2"),
                F.col("b.xv").alias("xv"),
            )
            # One assignment per round, computed ONCE: the frame feeds
            # both the inertia trace row and the mean update, and the
            # trace rows are re-evaluated at the final union — without
            # this checkpoint every round's broadcast cross-join ran
            # twice (round-4 advisor). Also truncates lineage, so the
            # downstream centroid frame needs no checkpoint of its own.
            # eager=True stays (round-11 measurement): unlike the
            # graph fixpoints (pagerank/label-prop/kcore, which went
            # eager=False), each round here feeds a BROADCAST of the
            # next centroid set — lazy checkpointing was measured
            # ~0.4 s SLOWER at sf0.1 (broadcast builds then trigger
            # the parent materialization inside the final action).
            .localCheckpoint(eager=True)
        )
        traces.append(
            assigned.agg(
                F.lit(rnd).alias("round"),
                F.countDistinct("cluster_id").alias("n_clusters"),
                F.sum(F.floor(F.col("d2") * F.lit(1000000.0)).cast("long")).alias(
                    "inertia_micros"
                ),
            )
        )
        if rnd == n_rounds:
            break
        means = (
            assigned.select("cluster_id", F.posexplode("xv").alias("pos", "val"))
            .select(
                "cluster_id",
                F.col("pos").alias("dim_idx"),
                F.floor(F.col("val") * F.lit(1000000.0)).cast("long").alias("vm"),
            )
            .groupBy("cluster_id", "dim_idx")
            .agg(
                (
                    F.floor(F.sum("vm") / F.count("*")) / F.lit(1000000.0)
                ).alias("cval")
            )
        )
        centroids = means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim_idx", "cval"))),
                lambda s: s["cval"],
            ).alias("cv")
        )
    out = traces[0]
    for t in traces[1:]:
        out = out.unionAll(t)
    return out


def semantic_dedup(
    embeddings: DataFrame,
    *,
    k: int = 8,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_rows: int | None = None,
    method: str = "ivf",
    assigned_df: DataFrame | None = None,
    pairs_df: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embedding space, find semantic
    duplicates (cosine ≥ threshold) WITHIN each cluster, and keep one
    representative per duplicate group: the member with the LOWEST
    COSINE to its cluster centroid (the paper's rule, §2: "keep the
    point with the lowest cosine similarity to the cluster centroid"),
    ties to the lowest id. This holds for ANY embedding normalization
    (round-9 advisor / round-10 verdict #5: the previous furthest-L2
    form coincides with the paper only on unit-norm vectors; round 10
    patched the docs, this round the rule). The cosine is recomputed
    against the assigned centroid with the same sequential-fold dot as
    the pair test and floored to integer micros, so the keep decision
    stays bit-mirrored by the SQL twin.

    Determinism/oracle surface: centroids are the k lowest-id vectors
    (the fixed-centroid kmeans convention, `_assigned_pairs`), pair
    membership uses the exact sequential-fold cosine rounded to 6 dp,
    groups are connected components, and the keep key is the
    centroid-cosine floored to integer micros (zero-norm vectors score
    cosine 0 by convention on both engines). With method='block' (exact candidates, guarded
    quadratic) every step is SQL-mirrored UNCONDITIONALLY — the full
    keep/drop decision is value-level checkable at any input. With
    method='ivf' the candidate set is approximate by design, so the
    output equals the exact one only when the IVF join's measured
    pair recall is 1.0 (true at the shipped SFs; 0.99/0.92 at the
    10x/100x probe decades — and one missed pair can split a
    connected component, changing group_id/keep for its whole group):
    hold the ivf path to the RECALL ledger contract, not to exact
    value parity (round-9 advisor).

    Scale shape: the paper clusters so that duplicate search is
    cluster-local; here the candidate generation is the IVF similarity
    join (linear, `_near_dup_candidates_ivf`) with the cluster id
    PUSHED INTO the candidate key — lists are bucketed by
    (cluster, ivf_list), so cross-cluster candidates are never
    Gram-scored (round-9 verdict #4: the filter-after-join shape paid
    occ²·m² flops on pairs it then discarded; with k roughly-even
    clusters the pushdown cuts per-list Gram work ~k×, and
    output-identical — a same-cluster pair that shares an IVF list
    also shares the (cluster, list) key). Candidate volume still
    never depends on k, so a small interpretable k (the oracle's k=8)
    does not force occ² work on corpus/k-sized clusters. Assignment
    is a broadcast cross join of k centroids (one partial-aggregable
    struct-min, no window); the keep rule is a per-group struct-max;
    components are the O(log n) large/small-star rounds. No step is
    quadratic in the corpus.

    Output: (vec_id, cluster_id, group_id, d2_micros, cos_micros, keep)
    — one row per vector; keep=1 marks the retained representative
    (singletons keep themselves).
    """
    from streaming_ecom_analytics_spark.caching import persist_tracked
    from streaming_ecom_analytics_spark.functions import dedup

    if pairs_df is not None and method == "ivf":
        raise ValueError(
            "semantic_dedup: pairs_df injection is only valid for exact "
            "candidate methods — the ivf path generates candidates "
            "cluster-locally ((cluster, list) keys)"
        )
    assigned = (
        _assigned_pairs(embeddings, k=k, id_col=id_col, vec_col=vec_col)
        if assigned_df is None
        else assigned_df
    )
    # centroid-cosine for the keep rule: rejoin the winning centroid's
    # vector (k rows, broadcast) and fold the same dot the oracle uses
    cents = (
        embeddings.select(
            F.col(id_col).alias("cluster_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("cluster_id")
        .limit(k)
    )
    denom = _norm(F.col("xv")) * _norm(F.col("cv"))
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        _dot(F.col("xv"), F.col("cv")) / denom
    )
    asg = persist_tracked(
        assigned.join(F.broadcast(cents), on="cluster_id").select(
            "vec_id",
            "cluster_id",
            F.floor(F.col("d2") * F.lit(1000000.0)).cast("long").alias(
                "d2_micros"
            ),
            F.floor(cos * F.lit(1000000.0)).cast("long").alias("cos_micros"),
        )
    )  # feeds the pair generation, the component join, and the keep rule
    if method == "ivf":
        # cluster-locality pushed into candidate generation: the IVF
        # join sees (embedding ⋈ cluster_id) and buckets lists by
        # (cluster, list), so cross-cluster pairs are never scored
        with_cluster = embeddings.join(
            asg.select(
                F.col("vec_id").alias(id_col),
                F.col("cluster_id").alias("__sem_cluster"),
            ),
            on=id_col,
        )
        same_cluster = embedding_near_dup_pairs(
            with_cluster,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            n_rows=n_rows,
            method="ivf",
            partition_col="__sem_cluster",
            # train on the unjoined corpus frame: the built-in
            # assignment is total and 1:1, so the cluster join leaves
            # (id, vec) identical and the id-sorted sample is the same
            # — the per-pass training memo then hits the entry the
            # plain IVF-join consumers built (round 11). A CALLER
            #-injected assigned_df may be partial (round-11 advisor),
            # shrinking the joined corpus — then the shortcut would
            # train on vectors outside the candidate set, so it is
            # skipped and training samples the joined frame itself.
            ivf_train_df=embeddings if assigned_df is None else None,
        ).select("id_a", "id_b")
    else:
        # exact candidate paths emit the full pair set — apply the
        # cluster constraint as a filter on the verified pairs.
        # ``pairs_df`` injects a precomputed frame of the SAME exact
        # pair set (e.g. the family-shared block-Gram subtree); it is
        # rejected for method='ivf' because that path's pair set is
        # generated cluster-locally (the (cluster, list) bucket key),
        # which a plain full-corpus pair frame does not reproduce.
        pairs = (
            embedding_near_dup_pairs(
                embeddings,
                threshold=threshold,
                id_col=id_col,
                vec_col=vec_col,
                dim=dim,
                n_rows=n_rows,
                method=method,
            )
            if pairs_df is None
            else pairs_df
        ).select("id_a", "id_b")
        ca = asg.select(
            F.col("vec_id").alias("id_a"), F.col("cluster_id").alias("__ca")
        )
        cb = asg.select(
            F.col("vec_id").alias("id_b"), F.col("cluster_id").alias("__cb")
        )
        same_cluster = (
            pairs.join(ca, on="id_a")
            .join(cb, on="id_b")
            .filter(F.col("__ca") == F.col("__cb"))
            .select("id_a", "id_b")
        )
    comp = dedup.dup_clusters(
        asg.select("vec_id"), same_cluster, id_col="vec_id", src="id_a", dst="id_b"
    ).select("vec_id", F.col("cluster_id").alias("group_id"))
    j = comp.join(asg, on="vec_id")
    keepers = (
        j.groupBy("group_id")
        .agg(
            F.min(
                F.struct(F.col("cos_micros"), F.col("vec_id"))
            ).alias("b")  # paper rule: lowest centroid-cosine, ties low id
        )
        .select("group_id", F.col("b.vec_id").alias("__keeper_id"))
    )
    return j.join(keepers, on="group_id").select(
        "vec_id",
        "cluster_id",
        "group_id",
        "d2_micros",
        "cos_micros",
        (F.col("vec_id") == F.col("__keeper_id")).cast("long").alias("keep"),
    )


def embedding_int8_quant_report(
    embeddings: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension scalar int8 quantization report — the artifact a
    pipeline shipping quantized embeddings (4× smaller ANN indexes /
    training shards) needs before flipping the switch: for each
    dimension, the corpus min/max that define the affine scale
    s = (max−min)/255, the total and worst absolute reconstruction
    error after round-trip x → code = floor((x−min)/s + 0.5) ∈ [0,255]
    → x̂ = min + code·s, and the hard bound check |x−x̂| ≤ s/2 (floor of
    u+0.5 never misses by more than half a step; a violation means the
    clamp or the scale is wrong).

    Everything is closed-form deterministic double arithmetic (one
    division defines s; no round(), whose half-way rule differs across
    engines) and error totals are order-independent integer-micro
    sums — bit-mirrored by the SQL twin. Plan shape (round-10 rewrite):
    posexplode to (pos, val) rows and hash-aggregate keyed by the
    64-value ``pos`` — two map-side-combining passes (min/max, then
    errors vs the dim-row broadcast stats). The previous shape kept the
    vectors un-exploded and compiled 2·dim aggregate expressions per
    pass plus a dim-wide struct projection: semantically identical,
    but the 2·64-agg + 384-expression codegen cost a fixed ~10 s at
    ANY scale (round-9 driver bench: the most expensive query in the
    suite, 11x the mean, exp 0.21 — pure compile overhead). The
    exploded form streams n·dim narrow rows through a 64-key partial
    aggregate instead: identical output values (same floor/least/
    greatest arithmetic per element), ~100x less generated code. No
    UDF; vectors never shuffle (the partial aggregate reduces each
    partition to ≤64 rows map-side). Constant dimensions (max = min)
    quantize to code 0 with zero error. Empty corpus => 0 rows (the
    SQL twin's UNNEST pipeline agrees; the previous shape emitted
    dim all-null rows from Spark's global-agg-on-empty row —
    round-9 advisor).

    Output: (dim_idx 1-based, vmin_micros, vmax_micros,
    sum_abs_err_micros, max_abs_err_micros, bound_ok) — dim rows.
    """
    x = embeddings.select(F.col(vec_col).cast("array<double>").alias("v"))
    ex = x.select(F.posexplode("v").alias("pos", "val"))
    # the dim-row stats frame feeds the error pass's broadcast join —
    # persist it so its corpus scan runs once
    stats = _int8_stats_rows(ex)
    mn, mx, val = F.col("mn"), F.col("mx"), F.col("val")
    sc = (mx - mn) / F.lit(255.0)
    code = F.least(
        F.lit(255.0),
        F.greatest(
            F.lit(0.0), F.floor((val - mn) / sc + F.lit(0.5)).cast("double")
        ),
    )
    err = F.when(mx == mn, F.lit(0.0)).otherwise(F.abs(val - (mn + code * sc)))
    em = F.floor(err * F.lit(1000000.0)).cast("long")
    return (
        ex.join(F.broadcast(stats), on="pos")
        .select("pos", "mn", "mx", em.alias("em"))
        .groupBy("pos", "mn", "mx")
        .agg(
            F.sum("em").alias("sum_abs_err_micros"),
            F.max("em").alias("max_abs_err_micros"),
        )
        .select(
            (F.col("pos") + 1).cast("long").alias("dim_idx"),
            F.floor(mn * F.lit(1000000.0)).cast("long").alias("vmin_micros"),
            F.floor(mx * F.lit(1000000.0)).cast("long").alias("vmax_micros"),
            "sum_abs_err_micros",
            "max_abs_err_micros",
            (
                F.col("max_abs_err_micros")
                <= F.floor((mx - mn) / F.lit(255.0) * F.lit(500000.0))
            ).alias("bound_ok"),
        )
    )


def kmeans_coreset_sample(
    embeddings: DataFrame,
    *,
    k: int = 8,
    m: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = ":cs7",
) -> DataFrame:
    """Sensitivity-sampled k-means CORESET (Feldman & Langberg 2011 /
    Bachem, Lucic & Krause 2018 survey form): keep each point with
    probability p_i = min(1, m·s_i), where the sensitivity upper bound
    s_i = ½·d²_i/Σd² + ½/n mixes the point's share of the clustering
    cost (far points are irreplaceable) with a uniform floor (dense
    regions still represented), and weight kept points by 1/p_i so
    weighted cost estimates stay unbiased — the standard data-pruning
    primitive for training-set reduction.

    Determinism/oracle surface: centroids are the k lowest-id vectors
    (`_assigned_pairs`), per-row cost is floored to integer micros
    BEFORE the global sum (order-independent exact long), and the coin
    is the seeded md5 uniform u_i = (hex32(md5(id||salt)) + ½)/2³² —
    every arithmetic step bit-mirrored in SQL, so the exact sampled
    set and weights are value-level checkable.

    Scale shape: one broadcast-k assignment pass, one scalar aggregate
    (n, Σd²) broadcast back, per-row coin math — no shuffle beyond the
    struct-min assignment's partial aggregation; the output is ~m rows
    regardless of corpus size.

    Output: (vec_id, cluster_id, d2_micros, p_micros, weight_micros)
    for kept rows only.
    """
    from streaming_ecom_analytics_spark.caching import persist_tracked

    assigned = _assigned_pairs(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    # the narrow (id, cluster, cost) grain frame feeds BOTH the scalar
    # totals and the coin pass — persist it once (the cuped/cusum
    # grain-frame convention) so the broadcast-k assignment runs once
    asg = persist_tracked(
        assigned.select(
            "vec_id",
            "cluster_id",
            F.floor(F.col("d2") * F.lit(1000000.0)).cast("long").alias(
                "d2_micros"
            ),
        )
    )
    totals = asg.agg(
        F.count("*").alias("n_rows"),
        F.sum("d2_micros").alias("total_micros"),
    )
    x = asg.crossJoin(F.broadcast(totals))
    # degenerate corpus (every point ON a centroid → Σd² = 0): the cost
    # share is 0/0 — fall back to pure uniform sensitivity instead of
    # letting NaN silently empty the sample
    sens = F.when(
        F.col("total_micros") == 0,
        F.lit(1.0) / F.col("n_rows").cast("double"),
    ).otherwise(
        F.lit(0.5) * F.col("d2_micros").cast("double")
        / F.col("total_micros").cast("double")
        + F.lit(0.5) / F.col("n_rows").cast("double")
    )
    p = F.least(F.lit(1.0), F.lit(float(m)) * sens)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return (
        x.withColumn("__p", p)
        .filter(u < F.col("__p"))
        .select(
            "vec_id",
            "cluster_id",
            "d2_micros",
            F.floor(F.col("__p") * F.lit(1000000.0)).cast("long").alias(
                "p_micros"
            ),
            F.floor(F.lit(1000000.0) / F.col("__p")).cast("long").alias(
                "weight_micros"
            ),
        )
    )


def _int8_stats_rows(ex: DataFrame) -> DataFrame:
    """Persisted per-dim min/max frame — (pos 0-based, mn, mx), one row
    per dimension — over a posexploded (pos, val) frame: the affine-
    scale definition shared by the int8 report and the dequantized
    retrieval view. A 64-key hash aggregate with map-side combine
    (each partition reduces to ≤dim rows before the exchange); the
    previous 1-row 2·dim-agg form compiled 128 aggregate expressions
    and dominated the suite's bench at ~10 s of fixed codegen."""
    from streaming_ecom_analytics_spark.caching import persist_tracked

    return persist_tracked(
        ex.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )


def embedding_int8_dequantized(
    embeddings: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The corpus as an int8-quantized index would score it: every
    vector round-tripped through the per-dim affine int8 codes
    (embedding_int8_quant_report's exact scheme — same stats frame,
    same floor(u+0.5) code rule). Feeding this view to the exact
    top-k scorer measures precisely the retrieval fidelity a
    4×-compressed index loses — nothing else changes. Constant
    dimensions dequantize to their constant. One broadcast stats row +
    a per-row JVM transform; vectors never shuffle.

    Output: (id_col, vec_col array<double>) — drop-in for the topk
    scorers.
    """
    x = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    stats = _int8_stats_rows(x.select(F.posexplode("v").alias("pos", "val")))
    # collapse the dim-row stats to pos-ordered arrays (one broadcast
    # row) — array_sort on struct(pos, ...) orders by pos first, so
    # F.get(__mn, i) below reads dimension i exactly
    arrs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("__mn"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        ((F.col("mx") - F.col("mn")) / F.lit(255.0)).alias("sc"),
                    )
                )
            ),
            lambda s: s["sc"],
        ).alias("__sc"),
    )
    j = x.crossJoin(F.broadcast(arrs))

    def _deq(xv, i):
        mn = F.get(F.col("__mn"), i)
        sc = F.get(F.col("__sc"), i)
        code = F.least(
            F.lit(255.0),
            F.greatest(F.lit(0.0), F.floor((xv - mn) / sc + F.lit(0.5)).cast("double")),
        )
        return F.when(sc == 0, mn).otherwise(mn + code * sc)

    return j.select(
        id_col, F.transform("v", _deq).alias(vec_col)
    )


def int_gram_micro(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact integer Gram matrix of the micro-quantized corpus:
    G[i][j] = SUM over rows of floor(v_i*1e6) * floor(v_j*1e6), as
    (i, j, g decimal(38,0)) — dim² rows.

    Replaces the posexplode self-join formulation (n·dim² intermediate
    rows through a corpus-keyed join+agg) with a per-partition Arrow
    partial Gram (guide §4.2 / §2.3): each task folds its batches into
    ONE dim×dim int64 accumulator with an integer matmul and emits
    dim² partial rows, so the shuffle carries dim² rows per partition
    instead of n·dim² join rows. The final SUM accumulates in
    decimal(38,0), same as the join formulation.

    Bit-exactness: floor(float32→float64 * 1e6) in numpy is the same
    IEEE-754 double multiply+floor Spark's ``F.floor(col * 1e6)``
    performs; products and per-partition partial sums stay in int64
    (|m| ≤ ~2²¹ for unit-normalized inputs ⇒ per-row product ≤ ~2⁴²;
    int64 overflows only beyond ~2²¹ rows per partition even at that
    extreme — raise the partition count before that, or the assert
    below fires), so the result is bit-identical to the exact SQL
    twin on both engines.

    ``dim`` is optional: the accumulator is sized from the data (each
    task reads the width off its first batch — free, unlike a
    plan-build-time probe job). Passing it turns on a per-batch width
    check that fails loudly on a corpus/caller mismatch.
    """
    import numpy as np
    import pandas as pd

    declared = None if dim is None else int(dim)

    def gram_batches(batches):
        acc = None
        n_rows = 0
        for pdf in batches:
            if not len(pdf):
                continue
            n_rows += len(pdf)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if declared is not None and mat.shape[1] != declared:
                raise ValueError(
                    f"int_gram_micro: declared dim={declared} but "
                    f"{vec_col} rows have width {mat.shape[1]}"
                )
            if acc is None:
                acc = np.zeros((mat.shape[1], mat.shape[1]), dtype=np.int64)
            m = np.floor(mat * 1000000.0).astype(np.int64)
            # overflow headroom: micro values of unit-normalized dims
            # are ≤ 2²¹ in magnitude; 2⁴²·n_rows must stay below 2⁶³
            assert n_rows < (1 << 21), (
                "int_gram_micro: partition too large for int64 partial "
                "sums — repartition the input"
            )
            acc += m.T @ m
        if acc is None:
            return
        d = acc.shape[0]
        i_idx, j_idx = np.indices((d, d))
        yield pd.DataFrame(
            {
                "i": i_idx.ravel().astype(np.int32),
                "j": j_idx.ravel().astype(np.int32),
                "g": acc.ravel(),
            }
        )

    partial = embeddings.select(vec_col).mapInPandas(
        gram_batches, schema="i int, j int, g long"
    )
    return partial.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g")
    )
