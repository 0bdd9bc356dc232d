"""Unit tests for similarity-search operators on crafted vectors."""

from __future__ import annotations

import math

import pytest

from streaming_ecom_analytics_spark.functions import similarity


@pytest.fixture(scope="module")
def vectors(spark):
    inv2 = 1 / math.sqrt(2)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal to 0
        (3, [inv2, inv2, 0.0]),    # 45° from 0
        (4, [-1.0, 0.0, 0.0]),     # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(vectors):
    q = vectors.filter("vec_id = 0")
    out = similarity.cosine_topk(vectors, q, k=4).collect()
    order = [r.neighbor_id for r in out]
    assert order == [1, 3, 2, 4]
    cosines = [r.cosine for r in out]
    assert cosines == sorted(cosines, reverse=True)
    assert cosines[0] > 0.999 and abs(cosines[1] - 1 / math.sqrt(2)) < 1e-6


def test_embedding_near_dup_pairs(vectors):
    pairs = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(vectors, threshold=0.99, dim=3).collect()}
    assert pairs == {(0, 1)}


def test_embedding_near_dup_methods_agree(spark):
    """The banded-LSH and block-Gram candidate paths must produce the
    same verified pairs on planted near-dups — and neither plan may
    collect the corpus to the driver (no toPandas/collect in either)."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((5, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(32) * 1e-3]))
    rows += [(100 + i, [float(x) for x in rng.standard_normal(32)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    expected = {(2 * i, 2 * i + 1) for i in range(5)}
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.99, method="lsh", dim=32
        ).collect()
    }
    block = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.99, method="block", n_blocks=4
        ).collect()
    }
    assert lsh == expected
    assert block == expected


def test_ivf_topk_recall(spark):
    """IVF with n_probe=4/16 lists must recover most of the brute-force
    top-5 on real embeddings (and always find a planted near-dup)."""
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 5")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, q, k=5, n_lists=8, n_probe=4).collect()
    }
    assert len(ivf & brute) / len(brute) >= 0.5  # recall at half the lists probed


def test_lsh_bucketed_topk_finds_near_dup(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    near = base + rng.standard_normal(16) * 0.01
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near])] + [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(2, 60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.lsh_bucketed_topk(
        df, df.filter("vec_id = 0"), k=3, n_planes=4, dim=16
    )
    neighbors = [r.neighbor_id for r in out.collect()]
    # the planted near-dup lands in the same bucket and ranks first
    assert neighbors and neighbors[0] == 1


def test_brute_force_guard_trips(spark):
    """cosine_topk must refuse a query set above max_rows (round-2
    verdict #6) — the brute-force baseline is quadratic and should not
    silently run on a big input."""
    from streaming_ecom_analytics_spark.functions.guards import BruteForceGuardError

    big_q = spark.range(20).selectExpr(
        "id AS vec_id", "array(cast(1.0 AS float), cast(0.0 AS float)) AS embedding"
    )
    with pytest.raises(BruteForceGuardError, match="lsh_bucketed_topk"):
        similarity.cosine_topk(big_q, big_q, k=2, max_rows=10)
    # explicit opt-out still works
    out = similarity.cosine_topk(big_q, big_q, k=2, max_rows=None)
    assert out.count() > 0


def test_jaccard_guard_trips(spark):
    from streaming_ecom_analytics_spark.functions.dedup import jaccard_pairs
    from streaming_ecom_analytics_spark.functions.guards import BruteForceGuardError

    docs = spark.range(20).selectExpr(
        "id AS doc_id", "concat('common shared text body ', id % 3) AS text"
    )
    with pytest.raises(BruteForceGuardError, match="minhash_lsh_pairs"):
        jaccard_pairs(docs, max_rows=10)


def test_lsh_compose_runs_no_job(spark, vectors):
    """Composing lsh_bucketed_topk with an explicit dim must not run a
    Spark job (round-2 verdict #4: no driver action at plan-build time)."""
    sc = spark.sparkContext
    status = sc.statusTracker()
    before = status.getJobIdsForGroup(None)
    df = similarity.lsh_bucketed_topk(
        vectors, vectors.filter("vec_id = 0"), k=3, n_planes=4, dim=3
    )
    after = status.getJobIdsForGroup(None)
    assert before == after, "plan composition triggered a Spark job"
    # and the plan still executes correctly
    assert {r.neighbor_id for r in df.collect()} >= {1}


def test_near_dup_lsh_compose_runs_no_job(spark, vectors):
    """embedding_near_dup_pairs(method='lsh') with an explicit dim must
    not run a Spark job at plan-build time either (round-3 verdict #2 —
    the same contract lsh_bucketed_topk already honors)."""
    sc = spark.sparkContext
    status = sc.statusTracker()
    before = status.getJobIdsForGroup(None)
    df = similarity.embedding_near_dup_pairs(
        vectors, threshold=0.99, method="lsh", dim=3
    )
    after = status.getJobIdsForGroup(None)
    assert before == after, "plan composition triggered a Spark job"
    assert {(r.id_a, r.id_b) for r in df.collect()} == {(0, 1)}


def test_pq_topk_recall_and_determinism(spark):
    """PQ ANN must recover most of the brute-force top-5 on the real
    embeddings table and be bit-stable across runs (seeded training,
    fixed-iteration Lloyd)."""
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 5")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    run1 = similarity.pq_topk(emb, q, k=5, dim=64).collect()
    run2 = similarity.pq_topk(emb, q, k=5, dim=64).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))
    pq = {(r.query_id, r.neighbor_id) for r in run1}
    assert len(pq & brute) / len(brute) >= 0.5


def test_recall_floors_fail_on_deliberate_regression(spark):
    """The registered ANN recall contracts must be FALSIFIABLE: a
    crippled configuration (IVF probing 1 of 16 lists; PQ with 2
    subspaces, 16 centroids, no rerank budget) must fail the floors
    the registry asserts (IVF 0.45, PQ 0.60). Measured at sf0.001:
    crippled IVF 0.28, crippled PQ 0.12, vs healthy 0.50 / 0.90 —
    the floors separate, so a real regression turns the oracle row
    red instead of staying silently green."""
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 10")
    exact = similarity.cosine_topk_blas(emb, q, k=5)
    bad_ivf = similarity.recall_vs_exact(
        similarity.ivf_topk(emb, q, k=5, n_probe=1),
        exact,
        min_mean_recall=0.45,
    ).collect()[0]
    assert bad_ivf.mean_recall_ok is False
    bad_pq = similarity.recall_vs_exact(
        similarity.pq_topk(emb, q, k=5, dim=64, m=2, n_centroids=16, refine=1),
        exact,
        min_mean_recall=0.60,
    ).collect()[0]
    assert bad_pq.mean_recall_ok is False


def test_pq_topk_rejects_indivisible_dim(spark, vectors):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_topk(vectors, vectors, dim=3, m=2)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.ivfpq_topk(vectors, vectors, dim=3, m=2)


def test_ivfpq_topk_recall_determinism_and_falsifiability(spark):
    """IVFPQ (coarse lists + residual codes): recall on the real
    embeddings table must clear the registered 0.40 floor, be
    bit-stable across runs (numpy Lloyd is fully deterministic given
    the id-sorted sample), and the floor must be FALSIFIABLE — a
    crippled configuration (1 of 16 lists probed, m=2/16-centroid
    residual codebooks, no rerank budget) must fail it. Measured at
    sf0.001: healthy 0.64, crippled 0.12."""
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 10")
    exact = similarity.cosine_topk_blas(emb, q, k=5)
    run1 = similarity.ivfpq_topk(emb, q, k=5, dim=64).collect()
    run2 = similarity.ivfpq_topk(emb, q, k=5, dim=64).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))
    ok = similarity.recall_vs_exact(
        similarity.ivfpq_topk(emb, q, k=5, dim=64), exact, min_mean_recall=0.40
    ).collect()[0]
    assert ok.mean_recall_ok is True
    bad = similarity.recall_vs_exact(
        similarity.ivfpq_topk(
            emb, q, k=5, dim=64, n_probe=1, m=2, n_centroids=16, refine=1
        ),
        exact,
        min_mean_recall=0.40,
    ).collect()[0]
    assert bad.mean_recall_ok is False


def test_ivfpq_prunes_to_probed_lists(spark):
    """The IVF composition must actually prune: every ADC candidate
    pair's list_id is one of the query's n_probe probed lists, so at
    most n_probe/n_lists of the coded corpus is ever scored for one
    query (the crossJoin-free property that distinguishes ivfpq_topk
    from pq_topk). Verified structurally: the scoring join is an
    equi-join on list_id — a crippled 1-probe run returns neighbors
    from exactly one coarse list per query."""
    import numpy as np

    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 3")
    out = similarity.ivfpq_topk(emb, q, k=50, dim=64, n_probe=1, refine=1)
    rows = out.collect()
    assert rows, "1-probe run must still return neighbors"
    # recompute each returned neighbor's coarse list with the same
    # deterministic training recipe; all neighbors of one query must
    # share a single list
    sample = [
        r[0]
        for r in emb.select("embedding").orderBy("vec_id").limit(8192).collect()
    ]
    mat = np.asarray(sample, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(42)
    _, coarse = similarity._lloyd_np(mat, 16, rng)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()
    }

    def list_of(vid):
        v = vecs[vid] / max(np.linalg.norm(vecs[vid]), 1e-12)
        return int(((v - coarse) ** 2).sum(1).argmin())

    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, set()).add(list_of(r.neighbor_id))
    assert all(len(lists) == 1 for lists in by_query.values()), by_query


def test_kmeans_seeds_are_k_lowest_ids_even_when_sparse(spark):
    """Seed selection is ORDER BY id LIMIT k, not ``id < k`` — with
    1-based or sparse ids the filter form silently yielded fewer than
    k seeds. Sparse ids {10,20,30,40,...}: k=3 must still produce 3
    distinct clusters seeded at ids 10, 20, 30."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (10 * (i + 1), [float(x) for x in rng.standard_normal(4)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_assign_fixed(df, k=3)
    clusters = {r.cluster_id for r in out.collect()}
    assert clusters <= {10, 20, 30} and len(clusters) >= 1
    # each seed is its own nearest centroid, so all 3 appear
    assert {10, 20, 30} <= clusters


def test_omitted_dim_raises_instead_of_probing(spark, vectors):
    """No code path in the package may run a Spark job during query
    construction (round-4 verdict #6). The old behavior silently ran a
    LIMIT-1 collect to infer the vector dimension when dim was
    omitted; now every plane/codebook-deriving entry point raises a
    pointed ValueError instead — and, belt-and-braces, raising must
    itself launch no job."""
    sc = spark.sparkContext
    status = sc.statusTracker()
    before = status.getJobIdsForGroup(None)
    with pytest.raises(ValueError, match="requires dim"):
        similarity.lsh_bucketed_topk(vectors, vectors.filter("vec_id = 0"), k=3)
    with pytest.raises(ValueError, match="requires dim"):
        similarity.pq_topk(vectors, vectors.filter("vec_id = 0"), k=3)
    with pytest.raises(ValueError, match="requires dim"):
        similarity.embedding_near_dup_pairs(vectors, threshold=0.99, method="lsh")
    after = status.getJobIdsForGroup(None)
    assert before == after, "dim validation triggered a Spark job"


def test_cosine_topk_blas_equals_fold(spark):
    """The BLAS exact twin must return the same neighbor sets (and the
    same cosines to 1e-9) as the fold-order oracle baseline."""
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 8")
    fold = {(r.query_id, r.neighbor_id): r.cosine for r in similarity.cosine_topk(emb, q, k=5).collect()}
    blas = {(r.query_id, r.neighbor_id): r.cosine for r in similarity.cosine_topk_blas(emb, q, k=5).collect()}
    assert set(fold) == set(blas)
    assert all(abs(fold[k] - blas[k]) < 1e-9 for k in fold)


# ---------------------------------------------------------------------------
# kmeans step operators
# ---------------------------------------------------------------------------


def _km_frame(spark):
    # Two tight groups around (0,0) and (10,10); ids 0/1 are the
    # fixed centroids (k=2) and sit one in each group.
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.5, 0.0]),
        (3, [0.0, 0.5]),
        (4, [10.0, 9.5]),
        (5, [9.5, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_assign_fixed_counts_and_inertia(spark):
    out = {
        r.cluster_id: r
        for r in similarity.kmeans_assign_fixed(_km_frame(spark), k=2).collect()
    }
    assert out[0].n_members == 3 and out[1].n_members == 3
    # inertia: centroid members at d2 = 0, 0.25, 0.25 each side
    assert out[0].inertia_micros == 500000
    assert out[1].inertia_micros == 500000


def test_kmeans_assign_tie_breaks_to_lowest_cluster(spark):
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]  # vec 2 equidistant
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.cluster_id: r.n_members
        for r in similarity.kmeans_assign_fixed(emb, k=2).collect()
    }
    assert got[0] == 2  # vec 2 joined cluster 0
    assert got[1] == 1


def test_kmeans_lloyd_update_exact_means(spark):
    out = {
        (r.cluster_id, r.dim_idx): r
        for r in similarity.kmeans_lloyd_update(_km_frame(spark), k=2).collect()
    }
    # cluster 0 dim 1: mean(0, 0.5, 0) = 1/6 -> floor(500000/3)
    assert out[(0, 1)].centroid_micros == 166666
    assert out[(0, 2)].centroid_micros == 166666
    # cluster 1 dim 1: mean(10, 10, 9.5) -> floor(29500000/3)
    assert out[(1, 1)].centroid_micros == 9833333
    assert out[(0, 1)].n_members == 3
    assert len(out) == 4  # k=2 clusters x dim=2


def test_kmeans_assign_no_plan_build_jobs(spark):
    # Plan construction must not launch jobs (centroids derive in-plan).
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    df = similarity.kmeans_assign_fixed(_km_frame(spark), k=2)
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before)
    assert df.count() == 2


def test_kmeans_fit_trace_monotone_and_converges(spark):
    # Two tight blobs; seeds (ids 0,1) start both inside blob A — the
    # update step must migrate one centroid toward blob B and inertia
    # must be non-increasing round over round (Lloyd's theorem).
    rows = (
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])]
        + [(i, [float(i % 3) * 0.1, 0.0]) for i in range(2, 12)]
        + [(i, [100.0 + float(i % 3) * 0.1, 50.0]) for i in range(12, 22)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tr = {r.round: r for r in similarity.kmeans_fit_trace(emb, k=2, n_rounds=4).collect()}
    inertias = [tr[i].inertia_micros for i in sorted(tr)]
    assert all(a >= b for a, b in zip(inertias, inertias[1:]))
    # after the first update the far blob is captured: inertia collapses
    assert inertias[-1] < inertias[0] / 100
    assert tr[max(tr)].n_clusters == 2


def test_kmeans_fit_trace_round1_matches_assign_fixed(spark):
    # Round 1 of the trace runs under the seed centroids — its inertia
    # must equal the standalone assignment step's total.
    rows = [(i, [float(i), float(i % 4)]) for i in range(16)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tr = {r.round: r for r in similarity.kmeans_fit_trace(emb, k=4, n_rounds=2).collect()}
    standalone = (
        similarity.kmeans_assign_fixed(emb, k=4)
        .agg({"inertia_micros": "sum"})
        .collect()[0][0]
    )
    assert tr[1].inertia_micros == standalone


def test_label_separation_on_separable_labels(spark):
    """Two well-separated label groups: intra inertia must be far
    below cross inertia for both labels (exercises the registered
    label_centroid_separation machinery on a crafted frame)."""
    from streaming_ecom_analytics_spark.plans import REGISTRY  # noqa: F401

    rows = [(i, 0, [0.0 + (i % 3) * 0.1, 0.0]) for i in range(6)] + [
        (10 + i, 1, [50.0 + (i % 3) * 0.1, 9.0]) for i in range(6)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    # reuse the query body via the module-level function on a temp view
    # is awkward; drive the same operator composition directly
    from pyspark.sql import functions as F

    from streaming_ecom_analytics_spark.functions.similarity import _dot

    x = emb.select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.col("embedding").cast("array<double>").alias("xv"),
    )
    cent = (
        x.select("label", F.posexplode("xv").alias("pos", "val"))
        .select("label", F.col("pos").alias("dim_idx"),
                F.floor(F.col("val") * F.lit(1e6)).cast("long").alias("vm"))
        .groupBy("label", "dim_idx")
        .agg((F.floor(F.sum("vm") / F.count("*")) / F.lit(1e6)).alias("cval"))
        .groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("dim_idx", "cval"))),
            lambda s: s["cval"]).alias("cv"))
    )
    d2 = (_dot(F.col("xv"), F.col("xv"))
          - F.lit(2.0) * _dot(F.col("xv"), F.col("cv"))
          + _dot(F.col("cv"), F.col("cv")))
    pairs = x.crossJoin(F.broadcast(
        cent.select(F.col("label").alias("clabel"), "cv"))
    ).select("label", "clabel",
             F.floor(d2 * F.lit(1e6)).cast("long").alias("dm"))
    agg = {r.label: r for r in pairs.groupBy("label").agg(
        F.sum(F.when(F.col("label") == F.col("clabel"), F.col("dm"))).alias("intra"),
        F.sum(F.when(F.col("label") != F.col("clabel"), F.col("dm"))).alias("cross"),
    ).collect()}
    for lbl in (0, 1):
        assert agg[lbl].intra * 100 < agg[lbl].cross


def test_top_eigenvector_finds_dominant_direction(spark):
    """Power iteration on a corpus with variance concentrated on one
    axis must converge to that axis: the renormalized eigenvector's
    max-magnitude entry (always ±10⁶ by construction) lands on the
    dominant dimension, and other dims stay small."""
    import numpy as np

    from streaming_ecom_analytics_spark.plans import REGISTRY

    rng = np.random.default_rng(3)
    rows = []
    for i in range(80):
        v = rng.standard_normal(8) * 0.05
        v[2] += rng.choice([-1.0, 1.0]) * 2.0  # dominant axis = dim 2
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # drive the same plan the registered query builds, on the crafted
    # frame: monkey-patch the catalog reader for this call
    from streaming_ecom_analytics_spark import catalog as cat

    orig = cat.embeddings
    try:
        cat.embeddings = lambda spark, sf_dir: df
        out = {
            r.dim_idx: r.eig_micros
            for r in REGISTRY["embedding_top_eigenvector"].fn(spark, "unused").collect()
        }
    finally:
        cat.embeddings = orig
    assert abs(out[2]) == 1000000  # dominant axis carries the unit entry
    assert all(abs(v) < 200000 for d, v in out.items() if d != 2)


def test_block_path_is_guarded(spark):
    """Round-7 3-decade probe finding: the exact block-Gram path is
    quadratic by design — it must refuse oversized inputs like the
    other brute-force baselines instead of silently running an
    all-pairs Gram at scale."""
    import pytest

    from streaming_ecom_analytics_spark.functions import similarity
    from streaming_ecom_analytics_spark.functions.guards import (
        BruteForceGuardError,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(BruteForceGuardError, match="ivf"):
        similarity.embedding_near_dup_pairs(
            emb, threshold=0.5, dim=4, method="block", block_max_rows=10
        ).collect()
    # an n_rows hint makes the guard a pure comparison (round-7 advisor:
    # no count job when the size is known) — and still fires
    with pytest.raises(BruteForceGuardError, match="ivf"):
        similarity.embedding_near_dup_pairs(
            emb, threshold=0.5, dim=4, method="block",
            block_max_rows=10, n_rows=20,
        )
    # explicit override still works
    out = similarity.embedding_near_dup_pairs(
        emb, threshold=0.99999, dim=4, method="block", block_max_rows=None
    )
    assert out.count() >= 0


def test_auto_mid_threshold_routes_to_scale_safe_ivf(spark):
    """Round-7 verdict #1: the engine had no scale-safe mid-threshold
    embedding similarity join — auto routed t<0.95 to the guarded
    quadratic block path. auto must now route mid thresholds to the
    IVF-join, which completes (no guard refusal) and, on this planted
    frame, returns exactly the qualifying pairs."""
    import numpy as np

    from streaming_ecom_analytics_spark.functions import similarity

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    # plant one mid-similarity pair: cos(base, mix) ≈ 0.6
    base = np.asarray(rows[0][1])
    other = rng.standard_normal(16)
    other -= (other @ base) * base
    other /= np.linalg.norm(other)
    mix = 0.6 * base + np.sqrt(1 - 0.36) * other
    rows.append((60, [float(x) for x in mix]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # exact truth from the block twin (unguarded at 61 rows)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.55, method="block"
        ).collect()
    }
    assert (0, 60) in exact
    # auto (= ivf at t<0.95, few lists at n=61) finds them all
    got = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.55
        ).collect()
    }
    assert got == exact


def test_lsh_band_bits_scale_with_n_rows_hint(spark):
    """With an n_rows hint far above 16·2^band_bits the LSH path must
    widen its band hashes (keeping bucket occupancy ~constant — the
    linear-work contract) while still finding a planted near-dup pair
    through the exact-verify stage."""
    import numpy as np

    from streaming_ecom_analytics_spark.functions import similarity

    rng = np.random.default_rng(11)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    twin = base + rng.standard_normal(32) * 0.01   # cos ≈ 0.9999
    twin /= np.linalg.norm(twin)
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in twin])]
    for i in range(2, 40):
        v = rng.standard_normal(32)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # n_rows hint of 10M -> bits = ceil(log2(10M/16)) = 20 per band
    out = similarity.embedding_near_dup_pairs(
        emb, threshold=0.99, method="lsh", dim=32, n_rows=10_000_000
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(0, 1)}


def test_ivf_join_recall_contract_catches_regression(spark):
    """The embedding_ivf_join_recall floor (0.80) must be a real gate:
    the registered settings (footer-count auto-sizing → 4 lists at 500
    rows, 4-way assignment) pass it on the sf0.001 corpus with FULL
    recall (pigeonhole: m=4 covers all 4 lists), and a degenerate
    single-assignment variant demonstrably fails it (measured 4/7
    pairs = 0.57 at 8 lists)."""
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import similarity

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    exact = similarity.embedding_near_dup_pairs(
        emb, threshold=0.45, dim=64, method="block"
    )
    good = similarity.embedding_near_dup_pairs(
        emb, threshold=0.45, dim=64, method="ivf",
        ivf_n_assign=4, ivf_target_occupancy=256,
        n_rows=catalog.parquet_num_rows("/root/testdata/sf0.001", "embeddings"),
    )
    row = similarity.pairs_recall_vs_exact(good, exact, min_recall=0.80).collect()[0]
    assert row.n_exact_pairs == 7 and bool(row.recall_ok)
    # full recall at this SF — what makes the _scalable registered
    # queries hash-green against the EXACT oracle
    assert good.count() == 7

    bad = similarity.embedding_near_dup_pairs(
        emb, threshold=0.45, dim=64, method="ivf",
        ivf_n_lists=8, ivf_n_assign=1,
    )
    row = similarity.pairs_recall_vs_exact(bad, exact, min_recall=0.80).collect()[0]
    assert not bool(row.recall_ok)


def test_ivf_auto_n_lists_requires_corpus_size(spark):
    """Auto list sizing needs the corpus size: with a capped training
    sample and no n_rows hint the IVF path must raise loudly instead of
    guessing; an n_rows hint (or an uncapped sample) sizes lists to the
    fixed-occupancy contract."""
    import pytest as _pytest

    from streaming_ecom_analytics_spark.functions import similarity

    emb = spark.range(50).selectExpr(
        "id AS vec_id",
        "array(cast(id as float), 1.0F, 0.0F, 0.0F) AS embedding",
    )
    with _pytest.raises(ValueError, match="n_rows"):
        similarity.embedding_near_dup_pairs(
            emb, threshold=0.5, method="ivf", ivf_train_rows=10
        )
    # uncapped sample → n inferred, runs fine
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.5, method="ivf")
    assert out.count() >= 0


def test_lsh_bands_co_scale_with_bits():
    """Round-7 advisor: widening band bits alone collapses banded
    recall as the corpus grows (at 10M rows / bits=20 with bands fixed
    at 24, true t=0.95 pairs miss ~5%). The schedule must co-scale
    n_bands so 1-(1-p^bits)^bands keeps the miss rate ≤1e-6 at the
    minimum supported threshold t=0.95, at every corpus size."""
    import math

    from streaming_ecom_analytics_spark.functions.similarity import (
        MIN_LSH_NEAR_DUP_THRESHOLD,
        _lsh_near_dup_params,
    )

    p = 1.0 - math.acos(MIN_LSH_NEAR_DUP_THRESHOLD) / math.pi
    for n in (None, 1_000, 10_000_000, 1_000_000_000):
        bands, bits = _lsh_near_dup_params(n_rows=n, n_bands=24, band_bits=8)
        assert bands >= 24 and bits >= 8  # caller values are floors
        if n is not None:
            # occupancy contract: buckets stay ~16 deep
            assert n <= 32 << bits
        miss = (1.0 - p**bits) ** bands
        if bits > 8:  # the schedule's own contract
            assert miss <= 1e-6, (n, bands, bits, miss)
    # the advisor's exact scenario: 10M rows must NOT run 24 bands
    bands, bits = _lsh_near_dup_params(n_rows=10_000_000, n_bands=24, band_bits=8)
    assert bits == 20 and bands > 24
    assert (1.0 - p**bits) ** bands <= 1e-6


def test_ivf_auto_n_assign_schedule():
    """Round-8 verdict #1: fixed multi-assignment loses recall
    decade-over-decade (m=4 measured pair recall 1.0/0.71/0.30 at
    sf0.1/10x/100x). The auto schedule m = max(4, ceil(1.5·log2(L)))
    must hold the measured floor at the probe decades (m=10 at 79
    lists → 0.99, m=15 at 782 → 0.92 — scripts/_ivf_recall_experiment
    grid) and stay bounded."""
    from streaming_ecom_analytics_spark.functions.similarity import (
        _ivf_auto_n_assign,
    )

    assert _ivf_auto_n_assign(1) == 4
    assert _ivf_auto_n_assign(4) == 4
    assert _ivf_auto_n_assign(8) == 5
    assert _ivf_auto_n_assign(79) == 10   # 10x probe decade
    assert _ivf_auto_n_assign(782) == 15  # 100x probe decade
    assert _ivf_auto_n_assign(1 << 30) == 32  # capped
    # monotone non-decreasing over decades
    ms = [_ivf_auto_n_assign(10**d) for d in range(1, 9)]
    assert ms == sorted(ms)


def test_ivf_gram_cost_contract(spark):
    """Round-9 verdict #7: the IVF join's cost curve must be a
    driver-checkable row, not SCALE.md prose. Pins: (a) the schedule
    columns match the join's own derivation from the corpus size;
    (b) the effective m (min(schedule, k_eff)) equals the schedule m
    on shipped-shaped corpora (the contract row's documented premise);
    (c) the skew boolean is genuinely falsifiable — a degenerate
    all-identical corpus concentrates every assignment into m lists
    and flips gram_skew_ok at a tight ratio while the default 4x
    tolerates it."""
    import numpy as np

    from streaming_ecom_analytics_spark.functions.similarity import (
        _ivf_auto_n_assign,
        _ivf_centroids,
        _ivf_training_sample,
    )

    sf = "/root/testdata/sf0.001"
    from streaming_ecom_analytics_spark import catalog

    emb = catalog.embeddings(spark, sf)
    n_rows = catalog.parquet_num_rows(sf, "embeddings")
    row = similarity.ivf_gram_cost_contract(
        emb, n_rows=n_rows, dim=64, target_occupancy=256
    ).collect()[0]
    n_lists = max(4, -(-n_rows // 256))
    m = _ivf_auto_n_assign(n_lists)
    assert row.n_lists == n_lists and row.m_assign == m
    assert row.predicted_gram_mflops == n_rows * 256 * m * m * 128 // 1_000_000
    assert row.gram_skew_ok is True
    # (b) effective m == schedule m: Lloyd retains >= m lists here
    mat = _ivf_training_sample(
        emb, id_col="vec_id", vec_col="embedding", train_rows=65_536
    )
    k_eff, _cent = _ivf_centroids(mat, n_lists, 42)
    assert min(m, k_eff) == m
    # (c) falsifiability: identical vectors -> all mass in m lists
    base = np.linspace(0.1, 1.0, 8).tolist()
    degen = spark.createDataFrame(
        [(i, base) for i in range(2000)], "vec_id long, embedding array<double>"
    )
    ok_default = similarity.ivf_gram_cost_contract(
        degen, n_rows=2000, dim=8, target_occupancy=256
    ).collect()[0]
    tight = similarity.ivf_gram_cost_contract(
        degen, n_rows=2000, dim=8, target_occupancy=256, max_skew_ratio=1
    ).collect()[0]
    assert ok_default.gram_skew_ok is True
    assert tight.gram_skew_ok is False
    # (d) round-10 advisor: a tiny non-empty corpus whose raw flop
    # budget is under one megaflop must NOT spuriously fail the bound
    # (the old compare floored predicted to integer mflops = 0 first)
    rng = np.random.default_rng(3)
    tiny = spark.createDataFrame(
        [(i, rng.normal(size=2).tolist()) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    tiny_row = similarity.ivf_gram_cost_contract(
        tiny, n_rows=10, dim=2, target_occupancy=4
    ).collect()[0]
    assert tiny_row.predicted_gram_mflops == 0  # reporting floor
    assert tiny_row.gram_skew_ok is True  # raw-flops compare


def test_ivf_empty_input_short_circuits(spark):
    """Round-8 advisor: an empty (or filtered-to-empty) input crashed
    the IVF path at plan construction (np.linalg.norm on a shape-(0,)
    array). It must now return an empty result with the standard
    (id_a, id_b, cosine) schema, like the block path always did."""
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.5, method="ivf")
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0
    # filtered-to-empty via auto routing (threshold<0.95 → ivf)
    emb2 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    ).filter("vec_id > 100")
    assert similarity.embedding_near_dup_pairs(emb2, threshold=0.5).count() == 0


def test_ivf_fat_list_salt_split_identical_pairs(spark):
    """Round-8 advisor / verdict #2: duplicate-heavy corpora share the
    same top-m lists, so one hot list can put an unbounded occ² Gram
    into a single scoring task. With ivf_max_list_rows the hot list is
    salt-split into bounded sub-block pair tasks — and the pair output
    must be IDENTICAL to the uncapped run (same candidates, same
    exact verify)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = []
    # 120 near-copies of one vector: every one lands in the same
    # top-m lists (multi-assignment cannot split a point mass)
    for i in range(120):
        v = base + rng.standard_normal(16) * 1e-3
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    # plus background vectors so Lloyd trains distinct lists
    for i in range(120, 200):
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.9, dim=16, method="ivf", ivf_n_lists=8, n_rows=200)
    uncapped = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, ivf_max_list_rows=None, **kw
        ).collect()
    }
    # the hot list holds ≥120 rows; a 32-row cap forces ceil(n/32)≥4
    # salts → sub-block pair scoring engages for real
    capped = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, ivf_max_list_rows=32, **kw
        ).collect()
    }
    assert len(uncapped) == 120 * 119 // 2  # all hot-pair combinations
    assert capped == uncapped


def test_ivf_verify_join_not_force_broadcast(spark):
    """Round-8 advisor (medium): the IVF path's candidate set is
    corpus-proportional (near-dup output scales with n), so the exact
    verify must NOT force-broadcast it — broadcast_cand was documented
    as False for IVF but never passed. With the fat-list machinery off
    (max_list_rows=None) the IVF plan must carry no broadcast hint at
    all; the LSH path keeps its output-sized broadcast."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivf = similarity.embedding_near_dup_pairs(
        emb, threshold=0.5, method="ivf", ivf_max_list_rows=None
    )
    assert "ResolvedHint" not in ivf._jdf.queryExecution().analyzed().toString()
    lsh = similarity.embedding_near_dup_pairs(
        emb, threshold=0.99, method="lsh", dim=8
    )
    assert "ResolvedHint" in lsh._jdf.queryExecution().analyzed().toString()
