"""Round-11 optimization internals: family-shared subtrees (exact-ANN
ground truth, k=3 shingles, capped-Jaccard pairs, k-means assignment,
item co-occurrence, block/IVF embedding pairs), the injectable
``shingles_df`` / ``assigned_df`` parameters behind them, and the
Arrow partial-Gram kernel that replaced the eigenvector query's
posexplode self-join. Every test pins the optimization's contract:
output-identical to the unshared / join formulation."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from streaming_ecom_analytics_spark import catalog  # noqa: E402
from streaming_ecom_analytics_spark.caching import (  # noqa: E402
    release_shared,
    shared_subtree,
)
from streaming_ecom_analytics_spark.functions import dedup, similarity  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_df(spark):
    return catalog.documents(spark, SF_DIR)


@pytest.fixture()
def emb_df(spark):
    return catalog.embeddings(spark, SF_DIR)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


class TestInjectedShingles:
    """``shingles_df`` injection must be output-identical to the
    internal build — the whole correctness argument for sharing the
    shingle subtree across the dedup family."""

    def test_minhash_lsh_pairs_with_injected_shingles(self, spark, docs_df):
        base = dedup.minhash_lsh_pairs(docs_df, k=3, threshold=0.8)
        sh = dedup.shingles(docs_df, k=3)
        injected = dedup.minhash_lsh_pairs(
            docs_df, k=3, threshold=0.8, shingles_df=sh
        )
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_minhash_lsh_pairs_with_injected_sigs(self, spark, docs_df):
        """``sigs_df`` injection (round-11 second batch): the shared
        full-corpus signature table must reproduce the internal
        aggregation exactly."""
        base = dedup.minhash_lsh_pairs(docs_df, k=3, threshold=0.8)
        sh = dedup.shingles(docs_df, k=3)
        sigs = dedup.minhash_signatures(sh, id_col="doc_id", num_perm=64)
        injected = dedup.minhash_lsh_pairs(
            docs_df, k=3, threshold=0.8, shingles_df=sh, sigs_df=sigs
        )
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_lsh_against_with_injected_delta_frames(self, spark, docs_df):
        """Delta-side injection for the incremental cross-corpus path:
        full-corpus shared shingle/signature tables semi-joined to the
        delta ids must equal shingling/signing the delta directly (both
        operations commute with restricting the doc set)."""
        delta = docs_df.filter(F.col("source") != "src0")
        ref = docs_df.filter(F.col("source") == "src0")
        base = dedup.minhash_lsh_pairs_against(delta, ref, k=3, threshold=0.8)
        sh_full = dedup.shingles(docs_df, k=3)
        sig_full = dedup.minhash_signatures(sh_full, id_col="doc_id", num_perm=64)
        ids = delta.select("doc_id")
        injected = dedup.minhash_lsh_pairs_against(
            delta, ref, k=3, threshold=0.8,
            new_shingles_df=sh_full.join(ids, on="doc_id", how="left_semi"),
            new_sigs_df=sig_full.join(ids, on="doc_id", how="left_semi"),
        )
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_jaccard_pairs_capped_with_injected_shingles(self, spark, docs_df):
        base = dedup.jaccard_pairs_capped(docs_df, k=3, threshold=0.8, df_cap=100)
        sh = dedup.shingles(docs_df, k=3)
        injected = dedup.jaccard_pairs_capped(
            docs_df, k=3, threshold=0.8, df_cap=100, shingles_df=sh
        )
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_capped_threshold_zero_is_superset_filterable(self, spark, docs_df):
        """The shared capped-pair table is built at threshold=0.0 and
        the registered 0.8 query filters it — prove filter-after ==
        filter-inside (the near_dup_jaccard_capped rewiring)."""
        inside = dedup.jaccard_pairs_capped(docs_df, k=3, threshold=0.8, df_cap=100)
        all_pairs = dedup.jaccard_pairs_capped(
            docs_df, k=3, threshold=0.0, df_cap=100
        )
        after = all_pairs.filter(F.col("jaccard") >= 0.8)
        assert _sorted_rows(inside) == _sorted_rows(after)


class TestInjectedAssignment:
    def test_kmeans_assign_fixed_with_injected_assignment(self, spark, emb_df):
        base = similarity.kmeans_assign_fixed(emb_df, k=8)
        asg = similarity._assigned_pairs(
            emb_df, k=8, id_col="vec_id", vec_col="embedding"
        )
        injected = similarity.kmeans_assign_fixed(emb_df, k=8, assigned_df=asg)
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_kmeans_lloyd_update_with_injected_assignment(self, spark, emb_df):
        base = similarity.kmeans_lloyd_update(emb_df, k=8)
        asg = similarity._assigned_pairs(
            emb_df, k=8, id_col="vec_id", vec_col="embedding"
        )
        injected = similarity.kmeans_lloyd_update(emb_df, k=8, assigned_df=asg)
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_semantic_dedup_with_injected_assignment(self, spark, emb_df):
        base = similarity.semantic_dedup(
            emb_df, k=8, threshold=0.45, dim=64, method="block"
        )
        asg = similarity._assigned_pairs(
            emb_df, k=8, id_col="vec_id", vec_col="embedding"
        )
        injected = similarity.semantic_dedup(
            emb_df, k=8, threshold=0.45, dim=64, method="block", assigned_df=asg
        )
        assert _sorted_rows(base) == _sorted_rows(injected)


class TestIntGramMicro:
    def test_matches_posexplode_join_formulation(self, spark, emb_df):
        """The Arrow partial-Gram kernel must be BIT-identical to the
        self-join it replaced (both are exact integer arithmetic)."""
        dec = "decimal(38,0)"
        vm = emb_df.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "val"),
        ).select(
            "vec_id",
            "i",
            F.floor(F.col("val") * F.lit(1000000.0)).cast("long").alias("m"),
        )
        a = vm.select("vec_id", F.col("i").alias("ai"), F.col("m").alias("am"))
        b = vm.select("vec_id", F.col("i").alias("bi"), F.col("m").alias("bm"))
        gram_join = (
            a.join(b, on="vec_id")
            .groupBy(F.col("ai").alias("i"), F.col("bi").alias("j"))
            .agg(F.sum((F.col("am") * F.col("bm")).cast(dec)).alias("g"))
        )
        gram_arrow = similarity.int_gram_micro(emb_df, vec_col="embedding", dim=64)
        assert _sorted_rows(gram_join) == _sorted_rows(gram_arrow)

    def test_empty_input_yields_empty_gram(self, spark, emb_df):
        empty = emb_df.filter(F.col("vec_id") < 0)
        out = similarity.int_gram_micro(empty, vec_col="embedding", dim=64)
        assert out.count() == 0

    def test_dim_inferred_without_declaration(self, spark, emb_df):
        """dim is optional — the kernel sizes its accumulator off the
        data, so the registered query works on ANY corpus width (the
        eigenvector unit test drives it with an 8-dim crafted frame)."""
        out = similarity.int_gram_micro(emb_df, vec_col="embedding")
        assert out.count() == 64 * 64

    def test_declared_dim_mismatch_raises(self, spark, emb_df):
        from pyspark.errors.exceptions.captured import PythonException

        with pytest.raises(PythonException, match="declared dim=8"):
            similarity.int_gram_micro(
                emb_df, vec_col="embedding", dim=8
            ).write.format("noop").mode("overwrite").save()


class TestSharedSubtree:
    def test_same_key_returns_same_frame(self, spark, docs_df):
        calls = []

        def build():
            calls.append(1)
            return docs_df.select("doc_id")

        a = shared_subtree(("t11", "x"), build)
        b = shared_subtree(("t11", "x"), build)
        assert a is b and len(calls) == 1
        release_shared()
        c = shared_subtree(("t11", "x"), build)
        assert len(calls) == 2 and c is not None


class TestLshSingleScan:
    """Round-11 second batch: the multi-table LSH candidate join was
    collapsed from a union of per-table bucket joins (n_tables corpus
    scans) into ONE posexplode + equi-join on (table_id, bucket). The
    candidate multiset — and therefore the deduped pair set and the
    reranked top-k — must be identical to the historical union form."""

    @staticmethod
    def _union_form_topk(emb, q, *, k, dim, n_planes, n_tables, seed=42):
        """The pre-round-11 per-table union implementation, inlined as
        the reference."""
        import numpy as np
        from pyspark.sql import Window

        rng = np.random.default_rng(seed)
        v = F.col("embedding").cast("array<double>")
        cand = None
        for _ in range(n_tables):
            planes = rng.standard_normal((n_planes, dim)).tolist()
            c = emb.select(
                F.col("vec_id").alias("neighbor_id"),
                similarity.hyperplane_bucket(v, planes).alias("bucket"),
            )
            base_bucket = similarity.hyperplane_bucket(v, planes)
            probe_buckets = F.array(
                base_bucket,
                *[base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
            qb = q.select(
                F.col("vec_id").alias("query_id"),
                F.explode(probe_buckets).alias("bucket"),
            )
            pairs_t = c.join(F.broadcast(qb), on="bucket").select(
                "query_id", "neighbor_id"
            )
            cand = pairs_t if cand is None else cand.unionByName(pairs_t)
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
        nbr = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            v.alias("nv"),
            similarity._norm(v).alias("nn"),
        )
        qv = q.select(
            F.col("vec_id").alias("query_id"),
            v.alias("qv"),
            similarity._norm(v).alias("qn"),
        )
        cos = similarity._dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
        scored = (
            cand.join(nbr, on="neighbor_id")
            .join(F.broadcast(qv), on="query_id")
            .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    def test_single_scan_equals_union_form(self, spark, emb_df):
        q = emb_df.filter(F.col("vec_id") < 10)
        new = similarity.lsh_bucketed_topk(
            emb_df, q, k=5, dim=64, n_planes=4, n_tables=4
        )
        ref = self._union_form_topk(
            emb_df, q, k=5, dim=64, n_planes=4, n_tables=4
        )
        assert _sorted_rows(new) == _sorted_rows(ref)

    def test_single_table_unchanged(self, spark, emb_df):
        """n_tables=1 (the library default) goes through the same
        posexplode path — still identical to the union form."""
        q = emb_df.filter(F.col("vec_id") < 5)
        new = similarity.lsh_bucketed_topk(
            emb_df, q, k=3, dim=64, n_planes=6, n_tables=1
        )
        ref = self._union_form_topk(
            emb_df, q, k=3, dim=64, n_planes=6, n_tables=1
        )
        assert _sorted_rows(new) == _sorted_rows(ref)


class TestSqlLiteralForms:
    """The SQL-text expression builders (_dot_lit_sql & friends) exist
    only to cut py4j plan-construction cost; they must be bit-identical
    to the per-element Column forms they replaced."""

    def test_dot_lit_sql_bit_equal(self, spark, emb_df):
        import numpy as np

        rng = np.random.default_rng(3)
        vals = rng.standard_normal(64).tolist()
        v = F.col("embedding").cast("array<double>")
        per_elem = similarity._dot(v, F.array(*[F.lit(float(x)) for x in vals]))
        sql_form = F.expr(
            similarity._dot_lit_sql("cast(`embedding` as array<double>)", vals)
        )
        bad = emb_df.select(
            (per_elem != sql_form).alias("diff")
        ).filter("diff").count()
        assert bad == 0

    def test_hyperplane_bucket_sql_bit_equal(self, spark, emb_df):
        import numpy as np

        rng = np.random.default_rng(4)
        planes = rng.standard_normal((4, 64)).tolist()
        v = F.col("embedding").cast("array<double>")
        per_elem = similarity.hyperplane_bucket(v, planes)
        sql_form = F.expr(
            similarity._hyperplane_bucket_sql(
                "cast(`embedding` as array<double>)", planes
            )
        )
        bad = emb_df.select(
            (per_elem != sql_form).alias("diff")
        ).filter("diff").count()
        assert bad == 0


class TestSharedClusters:
    """Round-11 third batch: the CC fixpoint output and the SemDeDup
    exact pair set are injectable; injection must be output-identical
    to the internal build."""

    def test_dedup_keep_best_with_injected_clusters(self, spark, docs_df):
        from streaming_ecom_analytics_spark.functions import curate

        pairs = dedup.minhash_lsh_pairs(docs_df, k=3, threshold=0.8)
        base = curate.dedup_keep_best(docs_df, pairs)
        clusters = dedup.dup_clusters(docs_df, pairs)
        injected = curate.dedup_keep_best(docs_df, pairs, clusters_df=clusters)
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_semantic_dedup_with_injected_block_pairs(self, spark, emb_df):
        base = similarity.semantic_dedup(
            emb_df, k=8, threshold=0.45, dim=64, method="block"
        )
        pairs = similarity.embedding_near_dup_pairs(
            emb_df, threshold=0.45, dim=64, method="block"
        )
        injected = similarity.semantic_dedup(
            emb_df, k=8, threshold=0.45, dim=64, method="block", pairs_df=pairs
        )
        assert _sorted_rows(base) == _sorted_rows(injected)

    def test_semantic_dedup_rejects_pairs_df_for_ivf(self, spark, emb_df):
        pairs = similarity.embedding_near_dup_pairs(
            emb_df, threshold=0.45, dim=64, method="block"
        )
        with pytest.raises(ValueError, match="pairs_df injection"):
            similarity.semantic_dedup(
                emb_df, k=8, threshold=0.45, dim=64, method="ivf",
                n_rows=1000, pairs_df=pairs,
            )


class TestSharedDriverValueMemo:
    """Round-11 fourth batch: the per-pass driver-value memo that
    de-duplicates the IVF family's bounded training collects and numpy
    Lloyd runs (caching.shared_driver_value)."""

    def test_memo_hits_on_same_anchor_and_clears_on_release(self, spark):
        from streaming_ecom_analytics_spark.caching import (
            shared_driver_value,
        )

        anchor = object()
        calls = []
        build = lambda: calls.append(1) or len(calls)  # noqa: E731
        v1 = shared_driver_value(anchor, ("k",), build)
        v2 = shared_driver_value(anchor, ("k",), build)
        assert v1 == v2 and len(calls) == 1
        # different key or different anchor → rebuild
        shared_driver_value(anchor, ("other",), build)
        shared_driver_value(object(), ("k",), build)
        assert len(calls) == 3
        release_shared()
        shared_driver_value(anchor, ("k",), build)
        assert len(calls) == 4

    def test_training_sample_memoized_per_frame_and_readonly(
        self, spark, emb_df
    ):
        import numpy as np

        release_shared()
        m1 = similarity._ivf_training_sample(
            emb_df, id_col="vec_id", vec_col="embedding", train_rows=65536
        )
        m2 = similarity._ivf_training_sample(
            emb_df, id_col="vec_id", vec_col="embedding", train_rows=65536
        )
        assert m1 is m2  # memo hit: identical object, no second collect
        assert not m1.flags.writeable
        with pytest.raises(ValueError):
            m1[0, 0] = 0.0
        # different params → genuinely different sample
        m3 = similarity._ivf_training_sample(
            emb_df, id_col="vec_id", vec_col="embedding", train_rows=16
        )
        assert m3 is not m1 and m3.shape[0] == 16
        # centroid memo keys on (sample object, n_lists, seed)
        c1 = similarity._ivf_centroids(m1, 8, 42)
        c2 = similarity._ivf_centroids(m1, 8, 42)
        assert c1[1] is c2[1]
        c3 = similarity._ivf_centroids(m1, 4, 42)
        assert c3[1] is not c1[1]
        release_shared()
        m4 = similarity._ivf_training_sample(
            emb_df, id_col="vec_id", vec_col="embedding", train_rows=65536
        )
        assert m4 is not m1  # release cleared the memo
        assert np.array_equal(np.asarray(m4), np.asarray(m1))
        release_shared()

    def test_ivf_train_df_sample_identical_through_1to1_join(
        self, spark, emb_df
    ):
        """semantic_dedup trains the cluster-pushdown IVF join on the
        UNJOINED corpus frame (ivf_train_df); that is sound only if the
        id-sorted bounded sample drawn through the 1:1 cluster join is
        value-identical to the plain corpus sample."""
        import numpy as np

        release_shared()
        asg = similarity._assigned_pairs(
            emb_df, k=8, id_col="vec_id", vec_col="embedding"
        )
        joined = emb_df.join(
            asg.select(F.col("vec_id"), F.col("cluster_id")), on="vec_id"
        )
        m_plain = similarity._ivf_training_sample(
            emb_df, id_col="vec_id", vec_col="embedding", train_rows=64
        )
        m_joined = similarity._ivf_training_sample(
            joined, id_col="vec_id", vec_col="embedding", train_rows=64
        )
        assert np.array_equal(np.asarray(m_plain), np.asarray(m_joined))
        release_shared()
