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
