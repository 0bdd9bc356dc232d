"""Unit tests for the round-9 retrieval/layout queries: RRF fusion
semantics (hybrid_search_rrf) and z-bucket envelope/skip semantics
(zorder_data_skipping) — the edge behaviors the full-query oracle
hash can't isolate on its own."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from streaming_ecom_analytics_spark.operators import layout
from streaming_ecom_analytics_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- RRF


def test_rrf_fused_score_matches_rank_formula(spark):
    """Every output row's rrf_score must equal 1/(60+r) summed over the
    arms the doc appears in (rank 0 = absent = contributes nothing)."""
    out = REGISTRY["hybrid_search_rrf"].fn(spark, SF_DIR).toPandas()
    assert len(out) == 15
    for _, row in out.iterrows():
        expect = 0.0
        if row.r_lex > 0:
            expect += 1.0 / (60 + row.r_lex)
        if row.r_vec > 0:
            expect += 1.0 / (60 + row.r_vec)
        assert abs(row.rrf_score - round(expect, 6)) < 1e-9, row


def test_rrf_single_arm_docs_present_and_ranked_below_dual(spark):
    """A doc in both top-50s always outranks a doc holding the SAME
    ranks in only one arm; fused order is rrf desc, doc_id asc."""
    out = REGISTRY["hybrid_search_rrf"].fn(spark, SF_DIR).toPandas()
    scores = list(out.rrf_score)
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)
    # both-arm fusion is the point of RRF: at least one fused doc must
    # carry two live ranks OR the corpus genuinely has disjoint arms
    dual = out[(out.r_lex > 0) & (out.r_vec > 0)]
    single = out[(out.r_lex == 0) | (out.r_vec == 0)]
    if len(dual) and len(single):
        assert dual.rrf_score.max() >= single.rrf_score.max() - 1.0 / 60


def test_rrf_ranks_are_dense_per_arm(spark):
    """Ranks within each arm (where present) are drawn from 1..50 with
    no duplicates — i.e. they really are per-arm ranks, not scores."""
    out = REGISTRY["hybrid_search_rrf"].fn(spark, SF_DIR).toPandas()
    for col in ("r_lex", "r_vec"):
        live = out[out[col] > 0][col]
        assert live.is_unique
        assert live.between(1, 50).all()


# ------------------------------------------------------------- Z-order


def test_zorder_buckets_partition_the_table(spark):
    """Bucket row counts must sum to the table's row count, and the
    per-bucket [min,max] envelopes must cover every matching row:
    SUM(rows_matching) == the predicate's true count, and matches only
    occur in scanned buckets (no false skip — the correctness property
    of data skipping; false POSITIVES are allowed, false negatives
    never)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = ev.count()
    true_match = ev.filter(
        F.col("user_id").between(40, 80) & F.col("value").between(100.0, 200.0)
    ).count()

    out = REGISTRY["zorder_data_skipping"].fn(spark, SF_DIR).toPandas()
    assert out.n_rows.sum() == total
    assert out.rows_matching.sum() == true_match
    assert (out[out.rows_matching > 0].scanned).all()


def test_zorder_probe_actually_skips_buckets(spark):
    """The layout must buy real skipping on this data: some buckets
    are not scanned, and the scanned subset is selective (fewer rows
    than the whole table)."""
    out = REGISTRY["zorder_data_skipping"].fn(spark, SF_DIR).toPandas()
    assert (~out.scanned).any(), "probe box scanned every bucket"
    scanned_rows = out[out.scanned].n_rows.sum()
    assert scanned_rows < out.n_rows.sum()


def test_zorder_key_monotone_in_each_dim(spark):
    """zorder_key: fixing one column, the Morton key is monotone in
    the other's quantized value — the property that makes range
    predicates map to z-ranges."""
    rows = [(i, float(j)) for i in range(0, 256, 37) for j in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    keyed = (
        layout.zorder_key(df, ["user_id", "value"], bits=8)
        .orderBy("user_id", "value")
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in keyed:
        by_user.setdefault(r["user_id"], []).append(r["__z"])
    for zs in by_user.values():
        assert zs == sorted(zs)


def test_zorder_bucket_envelopes_tighter_than_global(spark):
    """Quality (not just correctness) of the layout: the mean bucket
    envelope area must be far below the full domain's area — random
    row placement would put every bucket's envelope at ~the global
    bbox."""
    out = REGISTRY["zorder_data_skipping"].fn(spark, SF_DIR).toPandas()
    multi = out[out.n_rows > 1]
    if multi.empty:
        pytest.skip("degenerate: no multi-row buckets at this SF")
    gu = out.max_user.max() - out.min_user.min()
    gv = out.max_value.max() - out.min_value.min()
    area = (
        (multi.max_user - multi.min_user).clip(lower=1) / max(gu, 1)
    ) * ((multi.max_value - multi.min_value).clip(lower=0.01) / max(gv, 0.01))
    assert area.mean() < 0.25
