"""ANN recall-trend artifact (round-6 verdict #7): the registered
ann_* queries assert recall FLOORS (contracts), but the observed mean
recalls lived in code comments — invisible to diffs. This script
measures them and emits RECALL_r{N}.json so recall drift diffs like a
value hash: a quantizer nerf, a probing regression, or an upstream
Spark ML change moves a committed number, not a comment.

Per index family (LSH / IVF / PQ / IVF+PQ), per SF (0.001/0.01/0.1):
observed mean recall@5 of the approximate answer vs the brute-force
exact top-5 for the standard 10-query set (vec_id < 10), plus the
registered floor for context.

Round 8 adds the IVF similarity-JOIN family (pair recall, not top-k
recall): embedding_near_dup_pairs(method='ivf') at t=0.45 vs the exact
block twin, per SF plus the 10x probe decade — the honest trend line
for the scale-safe mid-threshold join (round-7 verdict #1).

Round 9: the IVF join runs the shipped log-scaled multi-assignment
(no explicit ivf_n_assign override — the ledger measures the policy
users get), the 0.80 floor now also applies to the 10x probe decade
(round-8 verdict #1), and ``--deep`` adds the 100x decade point (the
exact block twin at 200k rows costs ~8 min — run once per round).

Usage: python scripts/recall_report.py [--deep] > RECALL_r9.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from streaming_ecom_analytics_spark import catalog  # noqa: E402
from streaming_ecom_analytics_spark.caching import release_tracked  # noqa: E402
from streaming_ecom_analytics_spark.functions import similarity  # noqa: E402
from streaming_ecom_analytics_spark.session import get_spark  # noqa: E402

# (name, approx builder, registered floor) — floors from
# plans/extension_queries.py; keep in sync when a contract changes.
INDEXES = [
    (
        "ann_lsh_topk",
        lambda emb, q: similarity.lsh_bucketed_topk(
            emb, q, k=5, dim=64, n_planes=4, n_tables=4
        ),
        0.60,
    ),
    ("ann_ivf_topk", lambda emb, q: similarity.ivf_topk(emb, q, k=5), 0.40),
    (
        "ann_pq_topk",
        lambda emb, q: similarity.pq_topk(emb, q, k=5, dim=64),
        0.60,
    ),
    (
        "ann_ivfpq_topk",
        lambda emb, q: similarity.ivfpq_topk(emb, q, k=5, dim=64),
        0.40,
    ),
    # round-9 session-2: exact scoring over the int8-dequantized corpus
    # — the compression-fidelity trend. The query side is the SAME
    # dequantized view filtered to the standard query ids (corpus-wide
    # scales, matching the registered contract exactly).
    (
        "ann_int8_topk",
        lambda emb, q: (
            lambda deq: similarity.cosine_topk_blas(
                deq, deq.join(q.select("vec_id"), on="vec_id"), k=5
            )
        )(similarity.embedding_int8_dequantized(emb, dim=64)),
        0.85,
    ),
]

SFS = ["0.001", "0.01", "0.1"]


def mean_recall(spark, approx, exact) -> float:
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
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias(
                "recall"
            )
        )
    )
    return float(per_q.agg(F.avg("recall")).collect()[0][0])


def _ivf_join_recall(spark, deep: bool) -> dict:
    """Pair recall of the IVF similarity join vs the exact block twin,
    at every shipped SF and the 10x probe decade (where the exact twin
    still fits its 250k guard). Since round 9 the registered floor
    (0.80) applies to the 10x decade too — the log-scaled
    multi-assignment exists to hold it there; the 100x point
    (``--deep``) is the trend line."""
    dirs = [(f"sf{sf}", f"/root/testdata/sf{sf}") for sf in SFS]
    probe = REPO / "scale_probe" / "sf1"
    if probe.is_dir():
        dirs.append(("sf1_probe_10x", str(probe)))
    probe100 = REPO / "scale_probe" / "sf10"
    if deep and probe100.is_dir():
        dirs.append(("sf10_probe_100x", str(probe100)))
    row = {
        "floor": 0.80,
        "floor_applies_to": [f"sf{sf}" for sf in SFS] + ["sf1_probe_10x"],
        "threshold": 0.45,
        "observed_pair_recall": {},
    }
    for label, d in dirs:
        emb = catalog.embeddings(spark, d)
        n_rows = catalog.parquet_num_rows(d, "embeddings")
        approx = similarity.embedding_near_dup_pairs(
            emb, threshold=0.45, dim=64, method="ivf",
            ivf_target_occupancy=256, n_rows=n_rows,
        )
        exact = similarity.embedding_near_dup_pairs(
            emb, threshold=0.45, dim=64, method="block", n_rows=n_rows,
        )
        stats = similarity.pairs_recall_vs_exact(
            approx, exact, min_recall=0.0
        )  # floor 0: we want the raw number here
        n_exact = stats.collect()[0].n_exact_pairs
        n_hit = (
            approx.select("id_a", "id_b")
            .join(exact.select("id_a", "id_b"), on=["id_a", "id_b"])
            .count()
        )
        # measured Gram-cost ratio (round-9 verdict #7): the registered
        # contract row bound-checks observed <= 4x predicted; the exact
        # per-decade ratio — which needs no cross-engine exactness —
        # lives here, next to the recall it was traded against
        cost = similarity.ivf_gram_cost_contract(
            emb, n_rows=n_rows, dim=64, target_occupancy=256,
            emit_observed=True,
        ).collect()[0]
        release_tracked()
        row["observed_pair_recall"][label] = {
            "n_exact_pairs": int(n_exact),
            "recall": round(n_hit / max(1, n_exact), 4),
            "m_assign": int(cost.m_assign),
            "n_lists": int(cost.n_lists),
            "predicted_gram_mflops": int(cost.predicted_gram_mflops),
            "observed_gram_mflops": int(cost.observed_gram_mflops),
            "observed_over_predicted": round(
                cost.observed_gram_mflops / max(1, cost.predicted_gram_mflops), 3
            ),
            "gram_skew_ok": bool(cost.gram_skew_ok),
        }
    shipped = [
        v["recall"]
        for k, v in row["observed_pair_recall"].items()
        if k in row["floor_applies_to"]
    ]
    row["min_observed_where_floor_applies"] = min(shipped)
    row["margin_over_floor"] = round(min(shipped) - row["floor"], 4)
    return row


def main() -> int:
    deep = "--deep" in sys.argv
    spark = get_spark(app_name="recall_report")
    out: dict[str, dict] = {}
    for name, build, floor in INDEXES:
        row = {"floor": floor, "observed_mean_recall_at5": {}}
        for sf in SFS:
            emb = catalog.embeddings(spark, f"/root/testdata/sf{sf}")
            q = emb.filter(F.col("vec_id") < 10)
            r = mean_recall(spark, build(emb, q), similarity.cosine_topk_blas(emb, q, k=5))
            release_tracked()
            row["observed_mean_recall_at5"][f"sf{sf}"] = round(r, 4)
        row["min_observed"] = min(row["observed_mean_recall_at5"].values())
        row["margin_over_floor"] = round(row["min_observed"] - floor, 4)
        out[name] = row
    out["embedding_ivf_join"] = _ivf_join_recall(spark, deep)
    json.dump(
        {"k": 5, "queries": "vec_id < 10 (10 queries)", "indexes": out},
        sys.stdout,
        indent=1,
    )
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
