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

Usage: python scripts/recall_report.py > RECALL_r7.json
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


def main() -> int:
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
    json.dump(
        {"k": 5, "queries": "vec_id < 10 (10 queries)", "indexes": out},
        sys.stdout,
        indent=1,
    )
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
