"""Streaming SLO bench (round-6 verdict #3): MEASURE the reference's
two streaming SLOs instead of asserting them.

Reference SLOs (BASELINE.md):
- <=5-minute dashboard freshness (reference README.md:51);
- sustained replay of >=10k events per day-partition per micro-batch
  (reference extractor.py:122's month replay loop).

Three replay configurations, each driving the FULL production path —
file source -> watermark -> three windowed aggregates (funnel /
sliding revenue / active users) running CONCURRENTLY -> complete-mode
parquet materializers, Trigger.AvailableNow — over the sf0.1 events
table (100k rows, 30 days). Metrics come from each query's
StreamingQueryProgress (batchDuration, numInputRows), i.e. the
engine's own telemetry:

1. per_day_replay: one parquet file per calendar day,
   maxFilesPerTrigger=1 — 30 micro-batches per view; the freshness
   cadence measurement (p95 batch duration vs the 5-min SLO).
2. day_slo_replay: one file per 3-day group (~10k rows each,
   >= the reference's 10k-events day-partition bar) — every batch is a
   big-partition replay; the worst batch must clear the freshness
   budget by a wide margin.
3. single_batch_throughput: all 30 files in ONE trigger — the peak
   pipeline rows/s with batch overhead amortized (the number
   comparable to BASELINE.md's round-1 ~31k events/s single-view
   measurement; this one runs THREE views concurrently).

4. saturation_sweep_10x (round-7 verdict #5): the 10x probe events
   (scale_probe/sf1, 1M rows) replayed through the SAME three
   concurrent views at growing batch sizes (1/3/10/30 days per
   micro-batch ≈ 33k/100k/333k/1M rows). The knee is where p95 batch
   duration crosses a 10 s dashboard trigger interval: batches below
   it replay at a sustainable cadence; the plateau rows/s at the
   largest batch is the pipeline's saturation throughput. This
   restates the SLO margins at 10x with a measured saturation point
   instead of an extrapolated one.

5. saturation_sweep_100x (round-8 verdict #4): the round-8 sweep never
   reached the knee — p95 stayed under the trigger at its largest
   buildable batch (1M rows), so "≥100k rows/s/view" was a LOWER
   BOUND, not a measured capacity. This sweep replays the 100x probe
   events (scale_probe/sf10, 10M rows) at 1M/3.3M/10M rows per
   micro-batch so p95 actually crosses the 10 s trigger and
   saturated_within_measured_range flips true — the knee becomes a
   measured number.

Usage: python scripts/stream_bench.py > STREAMBENCH_r9.json
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_STREAM_PROBE_DIR (default /root/repo/scale_probe/sf1;
     set empty to skip the sweeps),
     SPARK_GRAFT_STREAM_PROBE100_DIR (default /root/repo/scale_probe/sf10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from streaming_ecom_analytics_spark import catalog  # noqa: E402
from streaming_ecom_analytics_spark.session import get_spark  # noqa: E402
from streaming_ecom_analytics_spark.streaming.pipeline import (  # noqa: E402
    StreamingPipeline,
)

FRESHNESS_SLO_MS = 5 * 60 * 1000
DAY_SLO_ROWS = 10_000
VIEW_NAMES = ["funnel_5m", "sliding_revenue", "active_users_daily"]


def _quantile(xs: list[float], q: float) -> float:
    s = sorted(xs)
    if not s:
        return float("nan")
    i = min(len(s) - 1, int(round(q * (len(s) - 1))))
    return s[i]


def _write_day_files(spark, sf_dir: str, root: str, days_per_file: int) -> tuple[str, int, int]:
    ev = catalog.events(spark, sf_dir).withColumn(
        "day_grp", F.floor((F.dayofmonth("ts") - 1) / days_per_file).cast("int")
    )
    src = f"{root}/source_{days_per_file}"
    n_groups = ev.agg(F.countDistinct("day_grp")).collect()[0][0]
    for g in range(n_groups):
        (
            ev.filter(F.col("day_grp") == g)
            .drop("day_grp")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    return src, n_groups, ev.count()


def _run_replay(spark, root: str, src: str, label: str, mft: int) -> dict:
    pipe = StreamingPipeline(
        spark,
        warehouse_dir=f"{root}/warehouse_{label}",
        checkpoint_dir=f"{root}/checkpoints_{label}",
    )
    stream = pipe.file_events_source(src, max_files_per_trigger=mft)
    t0 = time.perf_counter()
    pipe.start_views(stream, available_now=True)
    for q in pipe.queries:
        q.awaitTermination()
    wall = time.perf_counter() - t0

    views: dict[str, dict] = {}
    total_rows = 0
    all_lat: list[float] = []
    big_lat: list[float] = []
    for view_name, q in zip(VIEW_NAMES, pipe.queries):
        prog = [
            json.loads(p.json if isinstance(p.json, str) else p.json())
            for p in q.recentProgress
        ]
        data = [p for p in prog if p.get("numInputRows", 0) > 0]
        lat = [float(p["batchDuration"]) for p in data]
        rows = sum(p["numInputRows"] for p in data)
        total_rows += rows
        all_lat += lat
        big_lat += [
            float(p["batchDuration"])
            for p in data
            if p["numInputRows"] >= DAY_SLO_ROWS
        ]
        views[view_name] = {
            "batches": len(data),
            "rows": rows,
            "p50_batch_ms": round(_quantile(lat, 0.50), 1),
            "p95_batch_ms": round(_quantile(lat, 0.95), 1),
            "max_batch_ms": round(max(lat), 1) if lat else None,
        }
    return {
        "wall_seconds": round(wall, 2),
        "rows_per_sec_per_view": round(total_rows / 3 / wall, 1),
        "row_processings_per_sec": round(total_rows / wall, 1),
        "views": views,
        "p95_batch_ms": max(v["p95_batch_ms"] for v in views.values()),
        "n_big_batches": len(big_lat),
        "worst_big_batch_ms": round(max(big_lat), 1) if big_lat else None,
    }


TRIGGER_INTERVAL_MS = 10_000  # dashboard cadence for the knee definition


def _saturation_sweep(
    spark, root: str, probe_dir: str, *, tag: str = "10x",
    dpfs: tuple[int, ...] = (1, 3, 10, 30),
) -> dict:
    """Batch-size sweep over probe events: p95 batch duration and
    per-view throughput as rows/batch grows. The knee = largest batch
    size whose p95 still fits a 10 s trigger interval (beyond it a
    processing-time trigger at that cadence falls behind and queues);
    the largest batch's rows/s is the saturation throughput (batch
    overhead fully amortized)."""
    sweep_root = f"{root}/sweep{tag}"  # distinct from the sf0.1 sources
    points = []
    for dpf in dpfs:
        src, n_files, total = _write_day_files(
            spark, probe_dir, sweep_root, days_per_file=dpf
        )
        r = _run_replay(spark, sweep_root, src, f"sweep{tag}_{dpf}d", mft=1)
        points.append(
            {
                "days_per_batch": dpf,
                "n_batches_per_view": n_files,
                "rows_per_batch": round(total / n_files),
                "p95_batch_ms": r["p95_batch_ms"],
                "rows_per_sec_per_view": r["rows_per_sec_per_view"],
                "wall_seconds": r["wall_seconds"],
            }
        )
    under = [p for p in points if p["p95_batch_ms"] <= TRIGGER_INTERVAL_MS]
    knee = max(under, key=lambda p: p["rows_per_batch"]) if under else None
    top = max(points, key=lambda p: p["rows_per_batch"])
    saturated = len(under) < len(points)
    return {
        "probe_dir": probe_dir,
        "trigger_interval_ms": TRIGGER_INTERVAL_MS,
        # False = p95 never exceeded the trigger interval at ANY measured
        # batch size, so the true saturation point lies BEYOND the
        # measured range and the knee below is its measured lower bound
        "saturated_within_measured_range": saturated,
        "points": points,
        "knee": (
            {
                **{k: knee[k] for k in ("rows_per_batch", "p95_batch_ms")},
                "sustainable_rows_per_sec_per_view_at_10s_trigger": round(
                    knee["rows_per_batch"] / (TRIGGER_INTERVAL_MS / 1000), 1
                ),
            }
            if knee
            else "p95 exceeds the trigger interval at every measured batch size"
        ),
        "saturation_rows_per_sec_per_view": top["rows_per_sec_per_view"],
        f"freshness_slo_margin_x_at_{tag}_worst_batch": round(
            FRESHNESS_SLO_MS / max(p["p95_batch_ms"] for p in points), 1
        ),
    }


def _megabatch_saturation(
    spark, root: str, probe_dir: str, *, factors: tuple[int, ...] = (3, 6)
) -> dict:
    """Find the ACTUAL knee (round-8 verdict #4): even 10M-row batches
    measured p95 ≈ 3.7 s — the probe data simply isn't big enough to
    saturate a 32-core batch. Build K-fold replicas of the 100x probe
    events (event_id/user_id shifted per replica so row count AND key
    cardinality scale honestly — the windowed state grows with K, not
    just the input) and replay each as ONE micro-batch until p95
    crosses the 10 s trigger. Replication is a documented synthetic
    scale-up: timestamps keep the 30-day span, so per-window density
    grows K-fold, exactly like a K× busier shop."""
    from streaming_ecom_analytics_spark import catalog as cat

    base = cat.events(spark, probe_dir)
    base_rows = base.count()
    points = []
    for k in factors:
        reps = [
            base.withColumn("event_id", F.col("event_id") + F.lit(i * 10**10))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 10**7))
            for i in range(k)
        ]
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        src = f"{root}/mega_{k}"
        big.coalesce(8).write.mode("overwrite").parquet(src)
        r = _run_replay(spark, root, src, f"mega_{k}", mft=64)
        points.append(
            {
                "replication_factor": k,
                "rows_per_batch": base_rows * k,
                "p95_batch_ms": r["p95_batch_ms"],
                "rows_per_sec_per_view": r["rows_per_sec_per_view"],
                "wall_seconds": r["wall_seconds"],
            }
        )
        shutil.rmtree(src, ignore_errors=True)
        if r["p95_batch_ms"] > TRIGGER_INTERVAL_MS:
            break  # crossed the trigger — the knee is bracketed
    under = [p for p in points if p["p95_batch_ms"] <= TRIGGER_INTERVAL_MS]
    over = [p for p in points if p["p95_batch_ms"] > TRIGGER_INTERVAL_MS]
    saturated = bool(over)
    knee = max(under, key=lambda p: p["rows_per_batch"]) if under else None
    return {
        "probe_dir": probe_dir,
        "trigger_interval_ms": TRIGGER_INTERVAL_MS,
        "protocol": (
            "K-fold id-shifted replicas of the 100x probe events, one "
            "micro-batch each, through the same 3 concurrent views"
        ),
        "saturated_within_measured_range": saturated,
        "points": points,
        "measured_knee": (
            {
                "largest_batch_under_trigger_rows": knee["rows_per_batch"],
                "its_p95_batch_ms": knee["p95_batch_ms"],
                "sustainable_rows_per_sec_per_view_at_10s_trigger": round(
                    knee["rows_per_batch"] / (TRIGGER_INTERVAL_MS / 1000), 1
                ),
                "first_batch_over_trigger_rows": (
                    over[0]["rows_per_batch"] if over else None
                ),
            }
            if knee
            else None
        ),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    probe_dir = os.environ.get(
        "SPARK_GRAFT_STREAM_PROBE_DIR", str(REPO / "scale_probe" / "sf1")
    )
    spark = get_spark(app_name="stream_bench")
    from streaming_ecom_analytics_spark.hostprobe import host_fixture

    host = host_fixture(spark)  # round 10: every perf artifact stamps
    root = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        src1, n1, total = _write_day_files(spark, sf_dir, root, 1)
        src3, n3, _ = _write_day_files(spark, sf_dir, root, 3)

        per_day = _run_replay(spark, root, src1, "per_day", mft=1)
        day_slo = _run_replay(spark, root, src3, "day_slo", mft=1)
        burst = _run_replay(spark, root, src1, "burst", mft=n1)

        doc = {
            "protocol": (
                "file-source replay through the full parse->watermark->"
                "window->complete-mode-materialize path, 3 concurrent "
                "views, Trigger.AvailableNow; per-batch numbers from "
                "StreamingQueryProgress"
            ),
            "sf_dir": sf_dir,
            "host": host,
            "total_rows": total,
            "freshness_slo_ms": FRESHNESS_SLO_MS,
            "day_partition_slo_rows": DAY_SLO_ROWS,
            "per_day_replay": {
                **per_day,
                "n_files": n1,
                "freshness_margin_x": round(
                    FRESHNESS_SLO_MS / per_day["p95_batch_ms"], 1
                ),
            },
            "day_slo_replay": {
                **day_slo,
                "n_files": n3,
                "slo_met": bool(
                    day_slo["n_big_batches"] > 0
                    and day_slo["worst_big_batch_ms"] < FRESHNESS_SLO_MS
                ),
                "freshness_margin_x_on_big_batches": round(
                    FRESHNESS_SLO_MS / day_slo["worst_big_batch_ms"], 1
                )
                if day_slo["worst_big_batch_ms"]
                else None,
            },
            "single_batch_throughput": {
                **burst,
                "note": (
                    "all files in one trigger; rows_per_sec_per_view is "
                    "the amortized pipeline throughput comparable to "
                    "BASELINE.md's single-view round-1 measurement"
                ),
            },
        }
        if probe_dir and os.path.isdir(probe_dir):
            doc["saturation_sweep_10x"] = _saturation_sweep(spark, root, probe_dir)
        probe100 = os.environ.get(
            "SPARK_GRAFT_STREAM_PROBE100_DIR", str(REPO / "scale_probe" / "sf10")
        )
        if probe100 and os.path.isdir(probe100):
            # 10M probe rows at 3/10/30 days per batch = 1M/3.3M/10M
            # rows per micro-batch
            doc["saturation_sweep_100x"] = _saturation_sweep(
                spark, root, probe100, tag="100x", dpfs=(3, 10, 30)
            )
            # ...and if even 10M/batch stays under the trigger,
            # replicate until p95 crosses it — the measured knee
            doc["saturation_megabatch"] = _megabatch_saturation(
                spark, root, probe100, factors=(3, 6, 12)
            )
        json.dump(doc, sys.stdout, indent=1)
        sys.stdout.write("\n")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
