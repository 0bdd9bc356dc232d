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

Usage: python scripts/stream_bench.py > STREAMBENCH_r8.json
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_STREAM_PROBE_DIR (default /root/repo/scale_probe/sf1;
     set empty to skip the sweep).
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


def _saturation_sweep(spark, root: str, probe_dir: str) -> dict:
    """Batch-size sweep over the 10x probe events: p95 batch duration
    and per-view throughput as rows/batch grows. The knee = largest
    batch size whose p95 still fits a 10 s trigger interval (beyond it
    a processing-time trigger at that cadence falls behind and queues);
    the largest batch's rows/s is the saturation throughput (batch
    overhead fully amortized)."""
    sweep_root = f"{root}/sweep10x"  # distinct from the sf0.1 sources
    points = []
    for dpf in (1, 3, 10, 30):
        src, n_files, total = _write_day_files(
            spark, probe_dir, sweep_root, days_per_file=dpf
        )
        r = _run_replay(spark, sweep_root, src, f"sweep_{dpf}d", mft=1)
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
        "freshness_slo_margin_x_at_10x_worst_batch": round(
            FRESHNESS_SLO_MS / max(p["p95_batch_ms"] for p in points), 1
        ),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    probe_dir = os.environ.get(
        "SPARK_GRAFT_STREAM_PROBE_DIR", str(REPO / "scale_probe" / "sf1")
    )
    spark = get_spark(app_name="stream_bench")
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
        json.dump(doc, sys.stdout, indent=1)
        sys.stdout.write("\n")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
