"""Host-throughput fixture — turns "the host got slower" from a story
into a measured divisor (round-9 verdict #2 / round-10 task #1).

Round 9's driver bench moved 0.909 -> 1.383 s/query with ZERO plan-hash
drift and bit-identical shuffle/strategy telemetry: every signal said
"host variance", but the adjudication was an inference from breadth
(80/226 queries >1.5x, BLAS-heavy ones 2-6x, JVM-bound ones flat), not
a measurement. This module pins two microbenchmarks that proxy the two
substrates every registered query runs on:

- ``host_gflops`` — a pinned-size float64 GEMM (numpy -> the same BLAS
  that scores every Gram/top-k kernel in functions/similarity.py).
  flops = 2·n³ per multiply; best of ``reps`` timed repeats after one
  untimed warm call (first call pays thread-pool spin-up).
- ``host_jvm_mrows_s`` — a pinned Spark whole-stage-codegen scan:
  ``range(n) -> xxhash64/arith expression chain -> 2 scalar aggs``,
  zero shuffle beyond the final single-row reduce, zero Python in the
  loop — the substrate of every codegen'd projection/aggregate in the
  suite. Best of ``reps`` after ``JVM_WARM`` untimed runs (JIT).

Every bench/probe artifact stamps this fixture (bench.py start;
scale_probe.py start AND end, because a multi-hour probe can drift
mid-session). Two artifacts then decompose as

    engine_factor = (t_B / t_A) / (host_factor)
    host_factor   = blend of fixture ratios, picked per query family
                    (BLAS-heavy -> gflops ratio, JVM-bound -> jvm ratio)

so a round-over-round wall-time shift with flat fixtures is an engine
regression, and a shift that tracks the fixtures is the host — one
line, no telemetry archaeology. BASELINE.md states the bench gate in
this normalized form from round 10 on.

Determinism: sizes are pinned constants; the GEMM operands come from a
seeded Generator so the arithmetic (and any denormal/NaN pathology) is
identical across sessions. The fixture measures throughput, never
results — nothing here feeds a registered query.
"""

from __future__ import annotations

import time

GEMM_N = 1536  # 2·1536³ ≈ 7.2 GFLOP per multiply — ~0.1-1 s on one socket
GEMM_REPS = 5
JVM_ROWS = 100_000_000  # at 20M the run was ~0.13 s — task-scheduling
# floor, not compute (measured ±30% fixture noise); 100M puts the
# codegen loop at ~0.5-1 s/run so the scan rate is the signal
JVM_REPS = 5
JVM_WARM = 2  # one compile pass is not enough: C2 tiers up during the
# second run too (measured 65 vs 105 Mrows/s first-vs-warm fixture)


def blas_gflops(n: int = GEMM_N, reps: int = GEMM_REPS) -> float:
    """Best-of-``reps`` float64 GEMM throughput in GFLOP/s at pinned
    size n. Best-of, not median: warmup residue and scheduler
    interference only ever REDUCE throughput, so the fastest repeat is
    the least-contaminated estimate of host capability (the standard
    microbenchmark convention) — median still drifted ~35% across a
    fresh JVM's first few fixture calls."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    a @ b  # untimed: BLAS thread-pool spin-up
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        a @ b
        times.append(time.perf_counter() - t0)
    return round(2.0 * n**3 / min(times) / 1e9, 2)


def jvm_mrows_s(spark, rows: int = JVM_ROWS, reps: int = JVM_REPS) -> float:
    """Best-of-``reps`` whole-stage-codegen scan rate in Mrows/s on a
    pinned range -> hash/arith -> 2-agg plan (no shuffle, no Python).
    Best-of for the same reason as ``blas_gflops`` — C2 tier-up and
    task-scheduling jitter only lower the rate."""
    from pyspark.sql import functions as F

    def run() -> None:
        df = spark.range(rows).select(
            (F.xxhash64("id") % F.lit(1000003)).alias("h"),
            (F.col("id") * F.lit(2654435761) % F.lit(97)).alias("m"),
        )
        df.agg(
            F.sum("h").alias("s"), F.sum(F.col("m") * F.col("h")).alias("p")
        ).collect()  # 1 row — bounded by construction

    for _ in range(JVM_WARM):  # untimed: codegen compile + C2 tier-up
        run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return round(rows / min(times) / 1e6, 1)


IO_SCAN_PATH = "/root/testdata/sf0.1/lineitem.parquet"  # pinned scan
IO_REPS = 3


def io_scan_mrows_s(spark, path: str = IO_SCAN_PATH, reps: int = IO_REPS) -> float:
    """Best-of-``reps`` parquet scan rate in Mrows/s over a pinned file:
    full-table read of two numeric columns -> 2 scalar aggs. Unlike
    ``jvm_mrows_s`` (spark.range, no IO), this path goes through the
    parquet reader + page cache + filesystem, the substrate the r10
    driver bench showed can degrade while GEMM/JVM stamps stay healthy
    (410.9 s at 693 GFLOP/s vs 307.9 s at 362 — the blind spot this
    probe closes, round-10 verdict task #1a). Page-cache state is part
    of what we're measuring, so no cache-drop: a contended cache shows
    up as a lower rate, which is exactly the signal."""
    import os

    from pyspark.sql import functions as F

    if not os.path.exists(path):
        return float("nan")

    def run() -> int:
        df = spark.read.parquet(path).select("l_quantity", "l_extendedprice")
        row = df.agg(
            F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
        ).collect()[0]
        return row["n"]

    n_rows = run()  # untimed: reader init + first page-cache touch
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return round(n_rows / min(times) / 1e6, 1)


def quick_stamp(spark, gemm_n: int = 1024, gemm_reps: int = 2) -> dict:
    """Cheap (~1-2 s) mid-run stamp for interleaving DURING a bench:
    small-GEMM GFLOP/s + pinned parquet-scan Mrows/s. The full fixture
    stamps the ends; this catches contention that arrives mid-run
    (round-10 verdict task #1a: the driver bench was slow at healthy
    end-stamps — contention during, not at, stamp time)."""
    return {
        "gemm_gflops": blas_gflops(n=gemm_n, reps=gemm_reps),
        "io_mrows_s": io_scan_mrows_s(spark, reps=2),
    }


def host_fixture(spark=None) -> dict:
    """The stamp every bench/probe artifact carries: pinned-size BLAS
    and JVM-codegen throughput (JVM omitted when no session is up)."""
    out: dict = {
        "host_gflops": blas_gflops(),
        "gemm": {"n": GEMM_N, "reps": GEMM_REPS, "dtype": "float64"},
    }
    if spark is not None:
        out["host_jvm_mrows_s"] = jvm_mrows_s(spark)
        out["jvm"] = {"rows": JVM_ROWS, "reps": JVM_REPS, "warm": JVM_WARM}
        out["host_io_mrows_s"] = io_scan_mrows_s(spark)
        out["io"] = {"path": IO_SCAN_PATH, "reps": IO_REPS}
    return out
