"""Pre-commit gate mirroring the driver's round checks (round-2 verdict #8).

Runs, with exceptions FATAL (non-zero exit):
  1. every registered query end-to-end at sf0.001 (analysis + execution
     smoke — catches the class of regression that killed BENCH_r02);
  2. every oracle-bearing query against DuckDB at sf0.001 with the
     driver's hash-compare semantics (columns sorted by name, rows
     order-insensitive);
  3. a bench smoke (one timed pass, noop sink) so bench.py's timed loop
     is known-runnable before any ledger claim.

Usage: python scripts/preflight.py [--sf-dir /root/testdata/sf0.001]
Exit 0 = safe to record ledger claims; anything else = fix first.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--skip-oracle", action="store_true", help="smoke + bench only (faster)"
    )
    args = ap.parse_args()

    import duckdb

    from streaming_ecom_analytics_spark.caching import release_tracked
    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark.schema import TESTDATA_TABLES
    from streaming_ecom_analytics_spark.session import get_spark

    spark = get_spark(app_name="preflight")
    failures: list[tuple[str, str, str]] = []

    # --- 1. execution smoke: every registered query must run ---
    t0 = time.perf_counter()
    for name, rq in sorted(REGISTRY.items()):
        try:
            rq.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            failures.append((name, "smoke", f"{type(exc).__name__}: {str(exc)[:300]}"))
            print(f"preflight: SMOKE FAIL {name}: {exc}", file=sys.stderr)
        release_tracked()
    print(
        f"preflight: smoke {len(REGISTRY)} queries in "
        f"{time.perf_counter() - t0:.1f}s, {len(failures)} failures"
    )

    # --- 2. oracle parity (driver-compare semantics) ---
    if not args.skip_oracle:
        sys.path.insert(0, str(REPO / "tests"))
        from conftest import assert_frames_match  # noqa: E402

        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )
        n_checked = 0
        for name, rq in sorted(REGISTRY.items()):
            if rq.oracle is None:
                continue
            try:
                spark_pdf = rq.fn(spark, args.sf_dir).toPandas()
                oracle_pdf = con.sql(rq.oracle).df()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                n_checked += 1
            except Exception as exc:
                failures.append(
                    (name, "oracle", f"{type(exc).__name__}: {str(exc)[:300]}")
                )
                print(f"preflight: ORACLE FAIL {name}: {exc}", file=sys.stderr)
            release_tracked()
        print(f"preflight: oracle parity on {n_checked} queries")

    # --- 3. bench smoke: the timed loop shape must survive ---
    # (smoke above already proves each query runs; this asserts bench.py
    # itself imports and its registry wiring is intact)
    import importlib

    bench_mod = importlib.import_module("bench")
    assert hasattr(bench_mod, "main"), "bench.py lost its main()"
    print("preflight: bench.py importable")

    if failures:
        print(f"preflight: {len(failures)} FAILURES:", file=sys.stderr)
        for name, stage, msg in failures:
            print(f"  [{stage}] {name}: {msg}", file=sys.stderr)
        return 1
    print("preflight: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
