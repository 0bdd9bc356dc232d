"""Round-11 additions: bench-artifact hygiene (mixed-host refusal,
non-clobbering output paths), the IO-aware host stamp, and the
round-10 verdict fix-ups (de-vacuated anti-join twins, SemDeDup
cosine keep rule, gram-contract raw-flops compare)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def _bench_artifact(tmp_path, name, gflops, jvm, io, q=None):
    art = {
        "metric": "total_query_wall_seconds",
        "value": 100.0,
        "queries": q or {"q1": 1.0, "q2": 2.0},
        "host": {
            "host_gflops": gflops,
            "host_jvm_mrows_s": jvm,
            "host_io_mrows_s": io,
        },
    }
    p = tmp_path / name
    p.write_text(json.dumps(art))
    return str(p)


class TestHostNormalizeMixedHost:
    def test_refuses_mixed_host(self, tmp_path, capsys):
        import host_normalize

        a = _bench_artifact(tmp_path, "a.json", 800.0, 300.0, 200.0)
        b = _bench_artifact(tmp_path, "b.json", 300.0, 290.0, 190.0)  # 2.7x BLAS
        rc = host_normalize.main([a, b])
        out = capsys.readouterr().out
        assert rc == 2
        assert "MIXED-HOST" in out

    def test_mixed_ok_flag_acknowledges(self, tmp_path):
        import host_normalize

        a = _bench_artifact(tmp_path, "a.json", 800.0, 300.0, 200.0)
        b = _bench_artifact(tmp_path, "b.json", 300.0, 290.0, 190.0)
        assert host_normalize.main(["--mixed-ok", a, b]) == 0

    def test_same_host_passes(self, tmp_path, capsys):
        import host_normalize

        a = _bench_artifact(tmp_path, "a.json", 800.0, 300.0, 200.0)
        b = _bench_artifact(tmp_path, "b.json", 790.0, 310.0, 210.0)
        assert host_normalize.main([a, b]) == 0
        out = capsys.readouterr().out
        assert "IO stamp" in out  # round-11 proxy participates

    def test_io_stamp_disparity_alone_triggers(self, tmp_path):
        # the r10 blind spot: healthy BLAS/JVM, degraded IO
        import host_normalize

        a = _bench_artifact(tmp_path, "a.json", 800.0, 300.0, 200.0)
        b = _bench_artifact(tmp_path, "b.json", 800.0, 300.0, 50.0)
        assert host_normalize.main([a, b]) == 2

    def test_pre_r11_artifacts_lack_io_stamp(self, tmp_path):
        import host_normalize

        a = _bench_artifact(tmp_path, "a.json", 800.0, 300.0, 200.0)
        art = json.loads(Path(a).read_text())
        del art["host"]["host_io_mrows_s"]
        b = tmp_path / "b.json"
        b.write_text(json.dumps(art))
        assert host_normalize.main([a, str(b)]) == 0  # IO proxy skipped


class TestHostProbeIO:
    def test_io_scan_rate_positive(self, spark):
        from streaming_ecom_analytics_spark.hostprobe import io_scan_mrows_s

        rate = io_scan_mrows_s(spark, reps=1)
        assert rate > 0

    def test_quick_stamp_shape(self, spark):
        from streaming_ecom_analytics_spark.hostprobe import quick_stamp

        s = quick_stamp(spark)
        assert s["gemm_gflops"] > 0
        assert s["io_mrows_s"] > 0

    def test_io_probe_missing_path_is_nan(self, spark):
        import math

        from streaming_ecom_analytics_spark.hostprobe import io_scan_mrows_s

        assert math.isnan(io_scan_mrows_s(spark, path="/nonexistent.parquet"))


class TestBenchOutputPath:
    def test_default_full_out_is_not_a_committed_artifact(self):
        src = (REPO / "bench.py").read_text()
        assert 'REPO / "BENCH_FULL_LATEST.json" if mode == "full"' in src
        # no default write path may target the committed per-round files
        assert 'default_out = (\n        REPO / "BENCH_LOCAL_r' not in src
