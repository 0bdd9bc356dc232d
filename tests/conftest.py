"""Shared fixtures: one SparkSession per test run, a DuckDB oracle
connection with the testdata tables registered as views, and the
order-insensitive compare that mirrors the driver's correctness gate."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from streaming_ecom_analytics_spark.schema import TESTDATA_TABLES  # noqa: E402
from streaming_ecom_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Operators register persisted intermediates (see caching.py);
    release them after every test so the shared session never
    accumulates cached RDDs across the suite."""
    yield
    from streaming_ecom_analytics_spark.caching import (
        release_shared,
        release_tracked,
    )

    release_tracked()
    # family-shared subtrees (round 11) survive release_tracked by
    # design; between TESTS they must go too, or a materialized shared
    # frame from one test rewrites later tests' plan shapes
    # (test_plans assertions read subtree internals)
    release_shared()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive
    canonical form, as the driver's value-hash does."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v) if v is not None else None)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query"):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            exact = (av == bv) | both_nan
            if not exact.all():
                bad = ~exact
                diffs = np.abs(av[bad] - bv[bad])
                raise AssertionError(
                    f"{name}: column {c} differs on {bad.sum()} rows; "
                    f"max abs diff {diffs.max():.3e}; "
                    f"sample spark={av[bad][:5]} oracle={bv[bad][:5]}"
                )
        else:
            sa = pd.Series(av).astype(str)
            sb = pd.Series(bv).astype(str)
            mism = (sa != sb).to_numpy()
            assert not mism.any(), (
                f"{name}: column {c} differs on {mism.sum()} rows; "
                f"sample spark={sa[mism][:5].tolist()} oracle={sb[mism][:5].tolist()}"
            )
