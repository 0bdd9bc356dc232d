"""Scratch experiment (round 9): pick the multi-assignment scaling policy
that holds the IVF similarity-join pair recall >= 0.80 at the 10x probe
decade (RECALL_r8 measured 0.7051 with fixed m=4).

Pure numpy mirror of _near_dup_candidates_ivf: same _lloyd_np, same seed
stream, same id-sorted training prefix, same top-m assignment — so the
numbers transfer 1:1 to the Spark path. Not part of the engine; delete or
keep as documentation of the tuning run.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from streaming_ecom_analytics_spark.functions.similarity import _lloyd_np  # noqa: E402

THRESHOLD = 0.45
SEED = 42
TRAIN_ROWS = 65_536
OCC = 256


def load(d: str):
    t = pq.read_table(f"{d}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def exact_pairs(mat):
    n = mat.shape[0]
    v = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    out = set()
    B = 4096
    for i0 in range(0, n, B):
        sims = v[i0 : i0 + B] @ v.T
        ia, ib = np.nonzero(sims >= THRESHOLD)
        ia += i0
        keep = ia < ib
        out.update(zip(ia[keep].tolist(), ib[keep].tolist()))
    return out


def assign_topm(v, cent, m):
    dots = v @ cent.T
    m = min(m, cent.shape[0])
    return np.argpartition(-dots, m - 1, axis=1)[:, :m], dots


def pairs_from_lists(lists, v):
    """Candidate pairs sharing a list, then exact-verified (>= thr)."""
    n, m = lists.shape
    got = set()
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in range(n):
        for l in set(lists[i].tolist()):
            buckets[l].append(i)
    for members in buckets.values():
        idx = np.asarray(members)
        sims = v[idx] @ v[idx].T
        ia, ib = np.nonzero(sims >= THRESHOLD - 1e-6)
        lo, hi = idx[ia], idx[ib]
        keep = lo < hi
        got.update(zip(lo[keep].tolist(), hi[keep].tolist()))
    return got


def run(label, d):
    ids, mat = load(d)
    n = len(ids)
    v = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    t0 = time.time()
    exact = exact_pairs(mat)
    print(f"[{label}] n={n} exact_pairs={len(exact)} ({time.time()-t0:.1f}s)")

    train = v[:TRAIN_ROWS]
    n_lists = max(4, -(-n // OCC))
    rng = np.random.default_rng(SEED)
    k_eff, cent = _lloyd_np(train, n_lists, rng)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    print(f"  n_lists={n_lists} k_eff={k_eff} log2={np.log2(max(n_lists,2)):.2f}")

    dots = v @ cent.T
    order = np.argsort(-dots, axis=1)
    for m in (4, 6, 8, 10, 12, 16, 20):
        if m > k_eff:
            continue
        lists = order[:, :m]
        got = pairs_from_lists(lists, v)
        rec = len(got & exact) / max(1, len(exact))
        # total assignment rows and Gram cost proxy (sum occ^2)
        occs = np.bincount(lists.ravel(), minlength=k_eff).astype(np.float64)
        print(
            f"  m={m:3d} recall={rec:.4f} assign_rows={n*m} "
            f"sum_occ2={occs @ occs/1e6:.1f}M max_occ={int(occs.max())}"
        )
    # adaptive-delta variant: assign to all lists with dot >= best - delta
    best = dots.max(axis=1, keepdims=True)
    for delta in (0.05, 0.10, 0.15, 0.20):
        sel = dots >= best - delta
        rows = [np.nonzero(sel[i])[0] for i in range(n)]
        counts = np.array([len(r) for r in rows])
        # cap at 16 by top dots
        lists = np.full((n, 16), -1, dtype=np.int64)
        for i, r in enumerate(rows):
            if len(r) > 16:
                r = r[np.argsort(-dots[i, r])[:16]]
            lists[i, : len(r)] = r
        got = set()
        from collections import defaultdict

        buckets = defaultdict(list)
        for i in range(n):
            for l in lists[i]:
                if l >= 0:
                    buckets[int(l)].append(i)
        for members in buckets.values():
            idx = np.asarray(members)
            sims = v[idx] @ v[idx].T
            ia, ib = np.nonzero(sims >= THRESHOLD - 1e-6)
            lo, hi = idx[ia], idx[ib]
            keep = lo < hi
            got.update(zip(lo[keep].tolist(), hi[keep].tolist()))
        rec = len(got & exact) / max(1, len(exact))
        print(
            f"  delta={delta:.2f} recall={rec:.4f} mean_assign={counts.mean():.2f} "
            f"p99_assign={int(np.percentile(counts,99))}"
        )


if __name__ == "__main__":
    run("sf0.1", "/root/testdata/sf0.1")
    run("sf1_10x", str(REPO / "scale_probe" / "sf1"))
