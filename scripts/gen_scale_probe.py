"""Generate an sf1-equivalent (10x sf0.1) synthetic dataset for the
empirical scale probe (round-6 verdict #1).

The shipped testdata tops out at sf0.1, so every 100 TB claim in
SCALE.md was design-argued but never *measured* on a size where the
asserted plan shapes dominate. This generator mirrors the driver
testdata's measured distributions (TESTDATA.md tables; profiled with
DuckDB against /root/testdata/sf0.1) at 10x the row counts:

- events:     1,000,000 rows; 15,000 users (events/user held at ~66,
  matching sf0.1's 100k/1,500); 5 uniform event types over 30 days of
  Jan 2024; value ~ Exp(mean 50) rounded to cents (sf0.1: median 35.0,
  mean 49.5 — exponential's 34.7/50); props = '{"k": 0..99}' uniform.
- documents:  50,000 rows; the same 30-word vocabulary and 10-100
  uniform word lengths; 5 langs / 20 sources at sf0.1's observed
  proportions; 5% planted near-dups (another doc's text + " dup",
  identical to the driver's plant — verified: every sf0.1 'dup' doc
  strips back to an existing doc's exact text).
- embeddings: 20,000 rows; 64-dim unit vectors with a weak
  label-centroid pull (alpha=0.5/||g|| => mean intra-label cosine
  ~0.065, matching sf0.1's measured 0.063-0.073); 10 labels.

Deterministic (numpy PCG64 seed 7). Pure pyarrow writes — no Spark.
Output dir defaults to /root/repo/scale_probe/sf1 (testdata is
read-only). ~25 MB total; regenerate at will.

Usage: python scripts/gen_scale_probe.py [out_dir] [--scale N]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANG_WEIGHTS = {"en": 0.412, "zh": 0.150, "es": 0.149, "fr": 0.148, "de": 0.141}
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = start + rng.integers(0, span_us, n).astype("timedelta64[us]")
    ts = np.sort(ts)  # event_id ordered by time, like the driver data
    value = np.round(rng.exponential(50.0, n), 2)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.integers(0, 5, n)]
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]
            ),
        }
    )


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    langs = list(LANG_WEIGHTS)
    lang_p = np.array(list(LANG_WEIGHTS.values()))
    lang_p /= lang_p.sum()
    n_dup = n // 20  # 5% planted near-dups, like sf0.1's 250/5000
    n_base = n - n_dup
    base_texts = [
        " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), L))
        for L in rng.integers(10, 101, n_base)
    ]
    dup_sources = rng.integers(0, n_base, n_dup)
    texts = base_texts + [base_texts[s] + " dup" for s in dup_sources]
    order = rng.permutation(n)  # dups land at random doc_ids
    texts = [texts[i] for i in order]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i] for i in rng.choice(5, n, p=lang_p)]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    labels = rng.integers(0, 10, n).astype(np.int32)
    centroids = rng.normal(size=(10, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    g = rng.normal(size=(n, dim)) + 0.5 * centroids[labels]
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    flat = pa.array(g.astype(np.float32).ravel(), pa.float32())
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim), pa.int32()), flat
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, pa.int32()),
        }
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/root/repo/scale_probe/sf1"
    scale = 10
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(7)
    spec = {
        "events": (gen_events, {"n": 100_000 * scale, "n_users": 1_500 * scale}),
        "documents": (gen_documents, {"n": 5_000 * scale}),
        "embeddings": (gen_embeddings, {"n": 2_000 * scale}),
    }
    manifest = {"scale_vs_sf0.1": scale, "seed": 7, "tables": {}}
    for name, (fn, kw) in spec.items():
        t = fn(rng, **kw)
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(t, path)
        manifest["tables"][name] = {
            "rows": t.num_rows,
            "bytes": os.path.getsize(path),
        }
        print(f"{name}: {t.num_rows} rows -> {path}")
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
