"""Property-based tests (hypothesis): invariants that must hold for
arbitrary inputs, not just the crafted fixtures.

Strategy sizes are kept small — each example builds a Spark DataFrame,
so the value is in input *shape* diversity (nulls, ties, duplicates,
empty partitions), not volume.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_ecom_analytics_spark.functions import dedup
from streaming_ecom_analytics_spark.operators.asof import asof_join
from streaming_ecom_analytics_spark.operators.sampler import top_n_per_key

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_ts = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 1, 7)
)
_events = st.lists(
    st.tuples(
        st.integers(0, 999_999),           # event_id
        _ts,                               # ts
        st.integers(0, 5),                 # user_id
        st.sampled_from(["view", "cart", "purchase"]),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@given(rows=_events, n=st.integers(1, 5))
@settings(**_SETTINGS)
def test_sampler_bound_and_subset(spark, rows, n):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = top_n_per_key(
        df, key_cols=["user_id"], order_cols=["ts", "event_id"], n=n
    ).collect()
    # never more than n rows per key, and every output row is an input row
    per_key: dict[int, int] = {}
    inputs = {tuple(r) for r in rows}
    for r in out:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
        assert (r.event_id, r.ts, r.user_id, r.event_type, r.value) in inputs
    assert all(c <= n for c in per_key.values())


@given(rows=_events)
@settings(**_SETTINGS)
def test_asof_result_never_in_future(spark, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    purchases = df.filter("event_type = 'purchase'").select("user_id", "ts", "value")
    out = asof_join(df, purchases, on="user_id", value_cols=("value",)).collect()
    assert len(out) == len(rows)  # left join preserves cardinality
    for r in out:
        if r.asof_ts is not None:
            assert r.asof_ts <= r.ts  # never matches a future right row


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=60), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_jaccard_bounds_and_exact_dups(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(df, k=2, threshold=0.0).collect()
    for p in pairs:
        assert 0.0 <= p.jaccard <= 1.0 and p.doc_a < p.doc_b
    # identical texts must appear with jaccard 1.0
    seen = {}
    for i, t in rows:
        key = " ".join(t.split())
        if key and key in seen:
            a, b = min(seen[key], i), max(seen[key], i)
            match = [p for p in pairs if (p.doc_a, p.doc_b) == (a, b)]
            if match:
                assert match[0].jaccard == 1.0
        elif key:
            seen[key] = i


_points = st.lists(
    st.tuples(st.integers(0, 99), st.integers(0, 3), _ts),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)
_intervals = st.lists(
    st.tuples(st.integers(0, 999), st.integers(0, 3), _ts, st.integers(1, 5000)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@given(points=_points, ivs=_intervals, bucket=st.sampled_from([60, 3600, 86400]))
@settings(**_SETTINGS)
def test_interval_join_equals_bruteforce(spark, points, ivs, bucket):
    """Bucketed rewrite == naive point-in-interval containment, for
    any bucket width (width only affects the plan, never the rows)."""
    from streaming_ecom_analytics_spark.operators.interval import interval_join

    iv_rows = [
        (iid, k, start, start + dt.timedelta(seconds=dur)) for iid, k, start, dur in ivs
    ]
    p = spark.createDataFrame(points, "pid long, k long, ts timestamp")
    i = spark.createDataFrame(iv_rows, "iid long, k long, start timestamp, end timestamp")
    got = {
        (r.pid, r.iid)
        for r in interval_join(p, i, on="k", ts_col="ts", bucket_seconds=bucket).collect()
    }
    expected = {
        (pid, iid)
        for pid, pk, ts in points
        for iid, ik, start, end in iv_rows
        if pk == ik and start <= ts < end
    }
    assert got == expected


_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=40
)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_property(spark, edges):
    """CC label = min reachable node, for arbitrary multigraphs with
    self-loops and duplicate/reversed edges."""
    clean = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in clean for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in clean:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in nodes}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in dedup.connected_components(df).collect()}
    assert got == expected


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=10
    ),
    budget=st.integers(1, 20),
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, texts, budget):
    """Bins are dense from 0, bin totals respect the budget except for
    single oversize docs, and every doc appears exactly once."""
    from streaming_ecom_analytics_spark.functions import curate

    rows = [(i, "g", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curate.pack_sequences(df, budget=budget).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(texts)))
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r.n_tokens)
    assert sorted(by_bin) == list(range(len(by_bin)))  # dense bin ids
    for toks in by_bin.values():
        assert sum(toks) <= budget or len(toks) == 1  # oversize only alone


@given(
    sigs=st.lists(
        st.tuples(st.integers(0, 99), st.integers(-(2**63), 2**63 - 1)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    max_h=st.integers(0, 7),
)
@settings(**_SETTINGS)
def test_hamming_pairs_equals_bruteforce_within_pigeonhole(spark, sigs, max_h):
    """For max_hamming <= n_chunks-1 the chunk-blocked join is EXACT:
    it must produce precisely the brute-force pair set."""
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.hamming_pairs(
            df, id_col="id", sig_col="sig", max_hamming=max_h
        ).collect()
    }
    want = set()
    for (ia, sa) in sigs:
        for (ib, sb) in sigs:
            if ia < ib:
                h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                if h <= max_h:
                    want.add((ia, ib, h))
    assert got == want


@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=60),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_doc_containment_bounds(spark, docs):
    """Containment scores are in (0, 1] and symmetric in structure:
    shared <= min(|FP(a)|, |FP(b)|) implies both scores <= 1."""
    from streaming_ecom_analytics_spark.functions import text as textops

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = textops.doc_containment(df, min_shared=1).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert 0 < r.containment_a <= 1.0 + 1e-9
        assert 0 < r.containment_b <= 1.0 + 1e-9
        assert r.shared >= 1
    # identical non-empty docs must surface with full containment
    dup = spark.createDataFrame(
        [(0, "x y z w v u t s"), (1, "x y z w v u t s")], "doc_id long, text string"
    )
    rows = textops.doc_containment(dup, min_shared=1).collect()
    assert len(rows) == 1 and rows[0].containment_a == 1.0 and rows[0].containment_b == 1.0


@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(1, 180)),
        min_size=1,
        max_size=20,
    ),
    bucket=st.sampled_from([30, 60, 300]),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_equals_bruteforce(spark, ivs, bucket):
    """Bucketed interval-overlap join == naive half-open overlap
    self-join, each pair exactly once, for arbitrary intervals and
    bucket widths (incl. intervals spanning many buckets and adjacent
    intervals that must NOT match)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from streaming_ecom_analytics_spark.operators.interval import (
        interval_overlap_join,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for i, (k, s, d) in enumerate(ivs)
    ]
    df = spark.createDataFrame(rows, "iid long, k long, start timestamp, end timestamp")
    left = df.select("k", F.col("iid").alias("ia"), "start", "end")
    right = df.select(
        "k",
        F.col("iid").alias("ib"),
        F.col("start").alias("r_start"),
        F.col("end").alias("r_end"),
    )
    got = sorted(
        (r.ia, r.ib)
        for r in interval_overlap_join(
            left, right, on="k", bucket_seconds=bucket
        )
        .filter(F.col("ia") < F.col("ib"))
        .collect()
    )
    want = sorted(
        (a[0], b[0])
        for a in enumerate(ivs)
        for b in enumerate(ivs)
        if a[0] < b[0]
        and a[1][0] == b[1][0]
        and a[1][1] < b[1][1] + b[1][2]
        and b[1][1] < a[1][1] + a[1][2]
    )
    assert got == want


# ---------------------------------------------------------------------------
# skyline_2d vs brute force
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_skyline_equals_bruteforce(spark, pts):
    from streaming_ecom_analytics_spark.operators.analytics import skyline_2d

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        r.id for r in skyline_2d(df, "x", "y", out_cols=["id"]).collect()
    )
    want = sorted(
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# linear_attribution: penny conservation for arbitrary touch layouts
# ---------------------------------------------------------------------------


@given(
    n_touches=st.integers(1, 7),
    cents=st.integers(1, 9999),
)
@settings(**_SETTINGS)
def test_attribution_conserves_cents(spark, n_touches, cents):
    from streaming_ecom_analytics_spark.operators.analytics import (
        linear_attribution,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, "u", "click", None, base + dt.timedelta(hours=i))
        for i in range(n_touches)
    ] + [(99, "u", "purchase", cents / 100.0, base + dt.timedelta(days=1))]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string,"
        " value double, ts timestamp",
    )
    out = linear_attribution(ev).collect()
    total = round(sum(r.attributed_revenue for r in out), 2)
    assert total == cents / 100.0 or total == round(cents / 100.0, 2)
    assert sum(r.n_touches for r in out) == n_touches


@given(
    old_rows=st.lists(
        st.tuples(st.integers(0, 20), st.one_of(st.none(), st.text(max_size=4))),
        max_size=15,
        unique_by=lambda r: r[0],
    ),
    new_rows=st.lists(
        st.tuples(st.integers(0, 20), st.one_of(st.none(), st.text(max_size=4))),
        max_size=15,
        unique_by=lambda r: r[0],
    ),
)
@settings(**_SETTINGS)
def test_snapshot_diff_equals_bruteforce(spark, old_rows, new_rows):
    """snapshot_diff must classify EXACTLY the keys whose rows differ
    between two arbitrary snapshots — including NULLs, empty strings,
    and any characters (the struct-JSON hash may never alias)."""
    from streaming_ecom_analytics_spark.operators.cdc import snapshot_diff

    schema = "k long, v string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, key_cols=["k"]).collect()
    }
    o, n = dict(old_rows), dict(new_rows)
    want = {}
    for k in o.keys() | n.keys():
        if k not in o:
            want[k] = "added"
        elif k not in n:
            want[k] = "removed"
        elif o[k] != n[k]:
            want[k] = "changed"
    assert got == want


@given(ids=st.lists(st.integers(-(10**9), 10**9), max_size=25, unique=True))
@settings(**_SETTINGS)
def test_split_assignment_independent_of_corpus(spark, ids):
    """The md5 split is a pure function of the id: restricting the
    corpus to any subset never changes an id's assignment (the
    stability property leakage audits depend on), and bucket stays in
    [0, 100) with split consistent with its bucket."""
    from streaming_ecom_analytics_spark.functions.curate import assign_splits

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    full = {r.doc_id: (r.bucket, r.split) for r in assign_splits(df).collect()}
    half_ids = ids[: len(ids) // 2]
    half = spark.createDataFrame([(i,) for i in half_ids], "doc_id long")
    sub = {r.doc_id: (r.bucket, r.split) for r in assign_splits(half).collect()}
    for i in half_ids:
        assert sub[i] == full[i]
    for b, s in full.values():
        assert 0 <= b < 100
        assert s == ("val" if b < 10 else "test" if b < 20 else "train")


@given(
    revs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 10**6)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_pareto_cohort_invariants(spark, revs):
    """For arbitrary per-order revenues: the 80% cohort (1) is minimal
    — the cohort WITHOUT its last (smallest) member covers < 80%; (2)
    covers ≥ 80% of total revenue; (3) matches a brute-force greedy
    count. Exercises the registered query's exact-cents inequality on
    shapes the testdata never produces (ties, single customer, heavy
    skew)."""
    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark import catalog as cat

    rows = [
        (i, k, float(cents) / 100.0, "1996-01-02", "O", 0, "c")
        for i, (k, cents) in enumerate(revs)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate string, o_orderstatus string, o_shippriority long, "
        "o_comment string",
    )
    orig = cat.load_table
    try:
        cat.load_table = lambda spark, name, sf_dir: df
        got = REGISTRY["revenue_pareto"].fn(spark, "unused").collect()[0]
    finally:
        cat.load_table = orig

    per = {}
    for k, cents in revs:
        per[k] = per.get(k, 0) + cents
    total = sum(per.values())
    ordered = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, n80 = 0, 0
    for _, c in ordered:
        if 5 * cum >= 4 * total:
            break
        cum += c
        n80 += 1
    assert got.n_customers == len(per)
    assert got.n_customers_80pct == n80
    assert got.top1_share_ppm == ordered[0][1] * 1000000 // total
    covered = sum(c for _, c in ordered[:n80])
    assert 5 * covered >= 4 * total  # cohort really covers 80%


@given(rows=_events)
@settings(**_SETTINGS)
def test_transition_matrix_rows_normalize(spark, rows):
    """For arbitrary event streams: per-from-type probabilities are
    floored ppm that sum to within |row| of 10⁶, transition counts
    reproduce a brute-force per-user lead, and every probability is
    positive."""
    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark import catalog as cat

    df = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for e, t, u, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = cat.events
    try:
        cat.events = lambda spark, sf_dir: df
        out = REGISTRY["event_transition_matrix"].fn(spark, "unused").collect()
    finally:
        cat.events = orig

    by_user = {}
    for e, t, u, ty, v in rows:
        by_user.setdefault(u, []).append((t, e, ty))
    # recompute transitions brute-force
    want = {}
    for seq in by_user.values():
        seq.sort()
        for (t1, e1, a), (t2, e2, b) in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.from_type, r.to_type): r.n_transitions for r in out}
    assert got == want
    from_totals = {}
    for (a, _), n in want.items():
        from_totals[a] = from_totals.get(a, 0) + n
    by_from = {}
    for r in out:
        assert r.p_ppm == r.n_transitions * 1000000 // from_totals[r.from_type]
        by_from.setdefault(r.from_type, []).append(r.p_ppm)
    for a, ps in by_from.items():
        assert all(p > 0 for p in ps)
        assert 1000000 - len(ps) <= sum(ps) <= 1000000


@given(
    texts=st.lists(
        st.text(alphabet="abc x", min_size=1, max_size=30), min_size=1, max_size=10
    )
)
@settings(**_SETTINGS)
def test_char_entropy_bounds(spark, texts):
    """For arbitrary docs: 0 ≤ entropy ≤ log2(distinct chars), single-
    character docs score exactly 0, and the floored-micro sum never
    exceeds the true entropy (floor bias is strictly downward)."""
    import math

    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark import catalog as cat

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = cat.documents
    try:
        cat.documents = lambda spark, sf_dir: df
        out = {r.doc_id: r for r in REGISTRY["doc_char_entropy"].fn(spark, "x").collect()}
    finally:
        cat.documents = orig
    for i, t in enumerate(texts):
        if not t:
            continue
        r = out[i]
        assert r.n_chars == len(t)
        assert r.n_distinct_chars == len(set(t))
        h = r.entropy_bits_micros / 1e6
        # true entropy
        from collections import Counter
        cnt = Counter(t)
        true_h = -sum(
            (n / len(t)) * math.log2(n / len(t)) for n in cnt.values()
        )
        assert -1e-6 <= h <= true_h + 1e-9  # floor bias downward only
        assert h <= math.log2(max(len(set(t)), 2)) + 1e-9
        if len(set(t)) == 1:
            assert r.entropy_bits_micros == 0


@given(rows=_events)
@settings(**_SETTINGS)
def test_retention_curve_equals_bruteforce(spark, rows):
    """Day-N retention vs a brute-force recomputation on arbitrary
    event streams (duplicate days, single-user corpora, gaps)."""
    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark import catalog as cat

    df = spark.createDataFrame(
        [(e, t, u, ty, v, "{}") for e, t, u, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = cat.events
    try:
        cat.events = lambda spark, sf_dir: df
        out = {
            r.day_n: (r.n_retained, r.cohort_size, r.retention_ppm)
            for r in REGISTRY["retention_day_n"].fn(spark, "x").collect()
        }
    finally:
        cat.events = orig

    days = {}
    for e, t, u, ty, v in rows:
        days.setdefault(u, set()).add(t.date())
    cohort = len(days)
    want = {}
    for u, ds in days.items():
        first = min(ds)
        for d in ds:
            n = (d - first).days
            if 0 <= n <= 7:
                want.setdefault(n, set()).add(u)
    for n, users in want.items():
        assert out[n] == (len(users), cohort, len(users) * 1000000 // cohort)
    assert set(out) == set(want)


@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 8)),  # (orderkey, partkey)
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_item_jaccard_equals_bruteforce(spark, baskets):
    """Co-purchase Jaccard vs brute force over arbitrary baskets
    (duplicate lines must not inflate intersections — the DISTINCT
    projection is load-bearing)."""
    from streaming_ecom_analytics_spark.plans import REGISTRY
    from streaming_ecom_analytics_spark import catalog as cat

    rows = [
        (o, p, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-01-02")
        for i, (o, p) in enumerate(baskets)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    )
    orig = cat.load_table
    try:
        cat.load_table = lambda spark, name, sf_dir: df
        got = {
            (r.pa, r.pb): (r.n_common, r.jaccard_micros)
            for r in REGISTRY["item_jaccard_topk"].fn(spark, "x").collect()
        }
    finally:
        cat.load_table = orig

    orders_by_part = {}
    for o, p in set(baskets):
        orders_by_part.setdefault(p, set()).add(o)
    want = {}
    parts = sorted(orders_by_part)
    for ai, pa in enumerate(parts):
        for pb in parts[ai + 1 :]:
            inter = len(orders_by_part[pa] & orders_by_part[pb])
            if inter:
                union = len(orders_by_part[pa] | orders_by_part[pb])
                want[(pa, pb)] = (inter, inter * 1000000 // union)
    top = dict(
        sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:25]
    )
    assert got == top


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 30)),  # (user, item)
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_negative_samples_invariants(spark, pairs, n_neg):
    """For arbitrary interaction sets: negatives are never positives,
    at most n_neg per user, only catalog items are drawn, ranks are
    1..k contiguous, and the draw is rerun-stable."""
    from streaming_ecom_analytics_spark.operators import analytics

    df = spark.createDataFrame(
        [(f"u{u}", f"i{i}") for u, i in pairs], "user_id string, item string"
    )
    out = analytics.negative_samples(df, n_neg=n_neg).collect()
    pos = {(f"u{u}", f"i{i}") for u, i in pairs}
    catalog_items = {f"i{i}" for _, i in pairs}
    per_user: dict = {}
    for r in out:
        assert (r.user_id, r.item) not in pos
        assert r.item in catalog_items
        per_user.setdefault(r.user_id, []).append(r.neg_rank)
    for ranks in per_user.values():
        assert len(ranks) <= n_neg
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    again = analytics.negative_samples(df, n_neg=n_neg).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),   # quasi group
            st.integers(0, 3),                  # sensitive value (None-able below)
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_l_diversity_equals_bruteforce(spark, rows, l):
    """l_diversity_audit must agree with a brute-force python count
    under arbitrary class shapes, including NULL sensitive values
    (which never count toward diversity)."""
    from streaming_ecom_analytics_spark.operators import validation

    data = [(g, None if none else s) for g, s, none in rows]
    df = spark.createDataFrame(data, "grp string, sens int")
    got = validation.l_diversity_audit(df, ["grp"], "sens", l=l).collect()[0]

    classes: dict = {}
    for g, s in data:
        classes.setdefault(g, []).append(s)
    divs = {g: len({s for s in vs if s is not None}) for g, vs in classes.items()}
    n_und = sum(1 for d in divs.values() if d < l)
    exposed = sum(len(classes[g]) for g, d in divs.items() if d < l)
    assert got.n_rows == len(data)
    assert got.n_classes == len(classes)
    assert got.n_undiverse_classes == n_und
    assert got.n_exposed_rows == exposed
    assert got.min_diversity == min(divs.values())
    assert got.l_diverse == (min(divs.values()) >= l)


@given(
    st.lists(
        st.text(
            alphabet="ab #",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_gopher_flags_equal_float_definition(spark, texts):
    """The cross-multiplied integer rules must agree with the naive
    float formulation for arbitrary text (incl. empty/whitespace)."""
    from streaming_ecom_analytics_spark.functions import text as textops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.gopher_quality_flags(df, min_words=2).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.split() if w]
        r = out[i]
        assert r.n_words == len(words)
        if words:
            mean_len = sum(len(w) for w in words) / len(words)
            assert r.mean_word_len_ok == (3 <= mean_len <= 10)
            alpha_frac = sum(1 for w in words if any(c.isalpha() for c in w)) / len(words)
            assert r.alpha_word_frac_ok == (alpha_frac >= 0.8)
        else:
            assert r.gopher_pass is False
