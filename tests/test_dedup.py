"""Unit tests for dedup operators on crafted near-duplicate fixtures."""

from __future__ import annotations

import pytest

from streaming_ecom_analytics_spark.functions import dedup

BASE = (
    "spark query engine shuffles data across the cluster while the optimizer "
    "prunes columns and pushes filters into the parquet scan for speed"
)
NEAR = BASE.replace("speed", "throughput")  # one-word edit → high jaccard
OTHER = "entirely different content about cooking pasta with tomato sauce and basil leaves"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)]  # 4 = exact dup of 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).collect()
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id[1] == 2  # docs 1 and 4 collapse, min id kept
    assert 4 not in by_id
    assert by_id[2] == 1 and by_id[3] == 1


def test_jaccard_pairs_finds_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 < pairs[(1, 2)] < 1.0
    assert (1, 3) not in pairs


def test_minhash_lsh_matches_bruteforce(docs):
    brute = {(r.doc_a, r.doc_b) for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh == brute


def test_simhash_exact_dup_distance_zero(docs):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    # signatures are stored signed-64; mask the xor back to 64 bits or
    # bin() of a negative Python int would miscount the distance
    mask = (1 << 64) - 1
    ham_near = bin((sigs[1] ^ sigs[2]) & mask).count("1")
    ham_other = bin((sigs[1] ^ sigs[3]) & mask).count("1")
    assert ham_near < ham_other


def test_simhash_pairs_blocking(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(1, 4)] == 0
    assert (1, 3) not in pairs


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (5, 6)],  # two components + isolated structure
        [(i, i + 1) for i in range(25)],  # path graph: worst-case diameter
        [(0, 1), (1, 0), (2, 2), (3, 4), (4, 3)],  # dups, self-loops, both orders
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    clean = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in clean for x in e})
    expected = _uf_components(clean, nodes)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in dedup.connected_components(df).collect()}
    assert got == expected


def test_connected_components_random_graph(spark):
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    clean = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in clean for x in e})
    expected = _uf_components(clean, nodes)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in dedup.connected_components(df).collect()}
    assert got == expected


def test_dup_clusters_labels_all_docs(spark, docs):
    pairs = dedup.jaccard_pairs(docs, threshold=0.5)
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup.dup_clusters(docs, pairs).collect()}
    # docs 1, 2, 4 form one near-dup cluster rooted at 1; doc 3 is a singleton
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[4] == (1, False)
    assert out[3] == (3, True)


def test_count_min_sketch_bounds(spark):
    """CMS never underestimates; overestimate bounded by 2N/width at
    5 families on this fixture."""
    from streaming_ecom_analytics_spark.functions import sketch as cms

    rows = [("a",)] * 100 + [("b",)] * 37 + [(f"rare{i}",) for i in range(200)]
    items = spark.createDataFrame(rows, "term string")
    sk = cms.build_count_min(items, "term", depth=5, width=1024)
    probes = spark.createDataFrame([("a",), ("b",), ("rare0",), ("absent",)], "term string")
    est = {r.term: r.est_count for r in cms.estimate_counts(sk, probes, "term", depth=5, width=1024).collect()}
    n = len(rows)
    assert est["a"] >= 100 and est["a"] <= 100 + 2 * n / 1024 + 1
    assert est["b"] >= 37
    assert est["rare0"] >= 1
    assert est["absent"] <= 2 * n / 1024 + 1  # ~0 with high probability


def test_count_min_sketch_mergeable(spark):
    """Sketches of disjoint corpora merge by union + re-aggregation to
    exactly the sketch of the union."""
    from pyspark.sql import functions as F

    from streaming_ecom_analytics_spark.functions import sketch as cms

    p1 = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, "term string")
    p2 = spark.createDataFrame([("x",)] * 7 + [("z",)] * 3, "term string")
    merged = (
        cms.build_count_min(p1, "term", width=256)
        .unionByName(cms.build_count_min(p2, "term", width=256))
        .groupBy("d", "idx")
        .agg(F.sum("c").alias("c"))
    )
    direct = cms.build_count_min(p1.unionByName(p2), "term", width=256)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_connected_components_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert dedup.connected_components(df).count() == 0


def test_dup_clusters_no_pairs_all_singletons(spark, docs):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup.dup_clusters(docs, pairs).collect()}
    assert out == {i: (i, True) for i in (1, 2, 3, 4)}


def test_fuzzy_link_pairs_deletion_blocking(spark):
    rows = [
        (1, "alpha", "x"),
        (2, "alphb", "x"),   # substitution, dist 1
        (3, "alpha9", "x"),  # insertion, dist 1 (different length!)
        (4, "alpha", "y"),   # same name, other block: never compared
        (5, "omega", "x"),   # dist > 1 from everything
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    pairs = {
        (r.id_a, r.id_b): r.distance
        for r in dedup.fuzzy_link_pairs(
            df, id_col="id", name_col="name", block_cols=("blk",)
        ).collect()
    }
    # (2,3) 'alphb'->'alpha9' is distance 2 and must be filtered out;
    # (1,4) share a name but live in different blocks
    assert pairs == {(1, 2): 1, (1, 3): 1}
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="max_distance=1"):
        dedup.fuzzy_link_pairs(df, id_col="id", name_col="name", max_distance=2)


# ---------------------------------------------------------------------------
# span_dedup_docs
# ---------------------------------------------------------------------------


def test_span_dedup_keeps_first_and_reconstructs(spark):
    # span size 2: doc 1 = [a b][c d], doc 2 = [c d][e f] — "c d" kept
    # only in doc 1; doc 2 rebuilds to just "e f".
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in dedup.span_dedup_docs(docs, span_tokens=2).collect()
    }
    assert out[1].text_dedup == "a b c d"
    assert (out[1].n_spans, out[1].n_spans_kept) == (2, 2)
    assert out[2].text_dedup == "e f"
    assert (out[2].n_spans, out[2].n_spans_kept) == (2, 1)


def test_span_dedup_fully_duplicated_doc_stays_as_empty_row(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in dedup.span_dedup_docs(docs, span_tokens=2).collect()
    }
    assert out[1].text_dedup == "x y"
    assert out[2].text_dedup == ""
    assert out[2].n_spans_kept == 0
    assert len(out) == 2  # row count preserved


def test_span_dedup_within_doc_repeats_collapse(spark):
    docs = spark.createDataFrame(
        [(7, "p q p q p q")], "doc_id long, text string"
    )
    r = dedup.span_dedup_docs(docs, span_tokens=2).collect()[0]
    assert r.text_dedup == "p q"
    assert (r.n_spans, r.n_spans_kept) == (3, 1)


def test_jaccard_capped_equals_uncapped_when_no_hot_shingles(spark):
    """On a corpus with no shingle above the df-cap, the capped variant
    must equal true Jaccard exactly; with a planted boilerplate shingle
    shared by everyone, the capped variant must still find the real
    near-dup pair without the boilerplate inflating similarity."""
    from streaming_ecom_analytics_spark.functions import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs_capped(docs, threshold=0.5).collect()
    }
    true = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert capped == true and (1, 2) in capped

    # plant a boilerplate trigram in EVERY doc with df_cap=2: similarity
    # must be computed over the capped sets (boilerplate excluded)
    boiler = " spark is great"
    docs2 = spark.createDataFrame(
        [(i, t + boiler) for i, t in
         [(1, base), (2, base + " extra"), (3, "one two three four five six")]],
        "doc_id long, text string",
    )
    capped2 = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs_capped(
            docs2, threshold=0.5, df_cap=2
        ).collect()
    }
    assert (1, 2) in capped2 and (1, 3) not in capped2 and (2, 3) not in capped2


def test_dedup_rate_by_source_fires_on_planted_duplicates(spark, tmp_path):
    """The shipped corpus has exact dups only at sf0.1, so the sf0.01
    driver gate sees zero dup counts (documented). Pin the dup-column
    semantics on a corpus where they fire: cross-source duplicates
    count on BOTH sides (the 'how polluted is this feed' question),
    clean sources report zero."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_ecom_analytics_spark.plans.registry import REGISTRY

    rows = [
        (1, "same text body", "en", "srcA", 14),
        (2, "same text body", "en", "srcB", 14),   # cross-source dup
        (3, "same text body", "en", "srcA", 14),   # intra-source dup
        (4, "unique one", "en", "srcA", 10),
        (5, "unique two", "en", "srcB", 10),
        (6, "unique three", "en", "srcC", 12),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    pq.write_table(pa.Table.from_pandas(pdf), sf_dir + "/documents.parquet")
    out = {
        r.source: (r.n_docs, r.n_duplicated_docs, r.dup_rate_micros)
        for r in REGISTRY["dedup_rate_by_source"].fn(spark, sf_dir).collect()
    }
    assert out == {
        "srcA": (3, 2, 666666),   # 2 of 3 docs share the dup hash
        "srcB": (2, 1, 500000),
        "srcC": (1, 0, 0),
    }
