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
    ham_near = bin(sigs[1] ^ sigs[2]).count("1")
    ham_other = bin(sigs[1] ^ sigs[3]).count("1")
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
