"""Unit tests for the cross-corpus / packing operators: incremental
exact dedup, n-gram decontamination, chunking, n-gram doc frequency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.functions import dedup, text


@pytest.fixture(scope="module")
def corpora(spark):
    reference = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (11, "a completely fresh document with novel words"),
            (12, "she said the quick brown fox jumps over whatever"),  # 4-gram overlap
        ],
        "doc_id long, text string",
    )
    return reference, new


def test_dedup_against_drops_exact_matches(corpora):
    reference, new = corpora
    kept = {r.doc_id for r in dedup.dedup_against(new, reference).collect()}
    assert kept == {11, 12}


def test_dedup_against_keeps_all_columns(corpora):
    reference, new = corpora
    out = dedup.dedup_against(new, reference)
    assert out.columns == new.columns  # no helper column leaks


def test_contaminated_docs_counts_overlapping_ngrams(corpora):
    reference, new = corpora
    hits = {
        r.doc_id: r.n_hits
        for r in dedup.contaminated_docs(new, reference, k=4).collect()
    }
    # doc 10 shares every 4-gram of doc 1 (6 of them); doc 12 shares
    # "the quick brown fox", "quick brown fox jumps",
    # "brown fox jumps over"; doc 11 shares none
    assert hits[10] == 6
    assert hits[12] == 3
    assert 11 not in hits


def test_chunk_documents_overlap_and_coverage(spark):
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = (
        text.chunk_documents(df, chunk_tokens=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    # 10 words, stride 3 → chunk starts at words 0,3,6,9 → 4 chunks
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[3].chunk_text == "w9"  # tail chunk, clamped
    assert [r.n_tokens for r in rows] == [4, 4, 4, 1]
    # every word appears in at least one chunk
    covered = {w for r in rows for w in r.chunk_text.split()}
    assert covered == set(words.split())


def test_chunk_documents_single_and_empty(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    rows = text.chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_id = {(r.doc_id, r.chunk_id): r for r in rows}
    assert by_id[(1, 0)].chunk_text == "solo"
    assert (2, 0) in by_id  # empty text still yields its (empty) chunk


def test_ngram_doc_frequency_orders_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),
            (3, "a b c d"),  # dup of 1: shingles identical
            (4, "x y z w"),
        ],
        "doc_id long, text string",
    )
    rows = text.ngram_doc_frequency(df, k=3, top=3).collect()
    assert (rows[0].shingle, rows[0].doc_freq) == ("a b c", 3)
    # ties broken alphabetically: "b c d" (docs 1,3) before "b c e"
    assert (rows[1].shingle, rows[1].doc_freq) == ("b c d", 2)
    assert (rows[2].shingle, rows[2].doc_freq) == ("b c e", 1) or rows[2].doc_freq == 1


def test_ivf_sample_fit_deterministic(spark):
    """ivf_topk with sampling bounds must stay deterministic run-to-run."""
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import similarity

    emb = catalog.embeddings(spark, "/root/testdata/sf0.001")
    q = emb.filter("vec_id < 3")
    a = similarity.ivf_topk(emb, q, k=3, n_lists=4, n_probe=2, max_train_rows=500)
    b = similarity.ivf_topk(emb, q, k=3, n_lists=4, n_probe=2, max_train_rows=500)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_train_bpe_hand_computable(spark):
    """Classic tiny corpus: 'aaab' x3 + 'ab'. Round 1 counts
    (a,a)=6, (a,b)=4 -> merge (a,a); round 2 re-segments 'aaab' as
    [aa, a, b] so (aa,a)=3, (a,b)=4 -> merge (a,b)."""
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = spark.createDataFrame(
        [(0, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    merges = textops.train_bpe(docs, n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "a"), ("a", "b")]
    assert merges[0][3] == 6 and merges[1][3] == 4


def test_bpe_apply_round_trip_and_counts(spark):
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = spark.createDataFrame(
        [(0, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    merges = textops.train_bpe(docs, n_merges=2)
    ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}
    # segmentation concatenates back to the word (lossless)
    for w in ("aaab", "ab", "ba", "aaaa"):
        assert "".join(textops._bpe_apply_word(w, ranks)) == w
    counts = {
        r.token: r.token_count
        for r in textops.bpe_token_counts(docs, merges).collect()
    }
    # 'aaab' -> [aa, ab] x3; 'ab' -> [ab] x1
    assert counts == {"aa": 3, "ab": 4}


def test_train_bpe_deterministic(spark):
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = catalog.documents(spark, "/root/testdata/sf0.001")
    m1 = textops.train_bpe(docs, n_merges=5)
    m2 = textops.train_bpe(docs, n_merges=5)
    assert m1 == m2 and len(m1) == 5


def test_train_bpe_local_and_distributed_paths_agree(spark):
    """The size-gated driver-local loop and the distributed batched
    loop implement the same greedy recurrence — identical merges
    (the batched accept rule is greedy-EXACT, not approximate)."""
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = catalog.documents(spark, "/root/testdata/sf0.001")
    local = textops.train_bpe(docs, n_merges=4)
    dist = textops.train_bpe(docs, n_merges=4, max_local_vocab=0)
    assert local == dist
    # batching disabled must give the same sequence too
    dist1 = textops.train_bpe(docs, n_merges=4, max_local_vocab=0, batch_merges=1)
    assert local == dist1


def test_train_bpe_batch_merges_zero_terminates(spark):
    """Round-6 advisor finding: batch_merges=0 made fetch=1, and a
    1-candidate non-exhausted round trimmed its batch to empty — the
    loop then repeated the identical count forever. The parameter is
    now floored at 1; the call must terminate with the greedy
    sequence."""
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = catalog.documents(spark, "/root/testdata/sf0.001")
    local = textops.train_bpe(docs, n_merges=3)
    dist0 = textops.train_bpe(
        docs, n_merges=3, max_local_vocab=0, batch_merges=0
    )
    assert dist0 == local


def test_train_bpe_batched_rounds_cut_job_waves(spark):
    """Round-5 verdict #6: the distributed trainer must pay FEWER
    driver round-trips than one per merge. Counted via the status
    tracker: batched (batch_merges=8) must launch strictly fewer jobs
    than single-merge (batch_merges=1) for the same n_merges, with
    identical output."""
    from streaming_ecom_analytics_spark import catalog
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = catalog.documents(spark, "/root/testdata/sf0.001")
    tracker = spark.sparkContext.statusTracker()

    def jobs_during(fn):
        before = len(tracker.getJobIdsForGroup(None))
        out = fn()
        return out, len(tracker.getJobIdsForGroup(None)) - before

    single, n_single = jobs_during(
        lambda: textops.train_bpe(docs, n_merges=8, max_local_vocab=0, batch_merges=1)
    )
    batched, n_batched = jobs_during(
        lambda: textops.train_bpe(docs, n_merges=8, max_local_vocab=0, batch_merges=8)
    )
    assert batched == single
    assert n_batched < n_single, (n_batched, n_single)


def test_accept_merge_batch_matches_sequential_greedy_brute_force(spark):
    """Property check of the exactness theorem: over randomized tiny
    corpora, running the batched accept rule round-by-round must yield
    the SAME merge sequence as pure sequential greedy (one merge per
    full recount). Exercises conflicts, ties, created-pair
    interleaving, and exhausted candidate tables."""
    import random

    from streaming_ecom_analytics_spark.functions import text as textops

    def sequential(words, n_merges):
        merges = []
        for rank in range(n_merges):
            ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}
            agg = {}
            for word, n in words:
                syms = textops._bpe_apply_word(word, ranks)
                for pair in zip(syms, syms[1:]):
                    agg[pair] = agg.get(pair, 0) + n
            if not agg:
                break
            (left, right), count = min(
                agg.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right, count))
        return merges

    def batched(words, n_merges, batch):
        merges = []
        while len(merges) < n_merges:
            ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}
            agg = {}
            for word, n in words:
                syms = textops._bpe_apply_word(word, ranks)
                for pair in zip(syms, syms[1:]):
                    agg[pair] = agg.get(pair, 0) + n
            if not agg:
                break
            fetch = batch + 1
            cands = sorted(
                ((l, r, c) for (l, r), c in agg.items()),
                key=lambda t: (-t[2], t[0], t[1]),
            )[:fetch]
            got = textops._accept_merge_batch(cands, exhausted=len(cands) < fetch)
            for l, r, c in got:
                if len(merges) < n_merges:
                    merges.append((len(merges), l, r, c))
        return merges

    rng = random.Random(7)
    for trial in range(200):
        n_words = rng.randint(1, 8)
        words = [
            (
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 7))),
                rng.randint(1, 5),
            )
            for _ in range(n_words)
        ]
        n_merges = rng.randint(1, 6)
        batch = rng.choice([2, 3, 8])
        exp = sequential(words, n_merges)
        got = batched(words, n_merges, batch)
        assert got == exp, (words, n_merges, batch, exp, got)
