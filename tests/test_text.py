"""Unit tests for text-analysis operators on crafted fixtures."""

from __future__ import annotations

import pytest

from streaming_ecom_analytics_spark.functions import text


@pytest.fixture(scope="module")
def lang_docs(spark):
    rows = [
        (1, "the cat sat on the mat and it is a good day for walking in the park"),
        (2, "der Hund ist nicht zu Hause und die Katze ist mit dem Kind im Garten"),
        (3, "le chat est dans la maison et les enfants sont dans le jardin avec un chien"),
        (4, "el perro es grande y la casa es bonita para los niños en el parque"),
        (5, "zzz qqq xxx yyy www"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_predictions(lang_docs):
    out = {r.doc_id: r.lang_pred for r in text.language_id(lang_docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"


def test_doc_stats_values(spark):
    df = spark.createDataFrame([(1, "the quick brown fox!")], "doc_id long, text string")
    row = text.doc_stats(df).collect()[0]
    assert row.n_chars == 20
    assert row.n_tokens == 4
    assert row.n_stopwords == 1  # 'the'
    assert row.n_punct == 1  # '!'
    assert row.stopword_ratio == 0.25


def test_quality_score_bounds(spark):
    rows = [
        (1, "the a of and to in is that it for on with as are this " * 10),  # stopword-rich, long
        (2, "x"),  # degenerate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.quality_score for r in text.quality_score(df).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_empty_and_whitespace_docs_dont_crash(spark):
    """Spark 4 ANSI mode: zero denominators (empty / whitespace-only
    text) must yield NULL ratios, not a DIVIDE_BY_ZERO job kill."""
    rows = [(1, ""), (2, "   "), (3, "normal text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    stats = {r.doc_id: r for r in text.doc_stats(df).collect()}
    assert stats[1].punct_ratio is None  # length 0 → NULL
    assert stats[2].n_punct == 0 and stats[2].punct_ratio == 0.0
    assert stats[3].punct_ratio == 0.0

    toks = {r.doc_id: r for r in text.token_counts(df).collect()}
    assert toks[1].bpe_ish_tokens == 0 and toks[1].chars_per_token is None
    assert toks[2].chars_per_token is None  # whitespace-only → 0 bpe tokens
    assert toks[3].chars_per_token is not None

    quality = {r.doc_id: r.quality_score for r in text.quality_score(df).collect()}
    assert all(q is not None and 0.0 <= q <= 1.0 for q in quality.values())
    assert quality[3] > quality[1]


def test_winnow_fingerprint_rows_shape(spark):
    """Exploded form must enumerate exactly the array form's hashes,
    in order, with scalar-only columns (driver-canonicalizable)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    arr = text.winnow_fingerprint(df).collect()[0].fingerprint
    rows = text.winnow_fingerprint_rows(df).orderBy("pos").collect()
    assert [r.fp_hash for r in rows] == list(arr)
    assert [r.pos for r in rows] == list(range(len(arr)))


def test_winnow_fingerprint_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = "PREFIX WORDS HERE " + base
    other = "completely different words entirely unrelated content here " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    fps = {r.doc_id: set(r.fingerprint) for r in text.winnow_fingerprint(df).collect()}
    overlap_near = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    overlap_other = len(fps[1] & fps[3]) / max(len(fps[1] | fps[3]), 1)
    assert overlap_near > 0.5
    assert overlap_other == 0.0


def test_repetition_stats_flags_repeated_text(spark):
    clean = "one two three four five six seven eight nine ten"
    spammy = "buy now " * 20  # one bigram repeated
    df = spark.createDataFrame([(1, clean), (2, spammy.strip())], "doc_id long, text string")
    out = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    assert out[1].dup_bigram_frac == 0.0
    assert out[1].top_word_frac == pytest.approx(0.1)
    assert out[2].dup_bigram_frac > 0.9
    assert out[2].top_word_frac == pytest.approx(0.5)


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    df = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common yak yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_top_terms(df, top_k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' appears in every doc (idf floor); rare terms win where present
    assert top[1] == "zebra"
    assert top[2] == "yak"
    assert top[3] == "common"


def test_redact_pii(spark):
    dirty = (
        "contact alice@example.com or +1-555-123-4567 from host 192.168.1.10 today"
    )
    clean = "no private information in this sentence at all"
    df = spark.createDataFrame([(1, dirty), (2, clean)], "doc_id long, text string")
    out = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert "[EMAIL]" in out[1].text and "[PHONE]" in out[1].text and "[IP]" in out[1].text
    assert "alice" not in out[1].text and "192.168" not in out[1].text
    assert out[1].n_redactions == 3
    assert out[2].text == clean and out[2].n_redactions == 0


def test_inverted_index_postings_sorted_and_deduped(spark):
    from streaming_ecom_analytics_spark.functions import text as text_fns

    df = spark.createDataFrame(
        [
            (7, "alpha beta beta gamma"),
            (3, "Alpha, beta! x"),   # case-folded; 'x' too short
            (5, "gamma delta"),
        ],
        ["doc_id", "text"],
    )
    out = {r.term: r for r in text_fns.inverted_index(df).collect()}
    assert out["alpha"].df == 2 and out["alpha"].postings == "3,7"
    assert out["beta"].df == 2 and out["beta"].postings == "3,7"  # within-doc dedup
    assert out["gamma"].postings == "5,7"
    assert out["delta"].df == 1
    assert "x" not in out


def test_bm25_prefers_rare_term_and_higher_tf(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),  # tf(apple)=2
            (2, "apple banana banana"),  # tf(apple)=1
            (3, "banana cherry cherry"),  # no apple
            (4, "banana banana banana"),
        ],
        "doc_id long, text string",
    )
    out = text.bm25_rank(docs, query_terms=("apple",), top_k=4)
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    # only docs containing the term score; higher tf ranks first
    assert ids == [1, 2]
    assert rows[0]["score"] > rows[1]["score"] > 0


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    docs = spark.createDataFrame(
        [(1, "common rare"), (2, "common x"), (3, "common y"), (4, "common z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in text.bm25_rank(docs, query_terms=("common", "rare"), top_k=4).collect()}
    # doc 1 holds the rare term too -> strictly best
    assert out[1] > max(v for k, v in out.items() if k != 1)


def test_ngram_lm_scores_semantics(spark):
    from streaming_ecom_analytics_spark.functions import text as textops

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),   # exact repeat: high-prob bigrams
        (3, "zq xv qj wk vn bb"),        # all-unique bigrams: low prob
        (4, "one"),                      # < 2 tokens: no bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.ngram_lm_scores(docs).collect()}
    assert out[4].n_bigrams == 0 and out[4].lm_score is None
    assert out[1].n_bigrams == 5
    # repeated doc's bigrams were seen twice -> higher mean log-prob
    assert out[1].lm_score > out[3].lm_score
    assert out[1].lm_score == out[2].lm_score


def test_ngram_lm_heldout_scores_unseen_via_backstop(spark):
    """With a separate train corpus, bigrams/heads absent from
    training must score their add-1 backstop mass — never drop out of
    the per-doc average — and fully-unseen text must score strictly
    below text the model has memorized."""
    import math

    from streaming_ecom_analytics_spark.functions import text as textops

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string"
    )
    score_docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zq xv qj")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in textops.ngram_lm_scores(score_docs, train_docs=train).collect()
    }
    assert out[10].n_bigrams == 2 and out[11].n_bigrams == 2
    assert out[10].lm_score > out[11].lm_score
    # fully-unseen bigram with unseen head: p = 1 / (0 + V), V = 5
    assert abs(out[11].lm_score - math.log(1.0 / 5.0)) < 1e-9


def test_bpe_pair_counts_ranking(spark):
    from streaming_ecom_analytics_spark.functions import text as textops

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "abab"), (3, "xy")],
        "doc_id long, text string",
    )
    out = textops.bpe_pair_counts(docs, top=3).collect()
    # 'aa' appears 3 per 'aaaa' word x2 = 6; 'ab' 2 + 'ba' 1; 'xy' 1
    assert (out[0].pair, out[0].pair_count) == ("aa", 6)
    assert out[1].pair == "ab" and out[1].pair_count == 2
    # deterministic tiebreak at count 1: 'ba' < 'xy'
    assert out[2].pair == "ba"


def test_domain_mixture_weights_boosts_small_domains(spark):
    from streaming_ecom_analytics_spark.functions import curate

    rows = [(i, "w " * 99 + "w", "big") for i in range(9)] + [(100, "w w", "small")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in curate.domain_mixture_weights(docs).collect()}
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-6
    # alpha < 1 up-weights the small domain relative to natural share
    assert out["small"].boost > 1.0 > out["big"].boost
    assert out["small"].weight > out["small"].token_share
    assert out["big"].n_tokens == 900 and out["small"].n_tokens == 2


# ---------------------------------------------------------------------------
# bigram_pmi
# ---------------------------------------------------------------------------


def test_bigram_pmi_counts_and_score(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "new york new york city"), (2, "in new york today")],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): r
        for r in text.bigram_pmi(docs, min_count=1, top_k=100).collect()
    }
    # "new york" appears 3x; tokens: 9 total; new=3, york=3.
    r = out[("new", "york")]
    assert r.n_big == 3
    assert r.pmi == round(math.log(3 * 9 / (3 * 3)), 6)
    # adjacency only inside a doc: "city in" never forms across docs
    assert ("city", "in") not in out
    # reverse bigram "york new" occurs once (within doc 1)
    assert out[("york", "new")].n_big == 1


def test_bigram_pmi_min_count_and_topk(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b c d")], "doc_id long, text string"
    )
    out = text.bigram_pmi(docs, min_count=2, top_k=1).collect()
    assert len(out) == 1
    assert (out[0].w1, out[0].w2) in {("a", "b"), ("b", "a")}


def test_bigram_pmi_single_token_doc_yields_no_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello hello")], "doc_id long, text string"
    )
    out = text.bigram_pmi(docs, min_count=1, top_k=10).collect()
    assert {(r.w1, r.w2) for r in out} == {("hello", "hello")}
    assert out[0].n_big == 1


def test_gopher_quality_flags_each_rule_fires(spark):
    """Each Gopher rule must be independently falsifiable: a crafted
    doc per failure mode plus one passing doc."""
    good = "the quick brown fox jumps over a lazy dog and it runs on in " * 5
    short = "the cat sat"                     # fails word count
    longwords = ("supercalifragilistic " * 60)  # mean word len > 10
    symbols = ("### $$$ %%% " * 30)           # alpha fraction < 4/5
    nostops = ("lorem ipsum dolor sit amet " * 12)  # < 2 distinct stopwords
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, longwords), (4, symbols), (5, nostops)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.gopher_quality_flags(docs, min_words=20).collect()}
    assert out[1].gopher_pass is True
    assert out[2].word_count_ok is False and out[2].gopher_pass is False
    assert out[3].mean_word_len_ok is False and out[3].gopher_pass is False
    assert out[4].alpha_word_frac_ok is False and out[4].gopher_pass is False
    assert out[5].stopword_ok is False and out[5].gopher_pass is False


def test_gopher_quality_flags_null_and_empty_fail_closed(spark):
    """NULL text must yield n_words=0 / sum_word_len=0 and real False
    flags — NOT engine-specific NULL propagation (round-6 advisor
    finding: Spark left sum_word_len NULL while the oracle coalesced
    to 0, a latent hash break the moment a NULL-text doc appears)."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.gopher_quality_flags(docs).collect()}
    for i in (1, 2, 3):
        r = out[i]
        assert r.n_words == 0 and r.sum_word_len == 0
        assert r.n_alpha_words == 0 and r.n_distinct_stopwords == 0
        assert r.gopher_pass is False and r.word_count_ok is False


def test_gopher_quality_flags_null_text_matches_oracle(spark):
    """Hash-level parity on a corpus WITH a NULL-text row: run the
    registered DuckDB oracle and the Spark op over the same 3-row
    table and compare every value (the shipped testdata has no NULL
    text, so the driver's parity check never exercises this path)."""
    import duckdb
    import pandas as pd

    from streaming_ecom_analytics_spark.plans import extension_queries as eq

    rows = [(1, None), (2, "the cat sat on the mat " * 10), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in text.gopher_quality_flags(docs, min_words=50).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    want = sorted(tuple(r) for r in con.execute(eq._gopher_oracle()).fetchall())
    assert got == want


def test_compression_ratio_separates_repetition_from_noise(spark):
    """The whole point of the signal: heavily repeated text compresses
    far below incompressible noise, and the op is rerun-stable."""
    import random

    rng = random.Random(3)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(4000))
    repeated = "spam ham " * 500
    docs = spark.createDataFrame(
        [(1, repeated), (2, noise), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.compression_ratio(docs).collect()}
    assert out[1].compression_ratio_micros < 100_000      # < 0.1
    assert out[2].compression_ratio_micros > 500_000      # noise barely compresses
    assert out[3].compression_ratio_micros is None
    assert out[4].compression_ratio_micros is None
    again = {r.doc_id: r.compression_ratio_micros for r in text.compression_ratio(docs).collect()}
    assert again == {k: v.compression_ratio_micros for k, v in out.items()}
    # ratio arithmetic pins to zlib level 6 exactly
    import zlib

    b = repeated.encode()
    assert out[1].compressed_bytes == len(zlib.compress(b, 6))
    assert out[1].raw_bytes == len(b)
