"""Text analysis operators for large-scale corpus processing.

All hot-path metrics are built-in column expressions (JVM-side,
whole-stage codegen) — a 100 TB corpus pass stays out of Python
entirely. Only language ID uses a Pandas UDF, and only because its
per-language profile tables are naturally expressed in Python; it is
Arrow-batched and stateless.

Operators
---------
- ``doc_stats``       : token/char counts, stopword & punctuation ratios
- ``quality_score``   : composite [0,1] heuristic quality
- ``language_id``     : character-n-gram + stopword heuristic lang ID
- ``winnow_fingerprint``: winnowing rolling-hash document fingerprint
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small closed-class marker sets per language. Deliberately tiny: the
# point is a deterministic, dependency-free heuristic, not a model.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is that it for on with as are this".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von für auf im".split()),
    "fr": frozenset("le la les et est un une dans pour que des du au avec".split()),
    "es": frozenset("el la los las y es un una en para que de con por".split()),
}

ENGLISH_STOPWORDS = sorted(_LANG_MARKERS["en"])


def _tokens(text_col: str) -> Column:
    # Single canonical tokenization: trim + split on whitespace runs.
    return F.split(F.trim(F.col(text_col)), r"\s+")


def doc_stats(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics as one codegen'd projection (no shuffle)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({stop_list})))"
    )
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    # Counts cast to long: Spark size()/length() return int32 while other
    # engines (the DuckDB oracle included) produce int64 for the same ops.
    # try_divide, not `/`: under Spark 4's default ANSI mode a zero
    # denominator (empty/whitespace-only document) would throw
    # DIVIDE_BY_ZERO and kill the whole job; NULL ratios are the
    # defined, engine-portable answer (oracles use nullif(denom, 0)).
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.try_divide(F.length(F.col(text_col)).cast("double"), n_tokens).alias(
            "avg_token_len"
        ),
        n_stop.cast("long").alias("n_stopwords"),
        F.try_divide(n_stop.cast("double"), n_tokens).alias("stopword_ratio"),
        n_punct.cast("long").alias("n_punct"),
        F.try_divide(n_punct.cast("double"), F.length(F.col(text_col))).alias(
            "punct_ratio"
        ),
    )


def quality_score_col(text_col: str = "text") -> Column:
    """The composite [0,1] quality heuristic as a single Column
    expression — usable as an inline ``withColumn`` (no join, no
    shuffle; curation composes it this way). Pure column arithmetic —
    identical IEEE results on any engine."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    stop_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({stop_list})))"
    )
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    stopword_ratio = F.try_divide(n_stop.cast("double"), n_tokens)
    punct_ratio = F.try_divide(
        n_punct.cast("double"), F.length(F.col(text_col))
    )
    len_score = F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
    # stopword_ratio is NULL only when the text is empty after trim (the
    # tokenizer yields [''], so the denominator is never 0 — but keep the
    # coalesce symmetric with punct_ratio); punct_ratio is NULL for
    # empty text: treat both as 0 so quality stays defined (and avoid
    # relying on greatest()'s engine-specific NULL handling).
    stop_score = F.least(F.coalesce(stopword_ratio, F.lit(0.0)) * 10.0, F.lit(1.0))
    punct_penalty = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.coalesce(punct_ratio, F.lit(0.0)) * 5.0
    )
    return F.round(
        len_score * 0.4 + stop_score * 0.4 + punct_penalty * 0.2, 6
    )


def quality_score(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals):
    length in a sane band, some stopwords present, not punctuation soup.
    One codegen'd projection — see :func:`quality_score_col`."""
    return docs.select(
        id_col,
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
        quality_score_col(text_col).alias("quality_score"),
    )


# GPT-2-flavored pre-tokenization classes: letter runs, single digits,
# punctuation runs — a deterministic, model-free token-count estimator.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens vs BPE-ish subword estimate per document —
    the budget/pricing pass of a training-data pipeline, as two
    codegen'd regexp counts (no tokenizer dependency, no UDF)."""
    ws = F.size(_tokens(text_col)).cast("long")
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")
    # try_divide: bpe is 0 on empty/whitespace-only text; ANSI `/` would
    # throw DIVIDE_BY_ZERO, NULL is the portable answer.
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.try_divide(F.length(F.col(text_col)).cast("double"), bpe).alias(
            "chars_per_token"
        ),
    )


_LANG_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_confidence", T.DoubleType()),
    ]
)


def language_id(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker-stopword hit rate.

    Arrow-batched Pandas UDF via mapInPandas — the per-batch loop is
    vectorized string ops over the marker tables; no JVM round-trips
    per row. Deterministic ties resolve alphabetically.
    """
    markers = {k: set(v) for k, v in _LANG_MARKERS.items()}
    langs = sorted(markers)

    def score_batches(batches):
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            toks = pdf[text_col].fillna("").str.lower().str.split()
            n = toks.str.len().clip(lower=1).astype("float64")
            # one explode, then a vectorized isin + group-sum per
            # language — no per-word Python loop
            ex = toks.explode()
            rates = pd.DataFrame(index=pdf.index)
            for lang in langs:
                hits = ex.isin(markers[lang]).groupby(level=0).sum()
                rates[lang] = hits.reindex(pdf.index, fill_value=0) / n
            best = rates.max(axis=1)
            # idxmax picks the FIRST max column: columns are in sorted
            # lang order, matching the scalar loop's alphabetical ties
            pred = rates.idxmax(axis=1).where(best > 0, "und")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "lang_pred": pred,
                    "lang_confidence": best.round(6),
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        score_batches, schema=_LANG_RESULT_SCHEMA
    )


_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.ArrayType(T.LongType())),
    ]
)


def winnow_fingerprint(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    rolling hash over k-grams of tokens, keep the min hash of each
    sliding window — a compact, position-robust signature for
    plagiarism-style overlap detection. Pandas UDF; the md5-derived
    gram hash (dedup._hash64) is engine-portable, so the exploded form
    carries a full value-level DuckDB oracle (plans/extension_queries
    _WINNOW_ORACLE)."""

    import numpy as np

    from streaming_ecom_analytics_spark.functions.dedup import _hash64

    def fp_batches(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                grams = [" ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 1))]
                hashes = np.fromiter(
                    (_hash64(g) for g in grams), dtype=np.uint64, count=len(grams)
                ).astype(np.int64)
                # min of each sliding window via numpy stride trick;
                # keep a hash only when the winning position moves
                # (the winnowing rule)
                n_win = max(len(hashes) - window + 1, 1)
                wins = np.lib.stride_tricks.sliding_window_view(
                    hashes, min(window, len(hashes))
                )[:n_win]
                argmins = wins.argmin(axis=1) + np.arange(len(wins))
                prints: list[int] = []
                last = -1
                for i, j in enumerate(argmins):
                    if j != last:
                        prints.append(int(hashes[j]))
                        last = j
                out.append((doc_id, prints))
            yield pd.DataFrame(out, columns=["doc_id", "fingerprint"])

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(fp_batches, schema=_FP_SCHEMA)


def winnow_fingerprint_rows(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """``winnow_fingerprint`` in exploded relational form: one row per
    selected hash, (doc_id, pos, fp_hash) with pos = the hash's ordinal
    in the document's fingerprint sequence.

    This is the join-friendly shape — fingerprint-overlap between two
    corpora is a plain equi-join on fp_hash — and the shape external
    tools (and the driver's row canonicalizer) can sort and hash; the
    array form above is the compact library API."""
    fp = winnow_fingerprint(docs, text_col=text_col, id_col=id_col, k=k, window=window)
    return fp.select(
        F.col("doc_id"), F.posexplode("fingerprint").alias("pos", "fp_hash")
    )


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 56,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap
    (stride < chunk_tokens) — the sequence-packing / context-window
    prep step of a training pipeline.

    Pure built-in array ops (split once → transform(sequence) →
    explode): chunk i covers words [i*stride+1, i*stride+chunk_tokens],
    i ranges over 0..(n_words-1) div stride, so every word lands in at
    least one chunk and consecutive chunks overlap by
    chunk_tokens - stride tokens. No UDF, no shuffle — a projection
    that scales with the scan.

    Output: (doc_id, chunk_id, chunk_text, n_tokens).
    """
    expr = (
        f"transform(sequence(0, int((greatest(size(__words), 1) - 1) div {stride})),"
        f" i -> struct(i AS chunk_id,"
        f"             concat_ws(' ', slice(__words, i * {stride} + 1, {chunk_tokens})) AS chunk_text,"
        f"             size(slice(__words, i * {stride} + 1, {chunk_tokens})) AS n_tokens))"
    )
    return (
        docs.select(F.col(id_col), _tokens(text_col).alias("__words"))
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
        )
    )


def ngram_doc_frequency(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    top: int = 100,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Top-``top`` word k-grams by document frequency — vocabulary /
    boilerplate mining over a corpus (an n-gram present in a huge share
    of documents is template noise worth stripping).

    Shingles are distinct-per-doc, so the count IS document frequency.
    Fully deterministic ordering (count desc, then shingle) makes the
    cut line engine-portable. The plan is partial-agg → final-agg →
    TakeOrderedAndProject: the full n-gram distribution is never
    collected or globally sorted.
    """
    from streaming_ecom_analytics_spark.functions.dedup import shingles

    sh = (
        shingles(docs, text_col=text_col, id_col=id_col, k=k)
        if shingles_df is None
        else shingles_df
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(top)
    )


def repetition_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition metrics (the Gopher/MassiveText-style
    repetition filters, Rae et al. 2021 §A1.1): fraction of duplicate
    word 2-grams and the frequency share of the most common word.
    High values flag boilerplate/spam for removal before training.

    Output: (doc_id, n_words, dup_bigram_frac, top_word_frac).

    Plan shape: one explode per metric family feeding a two-level
    aggregation — all built-in expressions, shuffle keys are
    (doc_id[, word]) so partial aggregation absorbs the fan-out
    map-side. No full-text shuffle: only exploded tokens move.
    """
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    # top-word share: count per (doc, word), then max/sum per doc
    word_counts = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    top_word = word_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_c"),
    )
    # duplicate-bigram fraction: 1 - distinct/total over word 2-grams
    bigrams = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(__w) - 2, 0)),"
                " i -> concat_ws(' ', slice(__w, i + 1, 2)))"
            )
        ).alias("bg"),
    )
    bg_stats = bigrams.groupBy(id_col).agg(
        F.count("*").alias("n_bg"),
        F.countDistinct("bg").alias("n_bg_distinct"),
    )
    return (
        top_word.join(bg_stats, on=id_col)
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.round(
                (F.col("n_bg") - F.col("n_bg_distinct")).cast("double") / F.col("n_bg"), 6
            ).alias("dup_bigram_frac"),
            F.round(F.col("top_c").cast("double") / F.col("n_words"), 6).alias(
                "top_word_frac"
            ),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing).

    Output: (doc_id, term, tf, score) — ties broken by term asc, so
    the result is deterministic and engine-comparable.

    Plan shape: ONE token explode → (doc, term) counts → document
    frequency as a count window over the already-aggregated grid
    (partitionBy term) — a groupBy+self-join formulation would compile
    the explode subtree twice; the window keeps a single lineage and
    shuffles only the distinct (doc, term) rows, never text → global
    doc count joins as a broadcast single row (constant cost) →
    row_number window per doc with group-limit pushdown.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "score")
    )


# Patterns kept RE2-compatible (no backrefs/lookaround) so the same
# regex runs identically on Spark (Java regex) and DuckDB (RE2).
_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "[PHONE]"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
)


def redact_pii(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails, phone numbers, and IPv4 addresses from document
    text, with a per-document redaction count — the standard PII pass
    before corpus release/training.

    Output: (doc_id, text, n_redactions). Pure chained regexp_replace
    — codegen'd, linear, no shuffle at all (narrow transformation).
    """
    redacted = F.col(text_col)
    for pat, tag in _PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tag)
    n_red = (
        F.size(F.split(redacted, r"\[EMAIL\]|\[PHONE\]|\[IP\]", -1)) - F.lit(1)
    ).cast("long")
    return docs.select(
        F.col(id_col),
        redacted.alias(text_col),
        n_red.alias("n_redactions"),
    )


def inverted_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    min_term_len: int = 3,
) -> DataFrame:
    """Build an inverted index: one row per term with its document
    frequency and the sorted posting list serialized as a CSV string
    (scalar, so results stay canonicalizable/hashable downstream —
    the array-column lesson from doc_fingerprint).

    Shape: explode → distinct (term, doc) pairs → one hash aggregate
    keyed by term. The distinct dedups within-doc repeats BEFORE the
    per-term aggregate, so a hot term's postings are built from unique
    docs only; at 100 TB the posting list itself is the skew risk —
    ``min_df`` bounds the tail, and a stop-term cap upstream bounds
    the head. sort_array makes the CSV deterministic regardless of
    partition arrival order.
    """
    pairs = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
        )
        .where(F.length("term") >= min_term_len)
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(id_col)), lambda x: x.cast("string")
                ),
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def bm25_rank(
    docs: DataFrame,
    *,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set — the retrieval
    scorer of a training-data search/curation loop.

    Output: (doc_id, score) for the ``top_k`` best documents, score
    descending, ties broken by doc_id. idf uses the standard
    ln(1 + (N - df + 0.5)/(df + 0.5)) form.

    Plan: ONE token explode feeds both the per-document length and the
    per-(doc, term) frequencies; only rows for the (tiny) query-term
    set survive past the first aggregate, so the term shuffle carries
    the query's postings, not the corpus vocabulary. Corpus constants
    (N, avgdl, per-term df) ride broadcast joins. Per-term scores are
    rounded to 6 places and summed as exact integer micros, so the
    total is independent of term-addition order — bit-identical on any
    engine or partitioning. Top-k fuses to TakeOrderedAndProject.
    """
    terms = [t for t in query_terms]
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    )
    dl = words.groupBy(id_col).agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("double").alias("total_dl")
    )
    tf = (
        words.where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    term_score = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / norm, 6)
    scored = (
        tf.join(F.broadcast(df_t), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            F.round(term_score * F.lit(1_000_000)).cast("long").alias("__micros"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg((F.sum("__micros") / F.lit(1_000_000.0)).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def ngram_lm_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    CCNet-style quality signal: train add-k-smoothed bigram counts on
    the corpus itself, score each doc by mean log P(w_i | w_{i-1}).
    Low scores = repetitive-boilerplate or out-of-distribution docs.

    Output: (doc_id, n_bigrams, lm_score) — lm_score NULL for docs
    with < 2 tokens.

    ``train_docs`` (default: ``docs`` itself) is the corpus the counts
    are estimated on — pass the train split to score held-out text:
    bigrams/heads unseen in training fall back to their smoothed mass
    ((0+a)/(0+aV)) via left joins, exactly the add-k backstop, so the
    held-out score is well-defined for every doc.

    Scale shape: counts tables are vocab-sized (<< corpus); the
    score join shuffles doc-bigrams against bigram counts on the
    (w1, w2) key — at 100 TB, dictionary-encode tokens to ints first
    (trade the string shuffle key for a join against the vocab
    table); kept as strings here for clarity and SQL-oracle parity.
    All expressions are built-ins — no Python in the hot path.
    """
    toks = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    train_base = (
        base
        if train_docs is None
        else train_docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    )

    def bigrams(frame: DataFrame) -> DataFrame:
        # adjacent pairs via zipped shifted slices (empty when < 2
        # tokens — avoids sequence(0, -1), which Spark would expand
        # DESCENDING)
        return frame.select(
            "doc_id",
            F.explode(
                F.expr(
                    "arrays_zip(slice(t, 1, greatest(size(t) - 1, 0)),"
                    "           slice(t, 2, greatest(size(t) - 1, 0)))"
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))

    bg = bigrams(base)
    uni = train_base.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c1")
    )
    vocab = uni.agg(F.count("*").cast("double").alias("v"))  # scalar, broadcast
    bgc = bigrams(train_base).groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    a = float(smoothing)
    # left joins + zero-coalesce: a bigram/head unseen in training
    # scores its smoothed backstop mass instead of dropping out
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(a))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a) * F.col("v"))
    )
    scored = (
        bg.join(bgc, on=["w1", "w2"], how="left")
        .join(uni.withColumnRenamed("w", "w1"), on="w1", how="left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.avg(logp).alias("lm_score"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )


def bpe_pair_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 20,
) -> DataFrame:
    """Adjacent-character-pair frequencies over the corpus — the
    statistic behind a BPE tokenizer's first merge choice (Sennrich
    2016): count every within-word character bigram, rank by count.
    One Spark round == one BPE training iteration's count step; a
    trainer loops this with a merge applied between rounds.

    Output: top-K (pair, pair_count), deterministic tiebreak
    (count desc, pair asc). Plan: explode → two-phase count-agg →
    TakeOrderedAndProject; never a global sort of the distribution.
    """
    toks = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    words = docs.select(F.explode(toks).alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top)
    )


def doc_containment(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_hash_df: int = 100,
) -> DataFrame:
    """Pairwise verbatim-overlap containment from winnowing
    fingerprints: for unordered doc pairs sharing >= ``min_shared``
    selected hashes, ``containment_a = |FP(a) ∩ FP(b)| / |FP(a)|``
    (distinct hashes; likewise b). The asymmetric scores separate
    "quotes a paragraph" from "is a superset" — the plagiarism-style
    readout Schleimer et al.'s winnowing was built for, and the
    verbatim-span complement of MinHash's whole-document Jaccard.

    Scale: candidate pairs come from the fp_hash equi-join — only docs
    sharing a selected hash ever meet, never an all-pairs product.
    Boilerplate hashes shared by > ``max_hash_df`` documents are
    dropped FIRST (the stop-fingerprint rule): one hash shared by H
    docs alone yields H² pairs, so the df cap bounds the join blowup
    the way banding bounds MinHash.
    """
    from streaming_ecom_analytics_spark.caching import persist_tracked

    # rows feeds the df-count AND the kept join; kept feeds the size
    # aggregate and BOTH sides of the pair self-join. Unpersisted, the
    # winnowing pandas kernel (the expensive part) re-executes once per
    # consumer — measured 6 executions per query (round-11). Persist
    # both: rows is (doc_id, fp_hash) distinct, kept a subset of it.
    rows = persist_tracked(
        winnow_fingerprint_rows(
            docs, text_col=text_col, id_col=id_col, k=k, window=window
        ).select(id_col, "fp_hash").distinct()
    )
    hash_df = rows.groupBy("fp_hash").agg(F.count("*").alias("__df"))
    kept = persist_tracked(
        rows.join(
            hash_df.filter(F.col("__df") <= max_hash_df).select("fp_hash"), on="fp_hash"
        )
    )
    sizes = kept.groupBy(id_col).agg(F.count("*").alias("__n"))
    a = kept.select(F.col(id_col).alias("doc_a"), "fp_hash")
    b = kept.select(F.col(id_col).alias("doc_b"), "fp_hash")
    pairs = (
        a.join(b, on="fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("__n").alias("__na")),
            on="doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("__n").alias("__nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(F.col("shared") / F.col("__na"), 6).alias("containment_a"),
            F.round(F.col("shared") / F.col("__nb"), 6).alias("containment_b"),
        )
    )


def _bpe_apply_word(word: str, ranks: dict) -> list:
    """Greedy BPE segmentation of one word: repeatedly merge the
    lowest-rank adjacent symbol pair (all occurrences, left-to-right)
    until no learned pair remains — the standard Sennrich-2016 apply."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        a, b = best_pair
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_frequencies(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, n) frequency table — the compressed corpus BPE training
    actually iterates over (|vocab| rows instead of |corpus| tokens)."""
    toks = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 12,
    max_local_vocab: int = 200_000,
    batch_merges: int = 8,
) -> list:
    """Learn ``n_merges`` BPE merges over the corpus — the tokenizer-
    TRAINING loop (bpe_pair_counts is one round's count step; this
    drives the full greedy iteration).

    Scale shape: the corpus collapses ONCE to the (word, n) frequency
    table (one shuffle, |vocab| rows — this is what Sennrich's trainer
    iterates over, and it's 100-1000x smaller than the token stream).
    Then, size-gated like catalog.dim_hint: a vocab that fits the
    driver (≤ ``max_local_vocab`` rows — tokenizer trainers are
    single-node over the frequency table in practice) collects once
    and loops locally, avoiding n_merges × job-scheduling overhead; a
    web-scale vocab stays distributed — each counting round re-segments
    the cached vocab (Arrow-batched), sums weighted pair counts
    (two-phase agg), and the driver accepts up to ``batch_merges``
    merges from the round's top candidates via the greedy-EXACT
    multi-merge rule (see ``_accept_merge_batch``: symbol-disjoint
    prefix, trimmed strictly above the first non-accepted candidate —
    provably identical to single-merge greedy, ~batch× fewer job
    waves). Both paths produce the identical greedy merge sequence
    (asserted equal in tests).

    Returns [(rank, left, right, count), ...], deterministic
    (count desc, left asc, right asc tiebreak).
    """
    import pandas as pd

    from streaming_ecom_analytics_spark.caching import persist_tracked

    # batch_merges=0 would set fetch=1, and a 1-candidate round that is
    # neither exhausted nor conflict-free trims the batch to empty —
    # the loop would then repeat the identical count with no progress
    # (round-6 advisor finding). One merge per round is the floor.
    batch_merges = max(1, batch_merges)
    vocab = persist_tracked(word_frequencies(docs, text_col=text_col))
    if vocab.count() <= max_local_vocab:
        local = [(r.word, int(r.n)) for r in vocab.collect()]
        merges: list = []
        for rank in range(n_merges):
            ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}
            agg: dict = {}
            for word, n in local:
                syms = _bpe_apply_word(word, ranks)
                for pair in zip(syms, syms[1:]):
                    agg[pair] = agg.get(pair, 0) + n
            if not agg:
                break
            (left, right), count = min(
                agg.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right, count))
        return merges

    merges = []
    while len(merges) < n_merges:
        ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}

        def count_pairs(batches, ranks=ranks):
            for pdf in batches:
                agg: dict = {}
                for word, n in zip(pdf["word"], pdf["n"]):
                    syms = _bpe_apply_word(word, ranks)
                    for a, b in zip(syms, syms[1:]):
                        agg[(a, b)] = agg.get((a, b), 0) + int(n)
                if agg:
                    yield pd.DataFrame(
                        [(a, b, c) for (a, b), c in agg.items()],
                        columns=["left", "right", "c"],
                    )

        fetch = batch_merges + 1
        top = (
            vocab.mapInPandas(count_pairs, schema="left string, right string, c long")
            .groupBy("left", "right")
            .agg(F.sum("c").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(fetch)
            .collect()
        )
        if not top:
            break
        cands = [(r.left, r.right, int(r.pair_count)) for r in top]
        for l, r, c in _accept_merge_batch(cands, exhausted=len(top) < fetch):
            if len(merges) < n_merges:
                merges.append((len(merges), l, r, c))
    return merges


def _accept_merge_batch(cands, *, exhausted: bool):
    """Greedy-EXACT multi-merge acceptance (round-5 verdict #6): from
    the sorted top candidates of one counting round, accept a prefix
    guaranteed to equal what single-merge greedy would pick over the
    same number of rounds — cutting driver round-trips ~batch× with
    bit-identical output.

    Why this is exact and not the usual drift-prone multi-merge:
    sequential greedy could diverge only if (a) a pair sharing a symbol
    with an earlier accepted merge changes count, or (b) a merge
    CREATES a pair that outranks the next candidate. Both are bounded:
    (a) the accept loop stops at the first candidate sharing a symbol
    (incl. the concatenated new symbol) with any accepted pair, so
    every sharing pair ranks at/below that stop candidate; (b) a
    created pair (x, ab)'s count is at most the pre-merge count of
    (x, a). Because accepted pairs are pairwise symbol-disjoint, that
    bounding pair (x, a) can itself be an ACCEPTED pair only when
    x = a = b — i.e. only a SELF-pair (a, a) can create pairs
    ((aa, a) from runs of a's) that escape the cutoff bound, so the
    batch closes immediately after accepting one; every other
    bounding pair is a non-accepted sharing pair ranking at/below the
    stop candidate. Trimming the accepted prefix to counts STRICTLY
    above the first non-accepted candidate then leaves no room for any
    changed or created pair to interleave. ``exhausted`` means the
    candidate list IS the whole pair table: no sharing pair exists
    outside it at all (one would have triggered the stop), so no
    cutoff trim is needed (the self-pair rule still applies — created
    pairs are new rows the table never saw).

    Verified against brute-force sequential greedy over randomized
    corpora in tests (conflicts, ties, created-pair interleavings,
    self-pair runs, exhausted tables).
    """
    if not cands:
        return []
    first = cands[0]
    accepted = [first]
    used = {first[0], first[1], first[0] + first[1]}
    stop_idx = len(cands)
    if first[0] != first[1]:
        for i in range(1, len(cands)):
            l, r, _ = cands[i]
            if l in used or r in used or (l + r) in used:
                stop_idx = i
                break
            accepted.append(cands[i])
            used |= {l, r, l + r}
            if l == r:  # self-pair: created (ll, l) pairs are unbounded
                stop_idx = i + 1
                break
        else:
            stop_idx = len(cands)
    else:
        stop_idx = 1  # first accepted is a self-pair: close the batch
    if stop_idx == len(cands) and not exhausted:
        # no conflict seen but pairs may exist below the fetch horizon:
        # the last fetched candidate becomes the cutoff, not a merge
        accepted = accepted[:-1]
        stop_idx = len(cands) - 1
    if stop_idx < len(cands):
        c_cut = cands[stop_idx][2]
        accepted = [accepted[0]] + [p for p in accepted[1:] if p[2] > c_cut]
    return accepted


def bpe_token_counts(
    docs: DataFrame,
    merges: list,
    *,
    text_col: str = "text",
    top: int = 50,
) -> DataFrame:
    """Segment the corpus with learned merges and count tokens — the
    APPLY side of the tokenizer. Runs over the (word, n) frequency
    table (each distinct word segmented once, weighted by frequency).
    Output: top-K (token, token_count), deterministic tiebreak."""
    import pandas as pd

    ranks = {(l, r): i for i, (_, l, r, _) in enumerate(merges)}

    def seg(batches):
        for pdf in batches:
            agg: dict = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                for t in _bpe_apply_word(word, ranks):
                    agg[t] = agg.get(t, 0) + int(n)
            if agg:
                yield pd.DataFrame(list(agg.items()), columns=["token", "c"])

    return (
        word_frequencies(docs, text_col=text_col)
        .mapInPandas(seg, schema="token string, c long")
        .groupBy("token")
        .agg(F.sum("c").alias("token_count"))
        .orderBy(F.desc("token_count"), F.asc("token"))
        .limit(top)
    )


def bigram_pmi(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining: top-k adjacent-word bigrams by pointwise
    mutual information, pmi = ln(n_big·n_tok / (n_w1·n_w2)) — the
    classic phrase detector (word2vec's phrase pass uses the same
    statistic).

    Plan shape: ONE lowered token-array projection feeds both sides —
    unigrams as a plain explode, bigrams as an in-array ``transform``
    over the slice (adjacent pairs never leave the row, so there is no
    positional self-join). The token total rides the same projection
    as an exact long sum and broadcasts back as a single row; the two
    vocabulary joins shuffle on the word key. The final top-k is
    TakeOrderedAndProject (deterministic tiebreak), never a global
    sort. Products are computed double-first so counts can't overflow
    at 100 TB token totals.

    Output: (w1, w2, n_big, pmi), top_k rows.
    """
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    base = docs.select(toks.alias("__t"))
    uni = base.select(F.explode("__t").alias("w")).groupBy("w").agg(
        F.count("*").alias("n")
    )
    n_tok = base.select(F.sum(F.size("__t")).alias("n_tok"))
    big = (
        base.select(
            F.explode(
                F.expr(
                    "transform(slice(__t, 1, size(__t) - 1),"
                    " (x, i) -> named_struct('w1', x, 'w2', element_at(__t, i + 2)))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_big"))
        .where(F.col("n_big") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    return (
        big.join(u1, on="w1")
        .join(u2, on="w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "n_big",
            F.round(
                F.log(
                    (F.col("n_big").cast("double") * F.col("n_tok"))
                    / (F.col("n1").cast("double") * F.col("n2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )


def gopher_quality_flags(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_alpha_word_frac: tuple[int, int] = (4, 5),
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    the published heuristic battery most LLM curation stacks start
    from), adapted to this corpus (no line structure → no bullet/
    ellipsis line rules) and made INTEGER-EXACT so every flag is
    bit-identical on any engine:

    - word_count_ok:      min_words ≤ n_words ≤ max_words
    - mean_word_len_ok:   min ≤ Σlen(word)/n_words ≤ max, compared as
      cross-multiplied integers (min·n ≤ Σlen ≤ max·n — no division)
    - alpha_word_frac_ok: ≥ 4/5 of words contain an alphabetic char,
      again cross-multiplied (5·n_alpha_words ≥ 4·n_words)
    - stopword_ok:        ≥ min_distinct_stopwords DISTINCT English
      stopwords appear (the 'natural prose' signal)
    - gopher_pass:        all of the above

    One scan; the per-word reductions fold JVM-side over the split
    array (no explode, no shuffle — a pure projection). NULL text is
    coalesced to '' BEFORE tokenizing (mirrored by COALESCE(text,'')
    in the oracle), so a NULL-text document yields n_words=0 and real
    False flags on both engines instead of engine-specific NULL
    propagation — round-6 advisor finding.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        F.split(F.trim(txt), r"\s+"), lambda w: w != F.lit("")
    )
    low = F.filter(
        F.split(F.trim(F.lower(txt)), r"\s+"), lambda w: w != F.lit("")
    )
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_distinct(
            F.filter(low, lambda w: w.isin(list(ENGLISH_STOPWORDS)))
        )
    )
    word_count_ok = (n_words >= min_words) & (n_words <= max_words)
    a, b = min_alpha_word_frac
    mean_len_ok = (sum_len >= F.lit(min_mean_word_len) * n_words) & (
        sum_len <= F.lit(max_mean_word_len) * n_words
    )
    alpha_ok = F.lit(b) * n_alpha >= F.lit(a) * n_words
    stop_ok = n_stop >= min_distinct_stopwords
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        sum_len.cast("long").alias("sum_word_len"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_distinct_stopwords"),
        F.coalesce(word_count_ok, F.lit(False)).alias("word_count_ok"),
        F.coalesce(mean_len_ok, F.lit(False)).alias("mean_word_len_ok"),
        F.coalesce(alpha_ok, F.lit(False)).alias("alpha_word_frac_ok"),
        F.coalesce(stop_ok, F.lit(False)).alias("stopword_ok"),
        F.coalesce(
            word_count_ok & mean_len_ok & alpha_ok & stop_ok, F.lit(False)
        ).alias("gopher_pass"),
    )


def compression_ratio(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the CCNet/Gopher-family
    gibberish detector SQL cannot express: heavily repeated text
    compresses far below natural prose (ratio ≪ 0.4), while random or
    encrypted blobs refuse to compress (ratio ≈ 1). Deterministic for
    a pinned zlib level, so results are rerun-stable; no SQL oracle
    exists (DuckDB has no DEFLATE), so the registered query is
    rows-only with value-pinning unit tests.

    Arrow-batched mapInPandas; output ratio in floored micros of
    compressed_len/raw_len. NULL/empty text yields NULL ratio.
    """
    import pandas as pd
    import zlib

    def comp(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw_lens, comp_lens = [], []
            for t in pdf[text_col]:
                if t is None or len(t) == 0:
                    raw_lens.append(0)
                    comp_lens.append(None)
                else:
                    b = t.encode("utf-8")
                    raw_lens.append(len(b))
                    comp_lens.append(len(zlib.compress(b, level)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "raw_bytes": raw_lens,
                    "compressed_bytes": comp_lens,
                }
            )
            yield out

    scored = docs.select(id_col, text_col).mapInPandas(
        comp, schema="doc_id long, raw_bytes long, compressed_bytes long"
    )
    return scored.select(
        "doc_id",
        "raw_bytes",
        "compressed_bytes",
        F.when(
            F.col("raw_bytes") > 0,
            F.floor(
                F.col("compressed_bytes").cast("double")
                / F.col("raw_bytes")
                * F.lit(1000000.0)
            ).cast("long"),
        ).alias("compression_ratio_micros"),
    )
