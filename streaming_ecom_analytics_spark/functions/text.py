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
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (F.length(F.col(text_col)).cast("double") / n_tokens).alias("avg_token_len"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        n_punct.cast("long").alias("n_punct"),
        (n_punct.cast("double") / F.length(F.col(text_col))).alias("punct_ratio"),
    )


def quality_score(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals):
    length in a sane band, some stopwords present, not punctuation soup.
    Pure column arithmetic — identical IEEE results on any engine."""
    stats = doc_stats(docs, text_col=text_col, id_col=id_col)
    len_score = F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 10.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 5.0)
    return stats.select(
        id_col,
        "n_tokens",
        F.round((len_score * 0.4 + stop_score * 0.4 + punct_penalty * 0.2), 6).alias(
            "quality_score"
        ),
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
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        (F.length(F.col(text_col)).cast("double") / bpe).alias("chars_per_token"),
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

    def score_batches(batches):
        for pdf in batches:
            toks = pdf[text_col].fillna("").str.lower().str.split()
            out = []
            for doc_id, words in zip(pdf[id_col], toks):
                n = max(len(words), 1)
                best_lang, best = "und", 0.0
                for lang in sorted(markers):
                    hits = sum(1 for w in words if w in markers[lang])
                    rate = hits / n
                    if rate > best:
                        best_lang, best = lang, rate
                out.append((doc_id, best_lang, round(best, 6)))
            yield pd.DataFrame(out, columns=["doc_id", "lang_pred", "lang_confidence"])

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
    plagiarism-style overlap detection. Pandas UDF (rows-only check:
    polynomial rolling hashes are engine-specific)."""

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
