"""Deduplication operators for large-scale corpus curation.

Four tiers, all shuffle-aware:

- ``exact_dedup``       : content-hash groupBy — one shuffle on a 128-bit
                          key, the canonical first pass at any scale.
- ``jaccard_pairs``     : exact n-gram-shingle Jaccard via explode +
                          shingle-equijoin — quadratic only within a
                          shingle's posting list, used as ground truth
                          and for modest corpora.
- ``minhash_lsh_pairs`` : MinHash signatures + banded LSH — the 100 TB
                          path. Candidate generation touches only
                          same-bucket pairs; exact Jaccard verification
                          runs on candidates only.
- ``simhash_signatures``: 64-bit SimHash per document (Charikar 2002);
                          near-dup = small Hamming distance.

Everything except SimHash is pure built-in expressions (codegen'd);
hashing uses xxhash64 — a fixed, seedable JVM-side hash.
"""

from __future__ import annotations

from collections.abc import Sequence

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_ecom_analytics_spark.caching import persist_tracked
from streaming_ecom_analytics_spark.functions import guards


def exact_dedup(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content hash; keep the smallest id as representative.

    Output: (doc_id, content_hash, n_copies). md5 keeps the shuffle key
    at 16 bytes regardless of document size — never shuffle the text.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "content_hash", "n_copies")
    )


def shingles(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle).

    Built-in array ops: split → sliding windows via transform(sequence)
    → explode → distinct. The distinct is the only shuffle.

    ``hashed=True`` replaces each shingle string with its xxhash64
    BEFORE the distinct, so every downstream shuffle/sort/join key is 8
    bytes instead of a string — the right call at scale when shingles
    are long (at test scale it measures neutral, so the exact-string
    default stays). Collision risk is birthday-bounded: ~n²/2^65 for n
    distinct shingles; one collision perturbs one pair's intersection
    count by 1.

    The distinct's exchange is keyed by ``id_col`` ALONE (round 12,
    guide §2.4 "two operations keyed the same way share one
    exchange"): hash(id) satisfies the distinct's ClusteredDistribution
    on (id, shingle) — all rows of a key land in one partition — and
    every per-doc aggregation downstream (MinHash signatures, shingle
    set sizes) then reuses the partitioning instead of adding its own
    exchange. The signature aggregation previously paid the worst
    shape: shingles hash-spread by (id, shingle) put every doc on
    every task, so partial aggregation emitted ~n_tasks × n_docs ×
    520-byte partial rows (measured 137 MB at the 100x probe decade —
    now zero). Cost: intra-doc duplicate shingles are no longer
    pre-deduped map-side below the exchange (cross-doc rows never
    deduped anyway — the key includes id); joins keyed on ``shingle``
    re-exchange exactly as before.
    """
    # Split ONCE in a separate projection: inlining split() into the
    # transform lambda makes Catalyst re-evaluate it per sequence
    # element — O(words²) per document, measured 5x slower at sf0.1.
    sh = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__words")
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(size(__words) - {k}, 0)),"
                f" i -> concat_ws(' ', slice(__words, i + 1, {k})))"
            )
        ).alias("shingle"),
    )
    if hashed:
        sh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
    return sh.repartition(F.col(id_col)).distinct()


def jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_rows: int | None = guards.DEFAULT_BRUTE_FORCE_MAX_ROWS,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (doc_a < doc_b, jaccard >= threshold).

    Shingle equi-join computes |A∩B| per pair; |A∪B| = |A|+|B|−|A∩B|.
    The join fans out only within each shingle's posting list — hot
    shingles are the skew risk at scale, which the LSH variant avoids.
    Jaccard is an exact integer ratio divided once in double → bit-equal
    across engines.

    The shingle set feeds three plan branches (sizes + both join
    sides); it is persisted so the explode+distinct runs once, not per
    branch (exchange reuse can't cover it — each branch repartitions
    differently).

    Guarded: raises BruteForceGuardError above ``max_rows`` input docs
    (all-pairs is quadratic in posting-list sizes); minhash_lsh_pairs is
    the scale path. ``max_rows=None`` disables the guard.

    ``shingles_df`` injects a precomputed ``shingles(docs, k=k)`` frame
    (e.g. a family-shared persisted subtree) so hosts running several
    shingle consumers pay the explode+distinct once; semantics are
    identical by construction (the injected frame must be the same
    (id, shingle) relation this function would build).
    """
    guards.guard_brute_force(
        docs, max_rows=max_rows, op="jaccard_pairs", scale_path="minhash_lsh_pairs"
    )
    sh = persist_tracked(
        shingles(docs, text_col=text_col, id_col=id_col, k=k)
        if shingles_df is None
        else shingles_df
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_capped(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    df_cap: int = 100,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over DF-CAPPED shingle sets — the
    bounded-work twin of :func:`jaccard_pairs` (round-7 scale probe:
    the uncapped ground truth measured scaling exponent 1.16 at 10×
    because shared-shingle pairs grow with posting-list density; this
    variant's pair work is absolutely bounded by
    n_distinct_shingles × df_cap²/2, vocabulary-limited rather than
    corpus-limited, so it needs no brute-force guard).

    Semantics: shingles appearing in more than ``df_cap`` documents are
    excluded BEFORE both the intersection and the set sizes, i.e. the
    Jaccard is computed over the capped shingle sets on both sides of
    the ratio — a well-defined similarity in its own right (hot
    shingles are boilerplate and carry no near-dup signal; the CC-net
    / standard dedup-stack df-cut), applied identically in the DuckDB
    oracle. For pairs whose similarity rests on sub-cap shingles
    (every planted near-dup in the testdata) the result equals true
    Jaccard exactly.
    """
    sh0 = persist_tracked(
        shingles(docs, text_col=text_col, id_col=id_col, k=k)
        if shingles_df is None
        else shingles_df
    )
    keep = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") <= df_cap)
        .select("shingle")
    )
    sh = persist_tracked(sh0.join(keep, on="shingle", how="left_semi"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _mix_constants(num_perm: int, seed: int = 2024) -> list[int]:
    """Deterministic 63-bit XOR masks, one per hash family."""
    import random

    rng = random.Random(seed)
    return [rng.getrandbits(63) for _ in range(num_perm)]


def minhash_signatures(
    sh: DataFrame, *, id_col: str = "doc_id", num_perm: int = 64
) -> DataFrame:
    """MinHash signature per document: num_perm columns of
    min(xxhash64(xxhash64(shingle) XOR mask_i)) — one aggregation,
    JVM-side.

    The (variable-length) shingle string is hashed ONCE; the num_perm
    independent families rehash the resulting fixed-width long under
    per-family XOR masks — much cheaper than re-hashing the string per
    permutation, overflow-free under ANSI mode (unlike affine a*h+b
    mixing on Java longs), and equivalent in LSH distribution quality.

    Also emits ``n_sh`` (the shingle-set size) — it rides the same
    aggregation for free, and the exact-Jaccard verifier needs it
    (|A∪B| = n_a + n_b − |A∩B|), saving a separate count pass over
    the shingle table.
    """
    # Each aggregate is built as one SQL string: the per-element
    # Column form (min∘xxhash64∘bitwiseXOR∘xxhash64) costs ~5 py4j
    # round-trips per permutation — ~0.35 s of driver plan-construction
    # for 64 perms per call site (measured round-11); the parser form
    # resolves to the identical expression.
    aggs = [
        F.expr(f"min(xxhash64(xxhash64(shingle) ^ {mask}L))").alias(f"mh_{i}")
        for i, mask in enumerate(_mix_constants(num_perm))
    ]
    return sh.groupBy(id_col).agg(F.count("*").alias("n_sh"), *aggs)


def _band_structs_sql(bands: int, rows_per_band: int) -> str:
    """SQL text of the banded-LSH struct array over the ``mh_*``
    signature columns: array of (band_id, band_hash=xxhash64(the
    band's rows)). One parser call instead of ~6 py4j round-trips per
    band (~0.2 s of driver plan-construction per call site at 16
    bands, measured round-11); the analyzed expression is identical
    to the per-element F.struct/F.xxhash64 form it replaced."""
    structs = ",".join(
        "named_struct('band_id', {b}, 'band_hash', xxhash64({cols}))".format(
            b=b,
            cols=",".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return f"array({structs})"


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    shingles_df: DataFrame | None = None,
    sigs_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH, verified by exact Jaccard.

    bands=16 × rows=4 over 64 perms → P[miss | j] = (1−j⁴)¹⁶:
    ≈ 2.2e-4 at exactly j=0.8, decaying fast above it (≈ 4e-8 by
    j=0.9, effectively 0 for true duplicates j≈1). A threshold-
    boundary pair therefore has a ~2e-4 per-pair miss chance against
    the exact quadratic oracle (round-10 advisor: the old text claimed
    4e-8 AT 0.8 — that figure belongs to j=0.9). Candidate generation
    only joins within LSH buckets (linear-ish in corpus size, no
    all-pairs blowup); the final output is exact-verified, so LSH only
    prunes the search space and false candidates never escape.
    """
    rows_per_band = num_perm // bands
    # persisted (tracked — see caching.py): feeds the signature
    # aggregation AND the exact-verify intersection sides; callers with
    # several shingle consumers may inject a shared precomputed frame
    sh = persist_tracked(
        shingles(docs, text_col=text_col, id_col=id_col, k=k)
        if shingles_df is None
        else shingles_df
    )
    # sig feeds two branches (banding + the verifier's size lookup) —
    # persisted so the signature aggregation runs once. It is tiny:
    # num_perm longs + one count per document. ``sigs_df`` injects a
    # precomputed ``minhash_signatures(shingles(docs))`` frame (e.g. a
    # family-shared subtree also feeding the incremental cross-corpus
    # path) — identical by construction when built from the same
    # shingle relation with the same num_perm.
    sig = persist_tracked(
        minhash_signatures(sh, id_col=id_col, num_perm=num_perm)
        if sigs_df is None
        else sigs_df
    )
    stacked = sig.select(
        F.col(id_col),
        F.explode(F.expr(_band_structs_sql(bands, rows_per_band))).alias("bb"),
    ).select(id_col, "bb.band_id", "bb.band_hash")
    a = stacked.select(F.col(id_col).alias("doc_a"), "band_id", "band_hash")
    b = stacked.select(F.col(id_col).alias("doc_b"), "band_id", "band_hash")
    candidates = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Exact verification on the candidate set only. The shingle table
    # is first semi-reduced to candidate docs: candidates are
    # output-sized while shingles are corpus-sized, so this turns the
    # two verify joins from corpus-volume shuffles into candidate-only
    # volume (one semi-join pass over the shingle table instead of
    # shuffling it fully into both intersection sides plus the size
    # aggregate). No broadcast hint — candidate-id cardinality is
    # data-dependent and can exceed driver memory at corpus scale; AQE
    # converts the semi join to broadcast when the id set is small.
    # Candidates are persisted: three verify branches reference them
    # and would otherwise re-run the whole LSH chain each.
    candidates = persist_tracked(candidates)
    cand_ids = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # sh_cand has two consumers (both intersection sides); uncached,
    # each would re-run the semi join and the candidate-id distinct
    # shuffle.
    sh_cand = persist_tracked(sh.join(cand_ids, on=id_col, how="left_semi"))
    # Set sizes come from the signature aggregate (computed anyway for
    # banding) — no separate count pass over the shingle table.
    sizes = sig.select(F.col(id_col), F.col("n_sh"))
    sa_sh = sh_cand.select(F.col(id_col).alias("doc_a"), "shingle")
    sb_sh = sh_cand.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa_sh, on="doc_a")
        .join(sb_sh, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash_signatures(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """64-bit SimHash per document (Charikar 2002): sum ±1 per bit over
    feature hashes, take the sign vector. Features are word k-gram
    shingles — unigrams saturate on small vocabularies (every document
    shares most words, so all signatures collapse). Pandas UDF — the
    per-feature bit unpacking is a numpy kernel, far clearer than 64
    nested column expressions and still Arrow-batched."""
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)

    def sim_batches(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                feats = (
                    {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
                    if len(words) >= k
                    else {" ".join(words)}
                )
                # vectorized: hash all features (C-speed crc32 pairs →
                # 64-bit), unpack the bit matrix in one numpy op
                hs = np.fromiter(
                    (_hash64(f) for f in feats), dtype=np.uint64, count=len(feats)
                )
                bits = (hs[:, None] >> shifts) & np.uint64(1)
                acc = bits.astype(np.int64).sum(axis=0) * 2 - len(hs)
                sig = int(((acc > 0).astype(np.uint64) << shifts).sum())
                if sig >= 1 << 63:  # store as signed 64-bit
                    sig -= 1 << 64
                out.append((doc_id, sig))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        sim_batches, schema=_SIMHASH_SCHEMA
    )


def simhash_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 10,
    k: int = 3,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on signature
    chunks so the join never goes all-pairs.

    Pigeonhole guarantee: distance ≤ n_chunks−1 ⇒ at least one chunk
    equal; beyond that, blocking is probabilistic (pairs differing in
    every chunk are missed). Wider chunks → fewer candidates but a
    tighter guarantee; n_chunks=8 (8-bit chunks) guarantees ≤7 and
    empirically catches ≤10 on shingled text."""
    sig = simhash_signatures(docs, text_col=text_col, id_col=id_col, k=k)
    return hamming_pairs(
        sig,
        id_col="doc_id",
        sig_col="simhash",
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        out_a="doc_a",
        out_b="doc_b",
    )


def hamming_pairs(
    signatures: DataFrame,
    *,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    n_chunks: int = 8,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> DataFrame:
    """Generic chunk-blocked Hamming join over 64-bit signatures —
    the shared kernel under text SimHash and image dHash near-dup.
    Pigeonhole guarantee: distance ≤ n_chunks−1 ⇒ at least one chunk
    equal (blocking is exact there, probabilistic beyond); the join
    never goes all-pairs."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    # The signature frame feeds BOTH sides of the chunk self-join;
    # unpersisted, the upstream signature computation (a pandas kernel
    # for SimHash/dHash callers) executes twice. Persist: one row per
    # document, two longs wide.
    signatures = persist_tracked(signatures)
    chunks = signatures.select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_id"),
                    F.shiftright(F.col(sig_col), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("chunk"),
                )
                for i in range(n_chunks)
            ])
        ).alias("c"),
    ).select("__id", "__sig", "c.chunk_id", "c.chunk")
    a = chunks.select(
        F.col("__id").alias(out_a), F.col("__sig").alias("sig_a"), "chunk_id", "chunk"
    )
    b = chunks.select(
        F.col("__id").alias(out_b), F.col("__sig").alias("sig_b"), "chunk_id", "chunk"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, on=["chunk_id", "chunk"])
        .filter(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b, ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _hash64(s: str) -> int:
    """Deterministic 64-bit string hash = first 8 bytes of MD5 —
    process-stable (unlike Python's salted builtin hash), C-speed
    (hashlib), and ENGINE-PORTABLE: DuckDB reproduces it exactly as
    ``CAST('0x' || substr(md5(s), 1, 16) AS UBIGINT)``, which is what
    lets simhash and winnowing carry full value-level SQL oracles
    instead of rows-only checks."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus exact dedup: drop rows of ``new_docs`` whose content
    already exists in ``reference`` — the incremental-ingestion /
    snapshot-refresh pass of a training-data pipeline (only NEW data is
    hashed against the standing corpus, never corpus-vs-corpus).

    One broadcast-or-shuffle left_anti on a 16-byte md5 — the reference
    side reduces to a distinct hash set, so at 100 TB the join moves
    16 bytes/doc, never text.
    """
    ref = reference.select(F.md5(F.col(text_col)).alias("__content_hash")).distinct()
    return (
        new_docs.withColumn("__content_hash", F.md5(F.col(text_col)))
        .join(ref, on="__content_hash", how="left_anti")
        .drop("__content_hash")
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    word ``k``-gram with any benchmark document, with the count of
    distinct overlapping k-grams — the standard n-gram-overlap test-set
    contamination check run before training.

    Shape: shingle both sides (distinct per doc), reduce the benchmark
    to a distinct shingle set (tiny relative to the corpus — benchmark
    suites are MBs, corpora are TBs), equi-join, count per doc. The
    join key is the shingle string; the benchmark side broadcasts at
    real scale.

    Output: (doc_id, n_hits) for contaminated docs only — anti-join it
    back to the corpus to drop them (see plans/extension_queries.py).
    """
    c_sh = shingles(corpus, text_col=text_col, id_col=id_col, k=k)
    b_sh = (
        shingles(benchmark, text_col=text_col, id_col=id_col, k=k)
        .select("shingle")
        .distinct()
    )
    return (
        c_sh.join(b_sh, on="shingle")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def _bloom_auto_bits(n_keys: int) -> int:
    """~10 bits per key (FP ≈ 0.9% at 5 hashes), next power of two,
    clamped to [2^20, 2^33] bits = 128 KB..1 GB of broadcast bitmap
    (round-10 advisor: a fixed default silently saturated on large
    benchmark suites, FP → 1, and the prefilter stopped filtering)."""
    return 1 << max(20, min(33, (10 * max(1, n_keys) - 1).bit_length()))


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    n_bits: int | None = None,
    n_hashes: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Clean-corpus export: ``corpus`` rows sharing NO word ``k``-gram
    with ``benchmark``, the benchmark shingle set compiled into a Bloom
    bit table that prefilters corpus shingles BEFORE the exact
    contamination join.

    Why a bloom stage when :func:`contaminated_docs` already reduces
    the benchmark to a distinct shingle set: that set is shingle
    STRINGS — a large benchmark suite (every eval set a lab holds out)
    is tens of GBs of 4-gram text, past the broadcast-join regime, so
    the exact join would shuffle the CORPUS side by shingle. The
    packed bit table (:func:`sketch.bloom_bitmap`) is n_bits/8 bytes
    NO MATTER how many shingles it encodes, broadcastable as one row
    and storable — build once against the full held-out suite,
    prefilter every future ingest.

    Sizing (round-10 advisor): a FIXED n_bits undercuts the design —
    at tens of GBs of benchmark shingles, n_keys >> n_bits drives the
    false-positive rate toward 1 and the "prefilter" silently passes
    everything (output stays correct; the shuffle saving vanishes).
    The default ``n_bits=None`` therefore SIZES the table from the
    measured distinct-shingle count at ~10 bits/key (FP ≈ 0.9% at
    n_hashes=5) rounded up to a power of two, clamped to
    [2^20, 2^33] bits (128 KB – 1 GB broadcast). The count is one
    bounded scalar action over the benchmark side only — the side
    that is orders of magnitude smaller than the corpus and is being
    aggregated into the bitmap anyway. Callers pinning n_bits for a
    stored/versioned bitmap must scale it with the held-out suite. The probe is
    :func:`sketch.bloom_member_expr`: a codegen'd shift/mask boolean
    per corpus shingle against the broadcast bitmap — zero row
    expansion, zero probe-side shuffle — and only survivors (true hits
    + the ~(1-e^{-kn/m})^k false-positive minority) reach the exact
    semi join that removes false positives. One-sided error makes the
    bloom stage invisible in the result: no false negatives, so every
    truly contaminated shingle survives to the exact join, and the
    exact join drops every false positive — output == the plain
    NOT EXISTS anti-join, which is exactly what the registered DuckDB
    oracle checks. (Only the per-(doc,shingle) distinct inside
    :func:`shingles` and the survivor-sized exact join shuffle; both
    are map-side combinable and neither moves document text.)
    """
    from streaming_ecom_analytics_spark.functions import sketch

    c_sh = shingles(corpus, text_col=text_col, id_col=id_col, k=k)
    b_sh = (
        shingles(benchmark, text_col=text_col, id_col=id_col, k=k)
        .select("shingle")
        .distinct()
    )
    if n_bits is None:
        # bounded: one scalar count over the small (benchmark) side
        n_bits = _bloom_auto_bits(b_sh.count())
    bm = sketch.bloom_bitmap(
        b_sh, "shingle", n_bits=n_bits, n_hashes=n_hashes, seed=seed
    ).withColumnRenamed("bm", "__bloom_bm")
    member = sketch.bloom_member_expr(
        "shingle", "__bloom_bm", n_bits=n_bits, n_hashes=n_hashes, seed=seed
    )
    survivors = (
        c_sh.join(F.broadcast(bm))  # one-row bitmap: broadcast cross join
        .where(member)
        .select(id_col, "shingle")
    )
    contaminated_ids = (
        survivors.join(b_sh, on="shingle", how="left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated_ids, on=id_col, how="left_anti")


def minhash_lsh_pairs_against(
    new_docs: DataFrame,
    reference: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    ref_sigs: DataFrame | None = None,
    ref_sh_hash: DataFrame | None = None,
    new_shingles_df: DataFrame | None = None,
    new_sigs_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental NEAR-dup: MinHash-LSH candidates between NEW docs and
    a standing REFERENCE corpus only, verified by exact cross-corpus
    Jaccard — the near-dup analogue of :func:`dedup_against` (which
    catches only byte-identical text). This is the production ingest
    shape: the reference side's shingles/signatures are computed once
    per snapshot and each delta batch pays bands×|delta| + verify work
    — NEVER reference×reference and never delta×delta, so re-ingesting
    against an ever-growing corpus stays linear in the delta.

    Stored-artifact mode (round-10 verdict #3): pass ``ref_sigs``
    (doc_id, n_sh, mh_0..mh_{num_perm-1}) and ``ref_sh_hash``
    (doc_id, h = xxhash64(shingle)) — e.g. from
    :func:`corpus_signature_artifact` — and the corpus side is never
    re-shingled or re-signed: banding reads the stored signatures,
    the exact verify joins the stored shingle-hash table. Without
    them, both are derived from ``reference`` in-plan (same values:
    the artifact is written by the identical expressions). The verify
    intersection is keyed on xxhash64(shingle) in BOTH modes — an
    8-byte join key instead of the ~25-byte 3-gram string (the
    doc_novelty_scores precedent: distinct-shingle identity collides
    with probability ~n²/2⁶⁵ — immaterial at any real corpus, and the
    DuckDB oracle joins true strings and stays hash-green at every
    shipped SF).

    Banding math is :func:`minhash_lsh_pairs`'s: 16 bands × 4 rows over
    64 perms → P[candidate miss | j] = (1−j⁴)¹⁶ ≈ 2.2e-4 at exactly
    j=0.8 (≈ 4e-8 only by j=0.9), and the exact verify prunes every
    false candidate, so the output is held to the same exact-Jaccard
    oracle as the symmetric query — with the documented ~2e-4
    per-boundary-pair residual miss risk on new data.

    Output: (``id_col``, ref_id, jaccard) — one row per (new doc,
    reference doc) pair with exact Jaccard ≥ ``threshold``; anti-join
    ``new_docs`` against the first column to admit only novel text.
    """
    if (ref_sigs is None) != (ref_sh_hash is None):
        raise ValueError("pass both ref_sigs and ref_sh_hash, or neither")
    if ref_sigs is None and reference is None:
        raise ValueError("need a reference corpus or a stored artifact")
    rows_per_band = num_perm // bands
    # ``new_shingles_df`` / ``new_sigs_df`` inject precomputed delta-side
    # frames (round-11): shingling and the per-doc signature aggregation
    # both commute with restricting the doc set, so a full-corpus
    # family-shared shingle/signature table semi-joined to the delta ids
    # is identical to building from ``new_docs`` directly — and a host
    # running the symmetric LSH family in the same pass pays the
    # signature aggregation once, not twice.
    sh_n = persist_tracked(
        shingles(new_docs, text_col=text_col, id_col=id_col, k=k)
        if new_shingles_df is None
        else new_shingles_df
    )
    sig_n = persist_tracked(
        minhash_signatures(sh_n, id_col=id_col, num_perm=num_perm)
        if new_sigs_df is None
        else new_sigs_df
    )
    if ref_sigs is None:
        sh_r = persist_tracked(
            shingles(reference, text_col=text_col, id_col=id_col, k=k)
        )
        shr_h = sh_r.select(
            F.col(id_col).alias("ref_id"), F.xxhash64("shingle").alias("h")
        )
        sig_r = persist_tracked(
            minhash_signatures(sh_r, id_col=id_col, num_perm=num_perm)
        )
    else:
        shr_h = ref_sh_hash.select(F.col(id_col).alias("ref_id"), "h")
        sig_r = ref_sigs

    def _stacked(sig: DataFrame, out_id: str) -> DataFrame:
        return sig.select(
            F.col(id_col).alias(out_id),
            F.explode(F.expr(_band_structs_sql(bands, rows_per_band))).alias("bb"),
        ).select(out_id, "bb.band_id", "bb.band_hash")

    candidates = persist_tracked(
        _stacked(sig_n, "__new_id")
        .join(_stacked(sig_r, "ref_id"), on=["band_id", "band_hash"])
        .select("__new_id", "ref_id")
        .distinct()
    )
    # exact verify on candidates only — same semi-reduction as the
    # symmetric path: shingle tables shrink to candidate docs before
    # the intersection joins, so verify volume is candidate-sized.
    cand_new = candidates.select(F.col("__new_id").alias(id_col)).distinct()
    cand_ref = candidates.select(F.col("ref_id").alias("ref_id")).distinct()
    shn_c = sh_n.join(cand_new, on=id_col, how="left_semi").select(
        F.col(id_col).alias("__new_id"), F.xxhash64("shingle").alias("h")
    )
    shr_c = shr_h.join(cand_ref, on="ref_id", how="left_semi")
    inter = (
        candidates.join(shn_c, on="__new_id")
        .join(shr_c, on=["ref_id", "h"])
        .groupBy("__new_id", "ref_id")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sig_n.select(F.col(id_col).alias("__new_id"), F.col("n_sh").alias("n_a"))
    sb = sig_r.select(F.col(id_col).alias("ref_id"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, on="__new_id")
        .join(sb, on="ref_id")
        .select(
            F.col("__new_id").alias(id_col),
            "ref_id",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def corpus_signature_artifact(
    spark,
    sf_dir: str,
    *,
    source: str = "src0",
    k: int = 3,
    num_perm: int = 64,
    lake_root: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The stored corpus-side MinHash artifact for incremental ingest
    (round-10 verdict #3): build ONCE per corpus snapshot, read on
    every delta batch — the code form of the "at 100 TB the reference
    side is a persisted artifact" scale story that was previously
    prose. Returns ``(sigs, sh_hash)`` DataFrames read from a
    :mod:`versioned_lake` table:

    - ``sigs``:    (doc_id, n_sh, mh_0..mh_{num_perm-1}) — written by
                   the exact :func:`minhash_signatures` expressions,
                   so values are bit-identical to in-plan recompute;
    - ``sh_hash``: (doc_id, h = xxhash64(shingle)) — the verify-join
                   side: 8 bytes/shingle, ~¼ the string table, and the
                   only corpus-side data an ingest ever scans.

    Keyed by a fingerprint of the documents parquet (path, size,
    mtime) + parameters: a new corpus snapshot gets a fresh table, and
    the versioned-lake commit protocol makes concurrent first-builders
    race safely (loser reads the winner's snapshot). The lake lives
    under $SPARK_GRAFT_LAKE_DIR (default ``<repo>/.lake``).

    Scale: build cost is one corpus-linear shingle+sign pass, paid at
    snapshot creation, NOT per ingest; the per-ingest corpus-side cost
    is reading the (tiny) signature table into the band join plus a
    candidate-semi-joined scan of the hash table.
    """
    import hashlib
    from pathlib import Path

    from streaming_ecom_analytics_spark.sources.versioned_lake import (
        ConcurrentCommitError,
        VersionedTable,
    )

    src_file = Path(sf_dir) / "documents.parquet"
    st = src_file.stat()
    key = hashlib.sha256(
        f"{src_file.resolve()}|{st.st_size}|{st.st_mtime_ns}|{source}|{k}|{num_perm}".encode()
    ).hexdigest()[:16]
    root = Path(
        lake_root
        or os.environ.get(
            "SPARK_GRAFT_LAKE_DIR",
            str(Path(__file__).resolve().parents[2] / ".lake"),
        )
    )
    tables = {
        name: VersionedTable(str(root / f"corpus_{key}" / name))
        for name in ("sigs", "sh_hash")
    }
    if any(t.latest_version() is None for t in tables.values()):
        from streaming_ecom_analytics_spark import catalog

        corpus = catalog.documents(spark, sf_dir).filter(
            F.col("source") == source
        )
        sh = persist_tracked(shingles(corpus, k=k))
        frames = {
            "sigs": minhash_signatures(sh, num_perm=num_perm),
            "sh_hash": sh.select(
                "doc_id", F.xxhash64("shingle").alias("h")
            ),
        }
        for name, t in tables.items():
            if t.latest_version() is None:
                try:
                    t.commit(
                        frames[name],
                        message=f"corpus {source} {name} k={k} perms={num_perm}",
                        expect_version=None,
                    )
                except ConcurrentCommitError:
                    pass  # a concurrent first-builder won; read theirs
    return tables["sigs"].read(spark), tables["sh_hash"].read(spark)


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of an undirected edge list via alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    Output: (node, component) for every node appearing in ``edges``,
    where component is the smallest node id in the node's component.

    Scale posture: each round is one groupBy + one join over the
    current edge set — no transitive-closure blowup, no driver-side
    graph. The round count is O(log n) in the worst case (star
    contraction squares path lengths), so a billion-node dup graph
    converges in ~30 rounds of linear shuffles. The per-round
    convergence check is a single count+checksum aggregate; an action
    per round is inherent to any fixpoint algorithm.
    """
    # localCheckpoint (not persist): each round's plan references the
    # previous round's, so without lineage truncation the logical plan
    # nests one level per iteration and Catalyst compile time grows
    # superlinearly — measured minutes for a 40-node path graph.
    # eager=False (round 11): every checkpoint here is IMMEDIATELY
    # followed by the _fingerprint action, which materializes the
    # checkpointed RDD anyway — the eager count() was a second
    # blocking job per round for nothing (one job per round instead
    # of two, across every CC consumer). The lineage cut (LogicalRDD
    # barrier) is installed either way; on a cluster, swap for
    # checkpoint() on a reliable dir if executor loss during the
    # (short) fixpoint loop matters.
    e = (
        edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _fingerprint(df: DataFrame) -> tuple:
        # bit_xor, not sum: a sum of 64-bit hashes overflows under
        # ANSI mode; XOR is order-independent and overflow-free.
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(s, d))").alias("chk"),
        ).first()
        return (row["n"], row["chk"])

    def _large_star(cur: DataFrame) -> DataFrame:
        sym = cur.union(cur.select(F.col("d").alias("s"), F.col("s").alias("d")))
        mins = sym.groupBy("s").agg(F.least(F.min("d"), F.col("s")).alias("m"))
        return (
            sym.join(mins, on="s")
            .where(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .where(F.col("s") != F.col("d"))
            .distinct()
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        oriented = cur.select(
            F.greatest("s", "d").alias("s"), F.least("s", "d").alias("d")
        ).distinct()
        mins = oriented.groupBy("s").agg(F.min("d").alias("m"))
        joined = oriented.join(mins, on="s")
        rewired = joined.where(F.col("d") != F.col("m")).select(
            F.col("d").alias("s"), F.col("m").alias("d")
        )
        centers = mins.select(F.col("s"), F.col("m").alias("d"))
        return rewired.union(centers).where(F.col("s") != F.col("d")).distinct()

    # One star round per checkpoint: batching two rounds between
    # checkpoints was measured 70% SLOWER — the un-checkpointed
    # intermediate doubles plan nesting and Catalyst compile time
    # dominates at fixpoint scale. Checkpoint (lazily — the probe
    # materializes it), probe, repeat.
    fp = _fingerprint(e)
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
        nfp = _fingerprint(nxt)
        e = nxt
        if nfp == fp:
            break
        fp = nfp

    # At the fixpoint every edge is (node, component-min) with the
    # center implied; add the centers' self-labels.
    labels = e.select(F.col("s").alias("node"), F.col("d").alias("component"))
    centers = e.select(F.col("d").alias("node"), F.col("d").alias("component")).distinct()
    return labels.union(centers).distinct()


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS over the whole
    corpus: every document gets a cluster id (the smallest doc_id
    reachable through the near-dup graph; singletons label themselves)
    and a canonical flag — the keep/drop decision a dedup pipeline
    actually needs, rather than a bag of pairwise matches.

    Output: (doc_id, cluster_id, is_canonical) — one row per document.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    ids = docs.select(F.col(id_col).cast("long").alias(id_col))
    return (
        ids.join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", (F.col(id_col) == F.col("cluster_id")))
    )


def fuzzy_link_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    max_distance: int = 1,
) -> DataFrame:
    """Entity-resolution candidate pairs by edit distance, blocked so
    the self-join never goes all-pairs: records only compare within the
    same (block_cols..., length(name)) bucket — equal length is a free
    exact-blocking key whenever max_distance is small relative to name
    length (a distance-1 edit that changes length is caught by also
    probing adjacent lengths; substitution-dominated corpora like IDs
    and normalized names compare same-length only, which is the
    classic blocking trade-off and stated here explicitly).

    Candidate generation is the deletion-neighborhood scheme (FastSS /
    SymSpell): every record explodes into its name plus all
    single-character-deletion variants, and two names within
    levenshtein distance 1 — substitution, insertion, OR deletion —
    necessarily share a variant (delete the differing position; for an
    indel, the longer side's deletion equals the shorter's original).
    The join key is the near-full-length variant string, so buckets
    stay entity-sized even when the whole corpus shares a constant
    prefix — the failure mode that makes prefix/segment blocking
    collapse to a quadratic self-join (measured: 14 s → 3 s on the
    Customer#-prefixed testdata at sf0.1). Exact levenshtein verifies
    candidates only, so blocking never affects the result.

    Output: (id_a, id_b, name_a, name_b, distance), id_a < id_b.
    JVM-side expressions only; at 100 TB add a cheaper prefilter
    block (phonetic key, domain) in block_cols. max_distance must be
    1 — the d-deletion generalization explodes C(L, d) variants per
    row; raise deliberately rather than silently degrade.
    """
    if max_distance != 1:
        raise NotImplementedError(
            "fuzzy_link_pairs implements deletion-neighborhood blocking "
            "for max_distance=1; larger radii need C(len, d) variants "
            "per row — pre-normalize or use a coarser block first"
        )
    # variant 0 = the name itself; variant i = name with char i deleted
    variants = F.explode(
        F.expr(
            f"transform(sequence(0, length({name_col})), i -> "
            f"CASE WHEN i = 0 THEN {name_col} "
            f"ELSE concat(substring({name_col}, 1, i - 1), "
            f"            substring({name_col}, i + 1, length({name_col}))) END)"
        )
    ).alias("_variant")
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        *[F.col(c) for c in block_cols],
        variants,
    )
    a = keyed.select(
        F.col("_id").alias("id_a"), F.col("_name").alias("name_a"),
        *block_cols, "_variant",
    )
    b = keyed.select(
        F.col("_id").alias("id_b"), F.col("_name").alias("name_b"),
        *block_cols, "_variant",
    )
    cand = (
        a.join(b, on=[*block_cols, "_variant"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()  # a pair may share several deletion variants
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.select(
        "id_a", "id_b", "name_a", "name_b", dist.cast("int").alias("distance")
    ).filter(F.col("distance") <= max_distance)


def span_dedup_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
) -> DataFrame:
    """Span-level exact dedup with document reconstruction — the
    practical form of substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better") at fixed-span
    granularity: split every document into NON-overlapping
    ``span_tokens``-token spans, keep only the corpus-wide first
    occurrence of each distinct span (min (doc_id, span_id) — total
    order, engine-identical), and rebuild each document from its
    surviving spans in order.

    Plan (round 11): the span explode is the chunk projection (no
    shuffle); keep-first is ONE window over chunk_text (row_number
    ordered by (doc_id, span_id) — the same total order as the
    previous min-struct aggregate, so rn=1 marks exactly the same
    surviving spans), then ONE per-doc aggregate computes totals,
    kept counts AND the reconstruction together:
    collect_list(when(rn=1, struct)) skips non-survivors (collect_list
    drops NULLs), array_sort makes the rebuild order deterministic.
    The previous shape ran the chunk projection THREE times (first-agg,
    join probe, totals) and shuffled the span set by chunk_text twice
    (aggregate + join-back) plus two doc-grain aggregates and a doc
    join — ~5 exchanges down to 2 (chunk_text window, doc_id agg),
    output-identical. Skew note: a corpus-hot boilerplate span makes a
    hot chunk_text partition in EITHER shape (the old join probe also
    hash-partitioned every span row by chunk_text); span texts are
    bounded at span_tokens words, so a hot key is wide, not deep.

    Output: (doc_id, n_spans, n_spans_kept, text_dedup) — docs whose
    every span was seen earlier come back with empty text, preserving
    corpus row count for downstream joins.
    """
    from pyspark.sql import Window as W

    from streaming_ecom_analytics_spark.functions import text as text_fns

    spans = text_fns.chunk_documents(
        docs,
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=span_tokens,
        stride=span_tokens,
    ).select(id_col, F.col("chunk_id").alias("span_id"), F.col("chunk_text"))
    marked = spans.withColumn(
        "__rn",
        F.row_number().over(
            W.partitionBy("chunk_text").orderBy(F.col(id_col), F.col("span_id"))
        ),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.count(F.when(F.col("__rn") == 1, F.lit(1))).alias("n_spans_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct("span_id", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias("text_dedup"),
        )
        .select(
            id_col,
            "n_spans",
            F.col("n_spans_kept").cast("long").alias("n_spans_kept"),
            F.col("text_dedup"),
        )
    )
