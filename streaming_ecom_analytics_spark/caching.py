"""Tracked DataFrame persistence — unpersist discipline for operators
that cache intermediate frames (shingle sets, ANN features).

Operators that return LAZY DataFrames cannot unpersist their own
intermediates (the cache must live until the caller executes the
plan), so they register them here and the host — bench loop, test
fixture, query-registry wrapper — releases them once the query has
materialized. Without this, a long-lived session accumulates cached
shingle sets across every dedup call (CacheManager holds them until an
explicit unpersist; the ContextCleaner only GCs RDD-level caches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_SHARED: dict[tuple, DataFrame] = {}


def shared_subtree(key: tuple, builder) -> DataFrame:
    """A persisted subtree shared ACROSS queries (round-10 verdict #1b):
    the text-dedup family (near_dup_minhash_lsh, dedup_clusters,
    dedup_keep_best, curated_documents, training_export_manifest) all
    recompute the same shingle → MinHash → banded-LSH → exact-verify
    pair set; in a real pipeline the signature/pair artifact is
    computed once and reused. First caller pays the build; later
    callers read the persisted frame (tiny: verified pairs only).

    Unlike :func:`persist_tracked` frames, shared subtrees survive the
    per-query ``release_tracked()`` — the host releases them with
    :func:`release_shared` at pass/run end, so a multi-pass bench pays
    the build exactly once per pass, not once per family member.
    """
    df = _SHARED.get(key)
    if df is None:
        df = builder()
        df.persist()
        _SHARED[key] = df
    return df


_SHARED_VALUES: dict = {}


def shared_driver_value(anchor, key: tuple, builder):
    """A per-pass memo for bounded DRIVER-side artifacts derived from a
    DataFrame (round 11): the IVF-join family re-collected the same
    bounded training sample and re-ran the same deterministic numpy
    Lloyd up to 5× per bench pass (one per consumer query). The memo
    key is (id(anchor), *key) and the anchor object is STRONGLY
    referenced by the entry, so a key can never alias a different
    frame through id() reuse — and DataFrames are immutable, so a hit
    is always the identical value. Cleared by :func:`release_shared`
    (the bench calls it every pass, so nothing survives a bench pass
    and nothing is keyed on the data directory across runs) and
    bounded by :func:`release_shared_except` on the driver-contract
    path, which only calls per-query releases."""
    k = (id(anchor), *key)
    hit = _SHARED_VALUES.get(k)
    if hit is not None:
        return hit[1]
    value = builder()
    _SHARED_VALUES[k] = (anchor, value)
    return value


def release_shared() -> int:
    """Unpersist and forget every shared subtree (and driver-value
    memo); returns the subtree count."""
    _SHARED_VALUES.clear()
    n = 0
    while _SHARED:
        _, df = _SHARED.popitem()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def release_shared_except(sf_dir: str) -> int:
    """Release shared subtrees/memos NOT keyed to ``sf_dir`` (round-11
    advisor: a host that only calls ``release_tracked()`` — the bare
    driver-contract path — accumulated shared entries for the life of
    the session). Within one data directory the family-sharing benefit
    is exactly the point, so those entries stay; entries for OTHER
    directories can never be hit again by a sequential per-directory
    run and are dropped. Shared-subtree keys carry the sf_dir string
    as a component; driver-value memo keys carry it inside ``key``."""
    stale = [k for k in _SHARED if sf_dir not in k]
    n = 0
    for k in stale:
        df = _SHARED.pop(k)
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    # driver-value memo keys are (id(anchor), *key) — no sf_dir to match
    # on, so bound the map instead: beyond 64 entries the session is
    # hopping directories/params and the oldest memos are dead weight
    # (each pins its anchor DataFrame strongly).
    while len(_SHARED_VALUES) > 64:
        _SHARED_VALUES.pop(next(iter(_SHARED_VALUES)))
    return n


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later release.

    Idempotent: a frame that is already persisted (e.g. an operator
    composing another operator that persisted the same object) is
    returned as-is instead of re-persisting — Spark would log an
    'already cached' warning and the double-track would double-release.
    """
    try:
        already = df.storageLevel.useMemory or df.storageLevel.useDisk
    except Exception:
        already = False
    if not already:
        df.persist()
        _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: caches are re-materialized on demand if a
    plan that references them runs again.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
