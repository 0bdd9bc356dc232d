"""Warehouse change-data-capture operators: MERGE-style change apply
and SCD type-2 history build.

The reference lands incremental extracts into Snowflake staging tables
and rebuilds reporting tables from them (airflow_docker/dags/
utils/snowflake_refresh.py, extractor.py:25-41's month-rotation
incremental state). These operators supply the warehouse-side half of
that contract as engine ops: applying a keyed change batch onto a
standing snapshot (MERGE / upsert+delete), and deriving a slowly-
changing-dimension type-2 history from an attribute stream.

Scale notes (100 TB posture):
- apply_changes shuffles both sides on the merge key once: the change
  batch reduces to latest-per-key with a keyed window (partial state
  bounded by the batch's key count), the snapshot anti-joins against
  the (small) change-key set — Spark broadcasts it when it fits, and
  AQE picks sort-merge otherwise. No global sort, no driver state.
- scd2_intervals is per-key windows only (lag to detect change rows,
  lead to close intervals) — partitioned by the dimension key, never a
  single-partition window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Open-interval sentinel for the current SCD2 row — kept finite (not
#: NULL) so downstream BETWEEN predicates need no null handling, and
#: within pandas' ns-timestamp range (max 2262-04-11; the classic
#: 9999-12-31 overflows every Arrow/pandas materialization).
SCD2_OPEN_END = "2200-01-01 00:00:00"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a keyed change batch onto a snapshot (MERGE semantics).

    ``changes`` rows carry an operation marker (``op_col``): any value
    other than ``delete_op`` is an upsert. When a key appears multiple
    times in the batch, the row with the highest ``seq_col`` (ties
    broken by ``op_col`` descending, so an upsert beats a delete at the
    same sequence) wins. Returns the post-merge snapshot with ``base``'s
    columns.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(latest.select(*keys), on=keys, how="left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    return untouched.unionByName(upserts)


def scd2_intervals(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build an SCD type-2 validity history for one tracked attribute.

    Rows are ordered per key by (``ts_col``, ``tiebreak_col``); a new
    version opens whenever the attribute differs from the previous
    observation (or at the first observation). Each version carries
    ``effective_from`` / ``effective_to`` (half-open, ``effective_to``
    = :data:`SCD2_OPEN_END` for the current row) and an ``is_current``
    flag.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_obs = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("__prev", F.lag(attr_col).over(w_obs))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
    )
    w_ver = Window.partitionBy(key_col).orderBy(*order)
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        F.coalesce(
            F.lead(ts_col).over(w_ver), F.lit(SCD2_OPEN_END).cast("timestamp")
        ).alias("effective_to"),
        F.when(F.lead(ts_col).over(w_ver).isNull(), 1).otherwise(0).alias("is_current"),
    )


def pit_join(
    facts: DataFrame,
    dims: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (feature-store) join: attach the dimension version
    that was valid at each fact's event time, against an SCD2-style
    half-open interval history (``from <= ts < to``).

    This is THE correctness primitive for training-data extraction —
    joining current dimension values instead leaks the future into
    features. Because SCD2 intervals tile each key without overlap,
    every fact matches at most one version, so the plan is a plain
    equi join on the key (shuffle or broadcast — Catalyst's choice)
    with the range predicate evaluated as a post-join filter: fan-out
    is bounded by versions-per-key, never quadratic. No window, no
    sort of the fact table.
    """
    d = dims.withColumnRenamed(key_col, "__dim_key")
    cond = (
        (facts[ts_col] >= d[from_col])
        & (facts[ts_col] < d[to_col])
        & (facts[key_col] == d["__dim_key"])
    )
    return facts.join(d, cond, how).drop("__dim_key")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key as added / removed / changed between two
    snapshots of the same table (versioned-lake time-travel pairs, or
    pre/post CDC-merge states) — the audit query behind "what did this
    backfill actually touch?".

    Non-key columns collapse to a null-safe md5 row hash BEFORE the
    join, so the full-outer join shuffles (key, 16-byte hash) — never
    row payloads; unchanged keys are dropped post-join. At 100 TB this
    is two scans + one key shuffle, and bucketed snapshots co-locate
    it to zero exchange.

    Output: key_cols + change_type ∈ {added, removed, changed}.
    """
    keys = list(key_cols)
    cols = list(compare_cols) if compare_cols else [
        c for c in old.columns if c not in keys
    ]

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # Hash the null-tagged JSON of a named struct, not a
        # separator-joined concat: to_json omits null fields (so NULL
        # is distinguishable from any real value, including literal
        # sentinel strings) and JSON-escapes every character (so no
        # embedded byte can alias values across column boundaries).
        row_hash = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))
        return df.select(*keys, row_hash.alias(f"__h_{tag}"))

    j = hashed(old, "old").join(hashed(new, "new"), on=keys, how="full_outer")
    return j.select(
        *keys,
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    ).where(F.col("change_type") != "unchanged")
