"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (on by default in session.py) splits oversized
shuffle partitions automatically; salting is the explicit counterpart
for the cases AQE can't fix — a single hot GROUP BY key, or a
shuffle-hash join where one key dominates.

- ``salted_count_distinct``: two-stage distinct under a hot group key.
- ``salted_join``: replicate the small side across ``n_salts``
  sub-keys so one hot key spreads over n_salts reducers.

Both are semantics-preserving (asserted in tests against the unsalted
plans) — they change the shuffle layout, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT x) per group with a salted two-stage plan.

    Stage 1 dedups (group, salt, x) — the hot group's distinct work
    spreads over n_salts reducers; stage 2 sums per-salt distinct
    counts (correct because the salt is derived from x itself: equal
    values always land in the same salt bucket, so per-salt distinct
    sets are disjoint).

    NULLs in ``distinct_col`` are filtered first: COUNT(DISTINCT x)
    ignores NULL, and without the filter the NULL row would survive the
    distinct (xxhash64(NULL) yields the seed) and be counted.
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).alias("__salt")
    stage1 = (
        df.where(F.col(distinct_col).isNotNull())
        .select(*group_cols, F.col(distinct_col), salt)
        .distinct()
        .groupBy(*group_cols, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return stage1.groupBy(*group_cols).agg(F.sum("__partial").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over n_salts
    sub-partitions; the small side is replicated n_salts times.

    big rows get a random-but-deterministic salt (hash of the whole
    row's partition id + a uniform spread via xxhash64 of a
    monotonically increasing id is overkill — a per-row pmod of a
    cheap hash over all big columns suffices); small rows are exploded
    to every salt. The join key becomes (key, salt).

    Only join types where each output row is driven by exactly one big
    row are supported: right/full outer would emit every unmatched
    small row once PER SALT (n_salts duplicates), since the small side
    is exploded before the join.
    """
    supported = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join supports {sorted(supported)} only, not {how!r}: "
            "the exploded small side would duplicate unmatched rows "
            "n_salts times under right/full outer joins"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")
