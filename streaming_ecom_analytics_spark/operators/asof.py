"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
right.ts <= left.ts within the same key. The classic naive forms —
range theta-join or per-key crossJoin — explode quadratically; this
implementation is the scalable composition:

    union(left rows, right rows tagged)
      → single hash shuffle on the key
      → sort within partition by (ts, right-before-left)
      → last(right attrs, ignorenulls) over an unbounded-preceding
        rows frame
      → filter back to left rows

One shuffle, no fan-out, state linear in partition size — the same
shape Flink's event-time join and kdb's aj use. Ties (left.ts ==
right.ts) resolve right-first, i.e. a row can match a same-timestamp
right row, matching DuckDB/kdb ASOF semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row with ts <= left ts per key.

    Output: all left columns + ``{prefix}ts`` + ``{prefix}<value_col>``
    (NULL where no prior right row exists). Left columns ride through
    the union (null-padded on right rows) so no re-join is needed.
    """
    rts = right_ts_col or ts_col
    lcols = left.columns
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)

    l = left.select(
        *lcols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("timestamp").alias("__r_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(on).alias(on) if c == on else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(rts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )

    # Tiebreak: among right rows sharing (key, ts), order additionally
    # by the value columns (then __r_ts) so last() picks the same row
    # under any partitioning/run — greatest value tuple wins. Without
    # this, equal-(key, ts) right rows made the pick nondeterministic.
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            *[F.col(f"__r_{c}").asc_nulls_first() for c in value_cols],
            F.col("__r_ts").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l.unionByName(r)
        .select(
            "*",
            F.last("__r_ts", ignorenulls=True).over(w).alias(f"{prefix}ts"),
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
                for c in value_cols
            ],
        )
        .filter(F.col("__is_left") == 1)
        .select(*lcols, f"{prefix}ts", *[f"{prefix}{c}" for c in value_cols])
    )
