"""Incremental aggregate maintenance: refresh a stored aggregate from a
delta batch instead of recomputing over the full history.

The reference rebuilds its reporting tables with full CREATE-OR-REPLACE
queries every cycle (snowflake_refresh.py:5-80) — fine at its scale,
quadratic-total-work at 100 TB. These helpers maintain the same
aggregates algebraically: keep ADDITIVE partial states (sums, counts)
keyed by the grain, combine the delta's partials into the snapshot with
one keyed aggregation, and derive the non-additive outputs (averages,
rounded money) only at read time.

Scale notes (100 TB posture):
- A refresh touches delta-sized input plus the (grain-sized, tiny)
  snapshot: one shuffle on the grain key, map-side combined. The raw
  history is never rescanned.
- Partial sums stay DECIMAL end-to-end, so an incrementally-maintained
  table is bit-identical to a full recompute regardless of how the
  history was sliced into batches — the associativity the oracle checks.
- The same frames work under foreachBatch for streaming upkeep (see
  streaming/materialize.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_aggregate(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Aggregate one batch to additive partial state per grain key.

    ``measures`` maps output column name → additive aggregate expression
    (SUM over DECIMAL, COUNT, ...). The result is a mergeable partial:
    :func:`combine_partials` of any slicing equals aggregating the
    concatenation.
    """
    return df.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )


def combine_partials(
    snapshot: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    measure_cols: Sequence[str],
) -> DataFrame:
    """Merge a delta's partial aggregates into the stored snapshot.

    Union + one keyed SUM: associative and commutative over additive
    partials, so repeated application over arbitrary batch boundaries
    converges to the full-history aggregate. Keys present in only one
    side pass through (their absent side contributes nothing).
    """
    keys = list(key_cols)
    cols = keys + list(measure_cols)
    return (
        snapshot.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measure_cols])
    )
