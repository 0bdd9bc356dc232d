"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan pruning.

A date-partitioned lake (sources/lake.py) prunes on ONE dimension.
When queries also filter on a second and third column (user_id range,
price band), row-group min/max statistics only help if rows with
nearby values sit in the same files. Z-ordering interleaves the bits
of several quantized columns into one sort key, so range-partitioning
by that key co-locates rows that are close in EVERY dimension —
parquet row-group stats then skip most of a 100 TB table for
multi-column point/range predicates (the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, here as a plain engine op).

Everything is built-in column expressions (shifts, masks, ORs) — no
UDF; the only non-scan work is one scalar min/max aggregate per column
(broadcast back as literals) and the range repartition's sampling pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
) -> DataFrame:
    """Append ``__z``: the Morton interleave of the quantized columns.

    Each column is min-max scaled to ``bits``-bit integers using one
    scalar aggregate over the frame (a broadcast 1-row join — no
    per-row Python, no global sort), then bit b of column i lands at
    position b*len(cols)+i of the key. len(cols)*bits must fit a
    signed 64-bit int (≤ 63).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a 64-bit key")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    top = (1 << bits) - 1

    def quantized(c: str) -> Column:
        span = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(f"__min_{c}")) / span).otherwise(
            F.lit(0.0)
        )
        return F.least(F.floor(frac * (top + 1)).cast("long"), F.lit(top))

    def interleave(c: str, i: int) -> Column:
        q = quantized(c)
        return reduce(
            lambda acc, b: acc.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i)
            ),
            range(bits),
            F.lit(0).cast("long"),
        )

    z = reduce(
        lambda acc, ci: acc.bitwiseOR(interleave(ci[1], ci[0])),
        enumerate(cols),
        F.lit(0).cast("long"),
    )
    return with_bounds.select(*df.columns, z.alias("__z"))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    Range-partition on the interleaved key (Spark samples the key
    distribution — no global sort), sort within each output file so
    row-group stats are tight, then drop the key. Readers need no
    cooperation: pushed min/max predicates on ANY of ``cols`` now skip
    whole files/row-groups.
    """
    (
        zorder_key(df, cols, bits=bits)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: Sequence[str] = (),
) -> dict:
    """Small-file compaction (the Delta/Iceberg OPTIMIZE bin-packing
    pass as a plain engine op): rewrite a parquet directory so each
    output file approaches ``target_bytes``.

    Streaming sinks and frequent small batch appends leave thousands
    of KB-scale files per partition; at 100 TB the resulting task-per-
    file scheduling and open/close overhead dominates scan time. The
    rewrite computes the output file count from the INPUT byte size
    (listing metadata only — no data pass), then rewrites with
    ``repartition(n)`` — a round-robin shuffle that also evens out
    skewed input files. Partitioned tables keep their partition
    columns; compaction then applies within each partition via
    repartition on the partition key + a random fanout.

    Writes to ``path + '.compact'`` then reports; atomically swapping
    directories is the caller's (or the table format's) job — this op
    never deletes the source. Returns {files_before, bytes, n_target}.
    """
    import glob as _glob
    import os as _os

    files = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        if _os.path.isfile(f)
    ]
    total = sum(_os.path.getsize(f) for f in files)
    n_target = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    out = path.rstrip("/") + ".compact"
    writer = df.repartition(n_target).write.mode("overwrite")
    if partition_cols:
        writer = (
            df.repartition(n_target, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    writer.parquet(out)
    return {"files_before": len(files), "bytes": total, "n_target": int(n_target)}
