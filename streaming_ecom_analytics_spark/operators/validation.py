"""Data-quality validation — the reference's warehouse checks as engine ops.

Reference: airflow_docker/dags/ecomm_pipeline/snowflake.py:15-47 runs
three remote SQL probes (row count, OR-chained null audit on key columns,
MAX(date) freshness). Here they fuse into ONE single-pass aggregate —
conditional counts instead of three scans, which at 100 TB is the
difference between one job and three.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_events(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id", "ts", "user_id", "event_type"),
    ts_col: str = "ts",
) -> DataFrame:
    """One-row quality summary: total rows, rows with any null key column
    (snowflake.py:27-35), and data freshness (snowflake.py:39-44)."""
    any_null = None
    for c in key_cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    # count(when) not sum(when): COUNT stays BIGINT in every engine the
    # oracle runs on (DuckDB SUM(int) widens to HUGEINT).
    return df.agg(
        F.count("*").alias("total_rows"),
        F.count(F.when(any_null, 1)).alias("null_key_rows"),
        F.max(F.date_trunc("day", F.col(ts_col))).alias("max_event_date"),
    )


def profile_table(
    df: DataFrame,
    *,
    numeric_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-column profile (DuckDB SUMMARIZE / Deequ-style): row count,
    null count + fraction, exact distinct count, and — for columns
    named in ``numeric_cols`` — numeric min/max.

    ONE aggregation pass over the table computes every column's stats
    (Catalyst plans the multi-distinct via a single expand, so the scan
    happens once, not per column), then a stack() unpivots the scalar
    row into one row per column. At 100 TB exact multi-column distinct
    is the expensive choice — the expand multiplies rows by the column
    count — so wide tables should profile in column batches or swap
    ``approx_count_distinct`` in; exact is kept here because profiling
    is correctness-sensitive (the oracle hash-checks it).
    """
    cols = df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        if c in numeric_cols:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        if c in numeric_cols:
            mn, mx = f"`__min_{c}`", f"`__max_{c}`"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"'{c}', `__nulls_{c}`, `__dist_{c}`, {mn}, {mx}"
        )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "AS (column, n_nulls, n_distinct, min_val, max_val)"
        ),
    )
    return stacked.select(
        F.col("column"),
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls").cast("double") / F.col("n_rows"), 6).alias(
            "null_frac"
        ),
        "n_distinct",
        "min_val",
        "max_val",
    )


def expectations_report(
    df: DataFrame,
    checks: dict[str, Column],
    *,
    unique_cols: Sequence[str] = (),
) -> DataFrame:
    """Declarative data-contract report (the dbt-tests / expectations
    pattern): each check is a boolean Column that must hold per row;
    ``unique_cols`` adds uniqueness contracts. ONE aggregation pass
    computes every violation count (conditional counts ride the same
    hash aggregate; uniqueness rides countDistinct), then the single
    result row unpivots to one row per expectation — the report is
    O(checks), the scan is O(data), once.

    Output: (expectation, n_rows, n_violations, passed).
    """
    if not checks and not unique_cols:
        # stack(0, ...) fails at SQL parse time with an obscure error;
        # fail here with a clear one instead.
        raise ValueError("expectations_report: no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = []
    for name, cond in checks.items():
        aggs.append(F.count(F.when(~cond, 1)).alias(f"__v_{name}"))
        names.append(name)
    for col in unique_cols:
        aggs.append(
            (F.count(col) - F.countDistinct(col)).alias(f"__v_{col}_unique")
        )
        names.append(f"{col}_unique")
    one = df.agg(*aggs)
    stack = ", ".join(f"'{n}', __v_{n}" for n in names)
    return (
        one.selectExpr(
            "__n",
            f"stack({len(names)}, {stack}) AS (expectation, n_violations)",
        )
        .select(
            "expectation",
            F.col("__n").alias("n_rows"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("expectation")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier expressions:
    how exposed is each equivalence class? A class of size < k means
    its members are re-identifiable by joining the quasi-identifiers
    against outside data — the release-gating check for training-data
    governance.

    One hash aggregate over the quasi-identifier grid, then scalar
    aggregates over the class frame (|classes| rows). NULL identifier
    values form classes of their own (they partition the data the
    same way a join key would).

    Output: single row (n_rows, n_classes, n_unsafe_classes,
    n_exposed_rows, min_class_size, k_anonymous) — k_anonymous TRUE
    iff every class has ≥ k members.
    """
    cols = [
        c if isinstance(c, Column) else F.col(c) for c in quasi_identifiers
    ]
    classes = df.groupBy(*cols).agg(F.count("*").alias("__n"))
    return classes.agg(
        F.sum("__n").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.count(F.when(F.col("__n") < k, 1)).alias("n_unsafe_classes"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, F.col("__n"))), F.lit(0)
        ).alias("n_exposed_rows"),
        F.min("__n").alias("min_class_size"),
        (F.min("__n") >= k).alias("k_anonymous"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_identifiers: Sequence[str | Column],
    sensitive: str | Column,
    *,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit — the companion to k-anonymity: a
    class can be large (k-anonymous) yet still leak if every member
    shares the same SENSITIVE value, so each equivalence class must
    also contain ≥ l distinct sensitive values (Machanavajjhala et al.,
    ICDE 2006, distinct variant).

    One two-key hash aggregate (quasi grid × sensitive) then a rollup
    to the class grain — the sensitive column never leaves the
    aggregate, so the audit itself is release-safe. NULL sensitive
    values don't count toward diversity (COUNT(DISTINCT) semantics:
    an all-NULL class has zero diversity and is maximally unsafe).

    Output: single row (n_rows, n_classes, n_undiverse_classes,
    n_exposed_rows, min_diversity, l_diverse) — l_diverse TRUE iff
    every class carries ≥ l distinct sensitive values.
    """
    cols = [
        c if isinstance(c, Column) else F.col(c) for c in quasi_identifiers
    ]
    s = sensitive if isinstance(sensitive, Column) else F.col(sensitive)
    classes = df.groupBy(*cols).agg(
        F.count("*").alias("__n"),
        F.countDistinct(s).alias("__div"),
    )
    return classes.agg(
        F.sum("__n").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.count(F.when(F.col("__div") < l, 1)).alias("n_undiverse_classes"),
        F.coalesce(
            F.sum(F.when(F.col("__div") < l, F.col("__n"))), F.lit(0)
        ).alias("n_exposed_rows"),
        F.min("__div").alias("min_diversity"),
        (F.min("__div") >= l).alias("l_diverse"),
    )


def fk_integrity_audit(
    pairs: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across fact→dimension links: for
    each (name, child, fk_col, parent, pk_col), the child rows whose
    FK resolves to no parent row (orphans) and the NULL-FK count —
    the first report run after any ingest or CDC backfill.

    Orphans are a LEFT ANTI join per link (NULL FKs excluded from the
    anti join — they can never match and are reported separately);
    Catalyst broadcasts the parent key set when small, and the child
    scan reads only the FK column (one narrow projection per link).

    Output: (link, n_child_rows, n_null_fk, n_orphans, ok) per link.
    """
    if not pairs:
        raise ValueError(
            "fk_integrity_audit: pairs must name at least one "
            "(name, child, fk_col, parent, pk_col) link to audit"
        )
    reports = []
    for name, child, fk, parent, pk in pairs:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        non_null = child.filter(F.col(fk).isNotNull()).select(
            F.col(fk).alias("__fk")
        )
        orphans = non_null.join(
            keys, on=F.col("__fk") == F.col("__pk"), how="left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        base = child.agg(
            F.lit(name).alias("link"),
            F.count("*").alias("n_child_rows"),
            F.count(F.when(F.col(fk).isNull(), 1)).alias("n_null_fk"),
        )
        reports.append(
            base.crossJoin(F.broadcast(orphans)).select(
                "link",
                "n_child_rows",
                "n_null_fk",
                "n_orphans",
                ((F.col("n_orphans") == 0) & (F.col("n_null_fk") == 0)).alias(
                    "ok"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
