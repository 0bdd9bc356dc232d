"""Size guards for documented brute-force correctness baselines.

``jaccard_pairs`` (all-pairs shingle join) and ``cosine_topk``
(|Q|x|C| broadcast crossJoin) exist as bit-exact oracle twins for the
LSH/IVF scale paths. On a real corpus they are quadratic; this guard
stops the documented-baseline from becoming an accidental 100 TB
cartesian (round-2 verdict #6).

The check is ``limit(max_rows + 1).count()`` — it short-circuits after
finding max_rows+1 rows instead of scanning the full input, so the
guard itself stays cheap at scale. Callers that genuinely want the
brute-force path on a bigger input pass ``max_rows=None`` (or a larger
bound) explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Default ceiling: generous for oracle/testdata runs (sf0.1 documents is
# ~6k rows), far below anything quadratic-expensive.
DEFAULT_BRUTE_FORCE_MAX_ROWS = 100_000


class BruteForceGuardError(ValueError):
    """Raised when a brute-force baseline is invoked on an input larger
    than its configured ceiling."""


def guard_brute_force(
    df: DataFrame,
    *,
    max_rows: int | None,
    op: str,
    scale_path: str,
    n_rows: int | None = None,
) -> None:
    """Raise BruteForceGuardError when the input exceeds ``max_rows``.

    When the caller already knows the input size (``n_rows`` — e.g. a
    parquet-footer count passed down an API), the check is a pure
    comparison and NO Spark job runs; otherwise a short-circuiting
    ``limit(max_rows + 1).count()`` probes the input (round-7 advisor:
    don't pay a count job when the size is already known).
    """
    if max_rows is None:
        return
    observed = n_rows if n_rows is not None else df.limit(max_rows + 1).count()
    if observed > max_rows:
        raise BruteForceGuardError(
            f"{op} is a quadratic brute-force correctness baseline and its "
            f"input exceeds max_rows={max_rows}. Use {scale_path} for large "
            f"inputs, or pass max_rows=None to override explicitly."
        )
