"""Custom stateful streaming operators (applyInPandasWithState).

The reference's funnel is stage *counts* (snowflake_refresh.py:30-39) —
that parity lives in windows.tumbling_event_counts. This module adds
the operator class Spark's built-ins can't express: an ORDERED per-user
funnel tracker ("view → cart → purchase, in that order, millisecond
latency" is the reference README's aspiration, README.md:5) as
arbitrary per-key state over a stream.

Design:
- keyed by user; state = (furthest funnel stage reached, its event
  time, first-seen time);
- an event advances the state only if it is the NEXT stage in order —
  out-of-order arrivals within a user are handled by event-time
  comparison, not arrival order;
- completed funnels emit one row (user, started_at, completed_at,
  seconds_to_convert) and reset — the operator's output stream is the
  conversion log;
- state is bounded by a processing-time timeout: users idle longer
  than ``timeout_minutes`` are evicted (emitting nothing), which is
  what keeps 100 TB of users from accumulating state forever.

The same function doubles as a batch operator via
``groupBy(user).applyInPandas`` (no state, whole history per group) —
used by the batch parity test and the registry's rows-only query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STAGES = ("view", "cart", "purchase")

CONVERSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
        T.StructField("seconds_to_convert", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "stage INT, stage_ts BIGINT, started BIGINT"


def _advance(events: pd.DataFrame, stage: int, stage_ts: int, started: int, stages):
    """Replay events (event-time order) through the stage machine.

    Times are integer epoch-MICROseconds throughout — float seconds
    round-trip with sub-microsecond noise that Arrow then (rightly)
    refuses to cast back into a timestamp[us] column.
    """
    conversions = []
    ev = events.sort_values("ts")
    for ts, etype in zip(ev["ts"], ev["event_type"]):
        ts_us = ts.value // 1000  # pandas Timestamp ns → us
        if etype == stages[0] and stage == 0:
            stage, stage_ts, started = 1, ts_us, ts_us
        elif stage > 0 and etype == stages[min(stage, len(stages) - 1)] and ts_us >= stage_ts:
            stage, stage_ts = stage + 1, ts_us
            if stage == len(stages):
                conversions.append((started, ts_us, (ts_us - started) / 1_000_000.0))
                stage, stage_ts, started = 0, 0, 0
    return conversions, stage, stage_ts, started


def funnel_conversions_stateful(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    stages: tuple[str, ...] = FUNNEL_STAGES,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Streaming ordered-funnel tracker. Input must be a streaming
    frame; output appends one row per completed funnel."""

    def track(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        stage, stage_ts, started = state.get if state.exists else (0, 0, 0)
        out = []
        for pdf in pdf_iter:
            convs, stage, stage_ts, started = _advance(
                pdf, stage, stage_ts, started, stages
            )
            out.extend(convs)
        state.update((stage, stage_ts, started))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "started_at": [pd.Timestamp(s * 1000) for s, _, _ in out],
                    "completed_at": [pd.Timestamp(c * 1000) for _, c, _ in out],
                    "seconds_to_convert": [d for _, _, d in out],
                }
            )

    renamed = events.selectExpr(
        f"{user_col} AS user_id", f"{ts_col} AS ts", "event_type"
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=CONVERSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def funnel_conversions_batch(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    stages: tuple[str, ...] = FUNNEL_STAGES,
) -> DataFrame:
    """Batch twin of the stateful tracker: same stage machine replayed
    over each user's full history via applyInPandas."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        convs, *_ = _advance(pdf, 0, 0, 0, stages)
        if not convs:
            return pd.DataFrame(
                columns=["user_id", "started_at", "completed_at", "seconds_to_convert"]
            )
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "started_at": [pd.Timestamp(s * 1000) for s, _, _ in convs],
                "completed_at": [pd.Timestamp(c * 1000) for _, c, _ in convs],
                "seconds_to_convert": [d for _, _, d in convs],
            }
        )

    renamed = events.selectExpr(
        f"{user_col} AS user_id", f"{ts_col} AS ts", "event_type"
    )
    return renamed.groupBy("user_id").applyInPandas(
        per_user, schema=CONVERSION_SCHEMA
    )
