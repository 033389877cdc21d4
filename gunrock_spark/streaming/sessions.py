"""Gap-based session windows — the engine's CUSTOM STATEFUL streaming
operator (`applyInPandasWithState`) plus its exact batch analog.

The reference has no streaming surface (SURVEY.md §2.3); a continuous
crawl needs sessionization the built-in windowed aggregates cannot
express: a session ends only when a per-key GAP elapses with no new
event, so window boundaries are data-dependent. That is precisely the
`applyInPandasWithState` use case the north brief names: per-key
state (the open session), event-time timeouts driven by the
watermark, and Arrow-batched pandas for the per-group math.

Semantics (both implementations identical):
  events with the same key belong to one session while consecutive
  timestamps are <= gap_ms apart; a session emits
  (key, session_id, session_start, session_end, n_events, sum_value)
  where session_id numbers a key's sessions in time order from 1.

Batch path (`sessionize_batch`): the classic lag/cumsum formulation —
  new_session = ts - lag(ts) > gap  →  session_id = running sum —
pure Catalyst window functions, DuckDB-oracle-checkable (the
`sessions_gap` driver query). Per-key windows are hash-partitioned by
key: no global sort, scales with the key cardinality.

Streaming path (`sessionize_stream`): per-key GroupState holds the
open session (start, end, n, sum); every micro-batch folds its events
into the state; an EVENT-TIME timeout at `end + gap` (advanced by the
watermark) closes and emits the session exactly once. State is O(open
sessions); emitted rows are final — the same append-once contract as
streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "key string, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, end long, n long, s double, sid long"


def sessionize_batch(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization: lag → gap flag → running-sum session id →
    per-session aggregate. Two hash-partitioned window passes plus one
    aggregate, all whole-stage-codegen."""
    w = Window.partitionBy("key").orderBy("ts")
    # cast only inside the gap arithmetic: parquet timestamps may be
    # TIMESTAMP_NTZ (unix_millis rejects it); differences are
    # timezone-invariant and the OUTPUT keeps the source type
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    new_session = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        .withColumn("session_id", sid.cast("long"))
        .groupBy("key", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessions_gap_sql(gap_ms: int = 1_800_000) -> str:
    """DuckDB oracle for :func:`sessionize_batch` over the driver's
    ``events`` view — identical lag/cumsum/aggregate formulation."""
    return f"""
WITH e AS (
  SELECT CAST(event_type AS VARCHAR) AS key, ts, value FROM events
),
l AS (
  SELECT key, ts, value,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY key ORDER BY ts)) AS d
  FROM e
),
n AS (
  SELECT key, ts, value,
         CASE WHEN d IS NULL OR d > {gap_ms} THEN 1 ELSE 0 END AS ns
  FROM l
),
sid AS (
  SELECT key, ts, value,
         CAST(SUM(ns) OVER (PARTITION BY key ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM n
)
SELECT key, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM sid GROUP BY key, session_id"""


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``:
    per-key GroupState = the open session; event-time timeout at
    session_end + gap closes it. Emits each session exactly once
    (append mode), keyed like :func:`sessionize_batch`; session_ids
    number each key's CLOSED sessions in emission order (equal to
    time order, since a key's sessions close in order)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n, s, sid = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_id": pd.Series([sid], dtype="int64"),
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": pd.Series([n], dtype="int64"),
                    "sum_value": [round(float(s), 6)],
                }
            )
            return
        mn = None
        mx = None
        n = 0
        s = 0.0
        for pdf in pdfs:
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            if len(ts_ms) == 0:
                continue
            bmn, bmx = int(ts_ms.min()), int(ts_ms.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
            n += int(len(ts_ms))
            s += float(pdf[value_col].sum())
        closed = []
        if state.exists:
            start, end, pn, ps, sid = state.get
            if mn is not None and mn - end > gap_ms:
                # the new batch starts a NEW session: close the old one
                closed.append((start, end, pn, ps, sid))
                state.update((mn, mx, n, s, sid + 1))
            elif mn is not None:
                state.update(
                    (min(start, mn), max(end, mx), pn + n, ps + s, sid)
                )
        elif mn is not None:
            state.update((mn, mx, n, s, 1))
        if state.exists:
            _, end, *_ = state.get
            state.setTimeoutTimestamp(end + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_id": pd.Series([c[4] for c in closed], dtype="int64"),
                    "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
                    "sum_value": [round(float(c[3]), 6) for c in closed],
                }
            )

    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(value_col),
        )
        .withWatermark(ts_col, watermark_delay)
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
