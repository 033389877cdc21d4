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
open session (start, end, n, sum, sid); every micro-batch SORTS and
GAP-SPLITS its events per key (a batch spanning several gaps emits
every internally-closed session, keeping only the last open one), then
an EVENT-TIME timeout at `end + gap` (advanced by the watermark)
closes and emits the final session exactly once. Closed sessions leave
a zero-event tombstone carrying the session counter, preserving the
batch path's monotone per-key 1..N numbering; emitted rows are final —
the same append-once contract as streaming/windows.py.
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
    (append mode), keyed like :func:`sessionize_batch`.

    A micro-batch whose events span MORE than one gap (backfill,
    replay, a file source without maxFilesPerTrigger, slow triggers)
    is split INSIDE the batch: the key's events are sorted, cut at
    every intra-batch gap > gap_ms, every internally-closed session is
    emitted immediately and only the last (still-open) one stays in
    state — so batch grouping can never merge distinct sessions.

    session_ids match :func:`sessionize_batch`'s monotone per-key
    1..N numbering: when an event-time timeout closes a session the
    state is not removed but replaced by a zero-event TOMBSTONE that
    keeps the counter, so the key's next session continues at sid+1
    instead of restarting at 1. (Cost: state is O(keys ever seen),
    not O(open sessions) — a tombstone is one 5-field row per key.)
    Numbering equals batch time-order numbering whenever events
    arrive no later than the watermark allows; data so late it forms
    a whole session BEFORE an already-emitted one gets the next free
    id (streaming cannot renumber emitted rows).

    Late-data caveat (intentional divergence from
    :func:`sessionize_batch`): sessions closed by an INTRA-batch gap
    split are emitted as soon as the batch processes — before the
    watermark has passed their end + gap. An allowed-late event
    (within ``watermark_delay``) that lands inside the gap of such an
    already-emitted session starts a NEW session that can overlap the
    emitted one, where the batch path would have merged them. Holding
    internally-closed runs in state until their watermark expiry
    would close the gap at the cost of unbounded in-flight state per
    key during backfills; this implementation chooses prompt emission
    + the documented overlap window. Replays of a whole batch are
    still exactly-once (state advances atomically with the emit)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def emit(closed: list) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": [c[5] for c in closed],
                "session_id": pd.Series([c[4] for c in closed], dtype="int64"),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
                "sum_value": [round(float(c[3]), 6) for c in closed],
            }
        )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n, s, sid = state.get
            # keep the sid counter in a zero-event tombstone so the
            # key's NEXT session numbers sid+1 (no timeout set: the
            # tombstone never fires again, it only carries the counter)
            state.update((int(end), int(end), 0, 0.0, int(sid)))
            yield emit([(start, end, n, s, sid, key[0])])
            return
        ts_parts, val_parts = [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_parts.append((pdf[ts_col].astype("int64") // 1_000_000).to_numpy())
            val_parts.append(pdf[value_col].to_numpy(dtype="float64"))
        # runs: [mn, mx, n, sum] candidate sessions, state's open one first
        runs = []
        base = 0  # sessions already numbered for this key
        if state.exists:
            start, end, pn, ps, sid = state.get
            if pn > 0:
                runs.append([int(start), int(end), int(pn), float(ps)])
                base = int(sid) - 1
            else:  # tombstone: counter only
                base = int(sid)
        if ts_parts:
            ts = np.concatenate(ts_parts)
            vals = np.concatenate(val_parts)
            order = np.argsort(ts, kind="stable")
            ts, vals = ts[order], vals[order]
            # cut the batch at every intra-batch gap > gap_ms
            cuts = np.flatnonzero(np.diff(ts) > gap_ms) + 1
            for seg_ts, seg_v in zip(np.split(ts, cuts), np.split(vals, cuts)):
                runs.append(
                    [int(seg_ts[0]), int(seg_ts[-1]), int(len(seg_ts)), float(seg_v.sum())]
                )
        if not runs:
            return  # empty invocation: state (incl. any timeout) unchanged
        # interval-merge runs whose gap is <= gap_ms (handles late data
        # that extends or bridges the open session)
        runs.sort(key=lambda r: (r[0], r[1]))
        merged = [runs[0]]
        for r in runs[1:]:
            cur = merged[-1]
            if r[0] - cur[1] <= gap_ms:
                cur[0] = min(cur[0], r[0])
                cur[1] = max(cur[1], r[1])
                cur[2] += r[2]
                cur[3] += r[3]
            else:
                merged.append(r)
        closed = [
            (m[0], m[1], m[2], m[3], base + 1 + i, key[0])
            for i, m in enumerate(merged[:-1])
        ]
        last = merged[-1]
        state.update((int(last[0]), int(last[1]), int(last[2]), float(last[3]), base + len(merged)))
        state.setTimeoutTimestamp(int(last[1]) + gap_ms)
        if closed:
            yield emit(closed)

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
