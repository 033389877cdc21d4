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
PENDING RUNS — every gap-separated event run not yet past its
watermark expiry; each micro-batch SORTS and GAP-SPLITS its events,
interval-merges them into the pending runs, and emits exactly the
runs whose `end + gap` the watermark has passed (on data or on the
event-time timeout set at the earliest pending expiry). Because a run
is only emitted once NO admissible event could still merge with it
(any such event would be watermark-late and dropped), stream output
equals the batch lag/cumsum result for every closed session — late
in-watermark data landing inside a pending run's gap merges exactly
as the batch path would (VERDICT r4 #6 closed the old
emit-immediately divergence). Fully-emitted keys keep a zero-event
tombstone carrying the session counter, preserving the batch path's
monotone per-key 1..N numbering; emitted rows are final — the same
append-once contract as streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "key string, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)
# pending runs (parallel arrays, start-sorted, pairwise gaps > gap_ms)
# + the count of sessions already emitted for the key
_STATE_SCHEMA = (
    "starts array<long>, ends array<long>, ns array<long>, "
    "ss array<double>, sid long"
)


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
    per-key GroupState = the PENDING RUNS (gap-separated event runs
    whose ``end + gap`` the watermark has not yet passed) plus the
    emitted-session counter. Emits each session exactly once (append
    mode), keyed and numbered like :func:`sessionize_batch`.

    Every invocation (data or event-time timeout) does the same
    thing: gap-split the batch's sorted events into runs,
    interval-merge them with the pending runs, emit exactly the
    merged runs whose ``end + gap <= watermark`` — no admissible
    event can still reach them; anything older is watermark-late and
    dropped at the input — and re-arm the timeout at the earliest
    remaining expiry. Holding internally-closed runs until their
    watermark expiry is what makes stream output EQUAL the batch
    lag/cumsum result under late-but-in-watermark data (VERDICT r4
    #6): an allowed-late event landing inside a pending run's gap
    merges (possibly bridging two runs) exactly as the batch path
    would, instead of overlapping an already-emitted session.

    session_ids keep the batch path's monotone per-key 1..N
    numbering: runs expire in start order (pairwise gaps exceed
    gap_ms, so start order = expiry order), and a fully-emitted key
    leaves a zero-run TOMBSTONE carrying the counter so its next
    session continues at sid+1.

    State cost: O(pending runs) per key — bounded by the number of
    gap-separated runs inside one watermark horizon (a backfill
    spanning H hours of data with delay D holds at most
    ceil(D/gap)+1 runs per key once its oldest runs expire, since
    expiry drains them as the watermark advances), plus the one-row
    tombstone per key ever seen."""
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
        wm = state.getCurrentWatermarkMs()
        runs: list[list] = []
        base = 0  # sessions already emitted for this key
        if state.exists:
            starts, ends, ns, ss, sid = state.get
            base = int(sid)
            runs = [
                [int(a), int(b), int(c), float(d)]
                for a, b, c, d in zip(starts, ends, ns, ss)
            ]
        ts_parts, val_parts = [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_parts.append(
                    (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
                )
                val_parts.append(pdf[value_col].to_numpy(dtype="float64"))
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
            if state.exists:
                # tombstone invocation (stale timeout / empty batch):
                # keep the counter, arm nothing
                state.update(([], [], [], [], base))
            return
        # interval-merge runs whose gap is <= gap_ms (late in-watermark
        # data extending or BRIDGING pending runs merges here, exactly
        # as the batch formulation would)
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
        # emit exactly the runs the watermark has sealed
        expired = [m for m in merged if m[1] + gap_ms <= wm]
        pending = [m for m in merged if m[1] + gap_ms > wm]
        closed = [
            (m[0], m[1], m[2], m[3], base + 1 + i, key[0])
            for i, m in enumerate(expired)
        ]
        base += len(expired)
        state.update(
            (
                [m[0] for m in pending],
                [m[1] for m in pending],
                [m[2] for m in pending],
                [float(m[3]) for m in pending],
                base,
            )
        )
        if pending:
            # earliest remaining expiry; strictly > wm by construction
            state.setTimeoutTimestamp(min(m[1] for m in pending) + gap_ms)
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
