"""Incremental funnel tracking over an event stream.

The batch funnel (pipeline/events.funnel_counts) recomputes each
step's conditional-min over the full log; on a stream the engine
keeps a per-user two-field state — (stage reached, timestamp of the
qualifying event) — and advances the stage machine as events arrive,
emitting one append-once row per (user, step) completion. Counting
the emitted rows per step reproduces the batch n_users exactly.

Equivalence argument (stream ≡ batch under per-user in-order
delivery): the batch first-touch funnel takes t_1 = min ts of step-1
events, then t_i = min ts of step-i events with ts > t_{i-1}. A
greedy scan of the user's events in (ts, event_id) order that
advances on the FIRST step-i event with ts strictly greater than the
stored t_{i-1} selects exactly those minima — the greedy choice IS
the conditional min. An event advances at most one stage (matching
the batch's strict > chaining when adjacent steps share a type).

Out-of-order caveat (same class as streaming/transitions.py): an
event arriving late beyond its micro-batch can be sequenced after a
later-timestamped event already processed; per-user in-order delivery
(kafka keyed by user) gives exact equality, pinned by the test suite.

Scale notes: state is one (int, long) pair per user, O(users)
forever; each micro-batch shuffles once by user_id and does an
Arrow-batched pandas sort of the user's in-batch events. Completed
funnels (stage == len(steps)) keep their terminal state and ignore
further events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FUNNEL_SCHEMA = "user_id long, step int, step_type string, ts timestamp"
_STATE_SCHEMA = "stage int, last_ms long"


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming (user_id, step, step_type, ts) completion rows —
    step is 1-based; ts is the qualifying event's timestamp.
    COUNT(*) per step downstream equals funnel_counts' n_users."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not steps:
        raise ValueError("steps must be non-empty")
    steps = [str(s) for s in steps]
    n_steps = len(steps)

    def fn(key, pdfs, state: GroupState):
        rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = pdf[ts_col].astype("int64") // 1_000_000
            for m, eid, et in zip(
                ms.to_numpy(), pdf[id_col].to_numpy(), pdf[type_col].to_numpy()
            ):
                rows.append((int(m), int(eid), str(et)))
        if not rows:
            return
        rows.sort(key=lambda r: (r[0], r[1]))
        stage, last_ms = state.get if state.exists else (0, 0)
        out_step, out_type, out_ts = [], [], []
        for m, _eid, et in rows:
            if stage >= n_steps:
                break
            if et == steps[stage] and (stage == 0 or m > last_ms):
                stage += 1
                last_ms = m
                out_step.append(stage)
                out_type.append(steps[stage - 1])
                out_ts.append(pd.Timestamp(m, unit="ms"))
        state.update((int(stage), int(last_ms)))
        if out_step:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]] * len(out_step), dtype="int64"),
                    "step": pd.Series(out_step, dtype="int32"),
                    "step_type": out_type,
                    "ts": out_ts,
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
