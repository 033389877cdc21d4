"""Incremental Markov transition extraction over an event stream.

The batch transition matrix (pipeline/events.event_transitions) needs
each user's FULL ordered history; on a continuous event stream the
engine instead keeps one tiny per-user state — the last seen event —
and emits each (prev_type, next_type) transition exactly once as the
next event arrives. Downstream the append-only pair stream aggregates
to the same counts as the batch pass (stream ≡ batch whenever events
arrive per-user in event-time order; see the caveat below).

`applyInPandasWithState` shape (the same custom stateful operator
class as streaming/sessions.py): GroupState per user =
(last_ts_ms, last_event_id, last_type); each micro-batch sorts its
rows by (ts, event_id) — the batch pass's deterministic tie-break —
prepends the state's last event, emits the consecutive pairs, and
stores the new last event. No timeout: state is one 3-field row per
user, O(users) forever (the bounded-state argument of the CMS/HLL
streams).

Out-of-order caveat: an event older than the user's stored last event
(late beyond the micro-batch boundary) is sequenced at ARRIVAL
position, not event-time position — the pair stream then diverges
from the batch matrix for that user. In-order per-user delivery
(the usual kafka-keyed-by-user layout) gives exact stream ≡ batch,
and the test suite pins that equality.

Scale notes: per batch the work is one shuffle by user_id + an
Arrow-batched pandas sort of each user's handful of in-batch events;
emitted rows are final (append mode), so the downstream count
aggregation can be a plain streaming groupBy or a periodic batch
rollup of the pair log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PAIR_SCHEMA = (
    "user_id long, prev_type string, next_type string, ts timestamp"
)
_STATE_SCHEMA = "last_ms long, last_eid long, last_type string"


def transitions_stream(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming (user_id, prev_type, next_type, ts) pairs — ts is the
    NEXT event's timestamp. Append-once; aggregate downstream for the
    transition matrix."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
        prev = state.get if state.exists else None
        out_prev, out_next, out_ts = [], [], []
        last = prev
        for m, eid, et in rows:
            if last is not None:
                out_prev.append(last[2])
                out_next.append(et)
                out_ts.append(pd.Timestamp(m, unit="ms"))
            last = (m, eid, et)
        state.update((int(last[0]), int(last[1]), str(last[2])))
        if out_prev:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]] * len(out_prev), dtype="int64"),
                    "prev_type": out_prev,
                    "next_type": out_next,
                    "ts": out_ts,
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=PAIR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
