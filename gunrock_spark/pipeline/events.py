"""Event-stream analytics: Markov transitions, retention cohorts,
funnels.

The reference engine has no event-log surface (its inputs are edge
lists); these are the three canonical event-table analyses every
crawl/product telemetry pipeline runs, expressed in the engine's
exact-arithmetic contract so the DuckDB oracles replay them
bit-for-bit:

- transition matrix: P(next event type | current) from per-user
  ordered event pairs — the first-order Markov chain behind
  next-action prediction and bot detection,
- retention cohorts: the (first-seen day, day offset) distinct-user
  triangle — THE growth-analytics readout,
- funnel: how many users complete an ordered step sequence within
  their own timeline (strictly increasing timestamps).

Scale notes (100 TB event logs): everything partitions by user_id
(or by day) — transitions use ONE window over (user, ts)-sorted
events (no self-join), cohorts are two partial-agg shuffles, the
funnel is one conditional-min aggregation round per step joined back
user-keyed. No per-row Python anywhere; counts are BIGINTs and each
probability is a single float division of two exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n, p) — first-order Markov transition
    counts and probabilities over each user's event sequence, ordered
    by (ts, event_id) (the id tiebreak makes the sequence — hence the
    pair multiset — deterministic under equal timestamps).
    p = n / Σ_next n with exact-BIGINT operands, rounded to 6.

    One window pass partitioned by user (each user's events sort
    within one task — event logs shard by user, not by hub, so there
    is no skew analog of the power-law vertex), then one partial-agg
    groupBy of the (prev, next) pairs."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("p"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day date, day_offset int, n_users long) — classic
    retention triangle: users grouped by their first-seen day, counted
    distinct on each later active day, keyed by the day offset.

    Two partial-agg shuffles: per-user first day (groupBy user, min),
    then distinct (user, day) activity joined user-keyed and counted
    per (cohort, offset). Day arithmetic is integer date-diff — exact
    in any engine."""
    day = F.to_date(F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = df.select(F.col(user_col), day.alias("_day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step int, step_type, n_users) — ordered-funnel completion:
    a user reaches step i iff they have a step-i event STRICTLY after
    their earliest qualifying step-(i-1) event (the standard
    first-touch funnel; strict > makes equal-timestamp events
    non-qualifying, a deterministic rule with no id tiebreak needed).

    len(steps) aggregation rounds, each a groupBy(user) conditional
    min joined back user-keyed — event-log-scale shuffles only."""
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    def level(r: DataFrame, i: int, step: str) -> DataFrame:
        return r.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("step_type"),
            "n_users",
        )

    out_rows = [level(reached, 1, steps[0])]
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_nt")
        )
        reached = (
            reached.join(nxt, user_col)
            .where(F.col("_nt") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_nt").alias("_t"))
        )
        out_rows.append(level(reached, i, step))
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out
