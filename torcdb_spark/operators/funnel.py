"""Behavioral / event-sequence operators over the events table: funnel
analysis and cohort retention — the two standard product-analytics shapes a
training-data pipeline's telemetry side needs.

Both are pure DataFrame compositions (window functions + aggregates) with
one shuffle on the user key; no UDFs, no driver-side state. At 100 TB the
user-key shuffle is the unavoidable cost (per-user sequence semantics);
everything downstream of it is map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span: str | None = "INTERVAL 1 DAY",
) -> DataFrame:
    """Ordered-funnel analysis → (stage, stage_idx, users).

    A user reaches stage i when an event of type ``steps[i]`` occurs
    STRICTLY AFTER their stage-(i-1) time; the chain is anchored at the
    user's FIRST ``steps[0]`` event, and when ``max_span`` is given every
    subsequent stage must land within that interval of the anchor (the
    conversion window). Earliest-qualifying-event semantics per stage make
    the result deterministic and exactly replicable by a relational oracle
    (chained min-aggregates).

    Plan: one Window.partitionBy(user) — every per-stage earliest time is a
    conditional min over the SAME partitioning, so Catalyst reuses a single
    exchange; the final count is a tiny aggregate. No self-joins of the
    event table."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    ts, et = F.col(ts_col), F.col(type_col)
    df = df.withColumn(
        "_t0", F.min(F.when(et == steps[0], ts)).over(w)
    )
    horizon: Column | None = (
        F.col("_t0") + F.expr(max_span) if max_span else None
    )
    for i, step in enumerate(steps[1:], start=1):
        cond = (et == step) & (ts > F.col(f"_t{i-1}"))
        if horizon is not None:
            cond = cond & (ts <= horizon)
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, ts)).over(w))
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"_t{i}")).cast("long").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    stages = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("stage"),
                    F.lit(i + 1).cast("long").alias("stage_idx"),
                    F.col(f"_n{i}").alias("users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    ).alias("_s")
    return counts.select(stages).select("_s.stage", "_s.stage_idx", "_s.users")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 8,
) -> DataFrame:
    """Weekly cohort retention → (cohort_week, week_offset, users).

    cohort_week = Monday-truncated week of a user's FIRST event;
    week_offset = whole weeks between that cohort week and each week the
    user was active in; users = distinct active users per (cohort, offset).
    Offsets are exact multiples of 7 days by construction (both endpoints
    week-truncated), so the arithmetic is integer-exact.

    Two shuffles: min-ts per user, then the distinct over (cohort, offset,
    user) — both keyed on user-derived columns, skew-free at scale."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    cohort = first.select(
        user_col, F.to_date(F.date_trunc("week", F.col("_first"))).alias("cohort_week")
    )
    active = events.select(
        user_col, F.to_date(F.date_trunc("week", F.col(ts_col))).alias("_wk")
    ).dropDuplicates()
    joined = active.join(cohort, user_col).select(
        "cohort_week",
        F.floor(
            F.datediff(F.col("_wk"), F.col("cohort_week")) / 7
        ).cast("long").alias("week_offset"),
        F.col(user_col),
    )
    return (
        joined.where(F.col("week_offset") <= max_offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("users"))
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session assignment → per-session aggregates
    (user, session_id, session_start, session_end, n_events).

    A new session starts when the gap to the user's previous event exceeds
    ``gap_minutes``; session_id is the running count of such breaks (so
    ids are 1,2,… per user in time order — deterministic). This is the
    batch complement of ``session_window`` streaming aggregation
    (streaming/jobs.py): identical session boundaries, but it yields the
    session MEMBERSHIP (event→session assignment), which windowed
    aggregation cannot return.

    One shuffle on the user key; two window passes over the same
    partitioning (lag then running sum) — Catalyst reuses the exchange."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # integer microseconds, not float epoch: exact, and portable to SQL
    # oracles whose epoch() truncates fractional seconds
    gap = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    tagged = events.withColumn(
        "_new",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return tagged.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
    )


def assemble_conversations(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    turn_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Instruction-data conversation assembly → (user, session_id,
    n_turns, turns): gap-sessionize a user's event stream (same boundary
    rule as ``sessionize``, with (ts, id) ordering so timestamp ties are
    deterministic) and materialize each session's ORDERED turn sequence
    as a '>'-joined string — the grouping-into-dialogues step that turns
    an interaction log into chat-format training examples; swap the
    join for struct collection when the consumer wants typed turns.

    One shuffle on the user key; the tag/sum windows and the final
    aggregate share that partitioning. The turn sequence is assembled by
    array_sort over (micros, id, turn) structs — deterministic under any
    partitioning, exactly SQL-replayable via ordered string_agg."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    tagged = events.withColumn(
        "_new",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col(id_col).alias("i"),
                F.col(turn_col).alias("turn"),
            )
        )
    )
    return tagged.groupBy(user_col, "session_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_join(
            F.transform(ordered, lambda s: s["turn"]), ">"
        ).alias("turns"),
    )
