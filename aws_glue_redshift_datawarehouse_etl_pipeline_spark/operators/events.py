"""Event-sequence analytics over the `events` stream table: ordered
funnels (which users performed step₁ → step₂ → … in order, each within
a bounded gap of the previous step). The reference pipeline's event
surface stops at windowed counts (`awsglue/context.py:122-147`
streaming sources feeding `forEachBatch`); funnels are the standard
next question a warehouse answers over the same table.

Shape per step: filter the step's events (predicate reaches the scan)
→ equi-join on the user id against the cohort that completed the
previous step → min-aggregate per user. Every join and aggregate is
keyed on the SAME user id, so at scale one hash partitioning carries
through all k steps with map-side combine on each aggregate; cost is
O(k) passes over per-step event subsets, never a self-join of the
whole stream. The step count summary is built lazily (one action,
no driver-side loop over data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    max_gap: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-step cohorts: element i is a (user, t) frame of users who
    completed steps[0..i] in order — t is the earliest completion time
    of step i over ALL valid sequences (exists-a-valid-sequence
    semantics). With ``max_gap`` (an INTERVAL string like '1 day'),
    each step must occur within that gap of the previous one.

    Without a gap, tracking only each user's earliest step-i time is
    exact (any later step qualifies against the earliest predecessor).
    With a gap it is not — a user whose LATER step-i occurrence is the
    one that enables step i+1 would be undercounted — so the gap path
    carries every qualifying step time per user and semi-joins the next
    step's events against them. Still user-keyed hash joins throughout
    (one partitioning carries all k steps); the extra state is the
    distinct per-step event times per user, the inherent cost of
    sequence-exists semantics."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    gap: Column | None = (
        F.expr(f"INTERVAL {max_gap}") if max_gap is not None else None
    )
    first = events.filter(F.col(type_col) == steps[0]).select(
        user_col, F.col(ts_col).alias("t")
    )
    if gap is None:
        cur = first.groupBy(user_col).agg(F.min("t").alias("t"))
        stages = [cur]
        for step in steps[1:]:
            cur = (
                events.filter(F.col(type_col) == step)
                .alias("e")
                .join(cur.alias("c"), user_col)
                .filter(F.col(f"e.{ts_col}") > F.col("c.t"))
                .groupBy(user_col)
                .agg(F.min(f"e.{ts_col}").alias("t"))
            )
            stages.append(cur)
        return stages
    qual = first.distinct()
    stages = [qual.groupBy(user_col).agg(F.min("t").alias("t"))]
    for step in steps[1:]:
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("t")
        ).distinct()
        qual = nxt.alias("e").join(
            qual.alias("c"),
            (F.col(f"e.{user_col}") == F.col(f"c.{user_col}"))
            & (F.col("e.t") > F.col("c.t"))
            & (F.col("e.t") <= F.col("c.t") + gap),
            "left_semi",
        )
        stages.append(qual.groupBy(user_col).agg(F.min("t").alias("t")))
    return stages


def retention_counts(
    events: DataFrame,
    step_type: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly retention cohorts: for each user, week 0 is the week of
    their first qualifying event; the output counts users active again
    k weeks later (one row per ``week_offset``). ``step_type`` filters
    which events count as activity (None = all).

    Shape: distinct (user, week) — one shuffle, map-side combinable —
    then a per-user min and a user-keyed join back; the final count is
    offset-keyed and tiny. Week arithmetic is date_trunc + integer day
    difference // 7, which every engine evaluates identically (no
    engine-specific week-diff semantics)."""
    act = events
    if step_type is not None:
        act = act.filter(F.col(type_col) == step_type)
    act = act.select(
        F.col(user_col).alias("u"), F.date_trunc("week", F.col(ts_col)).alias("w")
    ).distinct()
    first = act.groupBy("u").agg(F.min("w").alias("w0"))
    return (
        act.join(first, "u")
        .select(F.floor(F.datediff("w", "w0") / 7).cast("int").alias("week_offset"))
        .groupBy("week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    max_gap: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached it in order (monotonically non-increasing down the
    funnel)."""
    stages = funnel_stage_times(events, steps, max_gap, user_col, ts_col, type_col)
    parts = [
        stage.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        for i, (step, stage) in enumerate(zip(steps, stages))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
