"""Event-sequence analytics: funnel step completion and cohort
retention.

The funnel semantics are the standard product-analytics contract: for
each user, ``step_i`` completes at the EARLIEST event of type
``steps[i]`` that is strictly after the user's ``step_{i-1}``
completion (and, with ``horizon``, within ``horizon`` of it); step 1 is
simply the user's earliest ``steps[0]`` event.  A user's chain stops at
the first step with no qualifying event.

Spark-first shape: the chain is k layered window-minimums over the SAME
``partitionBy(user)`` window — one exchange total, no arrays collected,
no UDFs, no per-user driver loops.  Each layer's predicate references
the previous layer's (per-user-constant) column, so Catalyst stacks k
Window nodes on one sort; at 100 TB this is a single user-keyed shuffle
followed by narrow passes.

Cohort retention is the companion rollup: users bucketed by the week of
their first event, activity counted per (cohort_week, weeks-since) —
two aggregations sharing the user key.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    horizon: timedelta | None = None,
) -> DataFrame:
    """Per-user funnel completion: one row per user with
    ``step1_ts .. stepN_ts`` (NULL from the first uncompleted step on)
    and ``steps_completed``.

    ``horizon`` bounds each step relative to the PREVIOUS step's
    completion (exact integer microseconds, the house tolerance rule
    from ``operators/asof.py``).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    horizon_us = None
    if horizon is not None:
        horizon_us = horizon // timedelta(microseconds=1)
        if horizon_us <= 0:
            raise ValueError(f"horizon must be positive, got {horizon!r}")

    out = df
    step_cols: list[str] = []
    for i, s in enumerate(steps):
        cname = f"step{i + 1}_ts"
        if i == 0:
            cond = F.col(type_col) == s
        else:
            prev = F.col(step_cols[-1])
            cond = (F.col(type_col) == s) & (F.col(ts_col) > prev)
            if horizon_us is not None:
                cond = cond & (
                    F.unix_micros(F.col(ts_col))
                    <= F.unix_micros(prev) + F.lit(horizon_us)
                )
        out = out.withColumn(cname, F.min(F.when(cond, F.col(ts_col))).over(w))
        step_cols.append(cname)

    completed = sum(
        (F.max(c).isNotNull().cast("int") for c in step_cols), F.lit(0)
    )
    return out.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in step_cols],
        completed.alias("steps_completed"),
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_index, n_users)``
    where ``cohort_week`` is the Monday-start week of the user's first
    event and ``week_index`` counts whole weeks from it (0 = the cohort
    week itself).

    Two shuffles — the per-user first-event aggregation and the final
    (cohort_week, week_index) count — both map-side combinable; the
    per-user firsts re-join the events on the user key they already
    carry.
    """
    firsts = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    # cohort_week stays a timestamp (Monday-start week boundary) — the
    # cross-engine-stable projection of a truncated week
    cohort = F.date_trunc("week", F.col("__first_ts")).alias("cohort_week")
    week = F.to_date(F.date_trunc("week", F.col(ts_col)))
    idx = (F.datediff(week, F.to_date(F.date_trunc("week", F.col("__first_ts")))) / 7
           ).cast("long").alias("week_index")
    return (
        df.join(firsts, user_col)
        .select(F.col(user_col), cohort, idx)
        .distinct()
        .groupBy("cohort_week", "week_index")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
