"""Sweep-line interval analytics: concurrency profiles over interval
sets.

``concurrency_profile`` answers "how many intervals are active at any
moment" — concurrent sessions, simultaneous downloads, overlapping
maintenance windows — WITHOUT joining intervals against anything: each
interval contributes a +1 at its start and a −1 at its end, and a
running sum over the merged boundary stream is the active count.  This
is the O(n log n) sweep-line alternative to the O(matches) range join
(`operators/rangejoin.py`) when only the COUNT is needed: no candidate
pairs ever materialize.

Scale shape: one narrow unpivot (2 rows per interval), one aggregation
per boundary timestamp, one running-sum window — all sharing the
optional ``on`` key partitioning.  Without a key the running sum is a
single global ordered window, which is exact but single-reducer;
profile per key (per day, per tenant) to parallelize, the same rule as
any global cumulative sum.

Half-open ``[start, end)`` convention: an interval ending at ``t`` is
no longer active at ``t``, so an interval starting at the same ``t``
does not overlap it — ends apply before starts by construction
(deltas at the same timestamp collapse into one net change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concurrency_profile(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
) -> DataFrame:
    """Active-interval count over time: one row per distinct boundary
    timestamp with ``(on..., ts, delta, active)`` where ``active`` is
    the number of intervals covering ``[ts, next boundary)`` and
    ``delta`` the net change at ``ts``.  Empty-or-negative intervals
    (``end <= start``) contribute nothing.
    """
    on = list(on or [])
    live = intervals.filter(F.col(end_col) > F.col(start_col))
    starts = live.select(*on, F.col(start_col).alias("ts"), F.lit(1).alias("__d"))
    ends = live.select(*on, F.col(end_col).alias("ts"), F.lit(-1).alias("__d"))
    deltas = (
        starts.unionByName(ends)
        .groupBy(*on, "ts")
        .agg(F.sum("__d").cast("long").alias("delta"))
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return deltas.withColumn("active", F.sum("delta").over(w).cast("long"))


def max_concurrency(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
) -> DataFrame:
    """Peak simultaneous intervals (per key, or one global row):
    ``(on..., peak_active, peak_ts)`` with ``peak_ts`` the EARLIEST
    boundary achieving the peak (deterministic tie-break)."""
    on = list(on or [])
    prof = concurrency_profile(
        intervals, start_col=start_col, end_col=end_col, on=on
    )
    best = F.max_by(
        F.struct(F.col("ts").alias("ts"), F.col("active").alias("active")),
        F.struct(F.col("active").alias("a"), (-F.unix_micros(F.col("ts").cast("timestamp"))).alias("neg_ts"))
        if dict(prof.dtypes)["ts"].startswith("timestamp")
        else F.struct(F.col("active").alias("a"), (-F.col("ts")).alias("neg_ts")),
    )
    return prof.groupBy(*on).agg(
        best.getField("active").alias("peak_active"),
        best.getField("ts").alias("peak_ts"),
    )
