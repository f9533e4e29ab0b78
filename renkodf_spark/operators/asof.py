"""As-of (point-in-time) join — a standard time-series operator the
reference handles only implicitly inside its kernel (tick_index_open /
tick_index_close alignment, renkodf.py:145-146); declared as part of the
engine surface in SURVEY.md §2 Part B.

Spark has no native as-of join. The scalable composition used here is
the union + running-edge-value window:

    tag left/right rows -> unionByName -> window over (keys) ordered by
    (time, tag) -> last (backward) / first (forward) non-null right
    payload within the frame -> keep left rows.

One shuffle on the key columns, no range-bucket explosion, no
O(left x right) inequality join; skew follows the key distribution like
any window. ``direction="nearest"`` evaluates both frames over the SAME
sorted window pass (two frame specs, one shuffle+sort) and picks the
closer match. This matches how merge_asof-style joins are done in
Flink/kdb-style pipelines.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    strict: bool = True,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance: float | int | _dt.timedelta | None = None,
) -> DataFrame:
    """For every left row, attach one right row sharing the ``on`` keys:

    - ``direction="backward"``: the most recent right row with
      ``right_time < left_time`` (``<=`` when ``strict=False``);
    - ``direction="forward"``: the earliest right row with
      ``right_time > left_time`` (``>=`` when ``strict=False``);
    - ``direction="nearest"``: whichever of the two is closer in time,
      ties to the backward match (pandas ``merge_asof`` convention).
      Only ``strict=False`` is supported: an equal-time match IS the
      nearest row, and excluding it cannot be expressed with a single
      tag ordering (the equal-time row would leak into the forward
      frame); no caller semantics we know of wants strict-nearest.

    Right payload columns come back suffixed with ``suffix``; rows with
    no match carry nulls (left join semantics).

    ``tolerance`` (pandas ``merge_asof(tolerance=)``): a match farther
    than this from the left time becomes null. Pass a
    ``datetime.timedelta`` for timestamp time columns (compared in
    exact integer microseconds) or a number in the column's own units
    for numeric ones. Applied post-window to the already-chosen edge
    row — equivalent to pandas' filter-then-pick for every direction
    (for ``nearest``, the chosen match is the minimum distance, so it
    is out of range iff both candidates are) — so the plan shape is
    unchanged: still one shuffle, no extra pass.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("direction='nearest' requires strict=False (see docstring)")
    left_is_ts = dict(left.dtypes)[left_time].startswith("timestamp")
    tol = None
    if tolerance is not None:
        if isinstance(tolerance, _dt.timedelta):
            if not left_is_ts:
                raise ValueError("timedelta tolerance requires a timestamp time column")
            # exact integer division — total_seconds()*1e6 is a float
            # and truncates many exact-microsecond values by 1us
            tol = tolerance // _dt.timedelta(microseconds=1)
        else:
            if left_is_ts:
                raise ValueError(
                    "timestamp time columns take a datetime.timedelta tolerance "
                    "(compared in integer microseconds)"
                )
            tol = tolerance
        if tol < 0:
            raise ValueError(f"tolerance must be non-negative, got {tolerance!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in keys]

    # __rt rides inside the payload struct so "nearest" can compare
    # distances; it is dropped from the output projection. Timestamps
    # become exact integer microseconds — a double epoch-seconds cast
    # rounds to ~0.1 us ulp at current epochs, enough to flip an
    # exact-tie comparison against an engine comparing intervals.
    def _num(col_name: str, df: DataFrame):
        dt = dict(df.dtypes)[col_name]
        c = F.col(col_name)
        return F.unix_micros(c) if dt.startswith("timestamp") else c.cast("double")

    payload_struct = F.struct(
        _num(right_time, right).alias("__rt"), *[F.col(c) for c in right_payload]
    )

    # tag ordering decides whether an equal-time right row falls inside
    # the frame. Backward frame is (unbounded, current]: right must sort
    # before left to match at equal time (non-strict), after to be
    # excluded (strict). Forward frame is [current, unbounded): the
    # mirror. Nearest uses the backward-non-strict ordering — the
    # equal-time row lands in the backward frame at distance 0, which
    # wins every tie, so the forward frame not seeing it is harmless.
    if direction == "forward" and not strict:
        right_tag = 1
    elif direction == "forward":
        right_tag = 0
    else:
        right_tag = 0 if (not strict or direction == "nearest") else 1
    left_tag = 1 - right_tag

    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(right.select(payload_struct).schema[0].dataType).alias("__payload"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType)
        .alias("__left"),
        payload_struct.alias("__payload"),
    )

    # __payload as the final sort key: with duplicate (key, time) right
    # rows the chosen match would otherwise depend on partition layout
    # (same class of bug as the time_bars tiebreak, VERDICT r3 item 4).
    # Left rows all carry null payloads at equal (t, tag), so their
    # relative order is immaterial.
    order = Window.partitionBy(*keys).orderBy(
        F.col("__t").asc(), F.col("__tag").asc(), F.col("__payload").asc()
    )
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    t = F.unix_micros(F.col("__t")) if left_is_ts else F.col("__t").cast("double")
    merged = l.unionByName(r)
    if direction == "backward":
        merged = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w_back))
    elif direction == "forward":
        merged = merged.withColumn("__match", F.first("__payload", ignorenulls=True).over(w_fwd))
    else:
        back = F.last("__payload", ignorenulls=True).over(w_back)
        fwd = F.first("__payload", ignorenulls=True).over(w_fwd)
        merged = merged.withColumn("__b", back).withColumn("__f", fwd)
        merged = merged.withColumn(
            "__match",
            F.when(F.col("__f").isNull(), F.col("__b"))
            .when(F.col("__b").isNull(), F.col("__f"))
            # backward wins ties (<=): distances are both >= 0
            .when((t - F.col("__b.__rt")) <= (F.col("__f.__rt") - t), F.col("__b"))
            .otherwise(F.col("__f")),
        )
    if tol is not None:
        # one post-choice filter covers every direction: for "nearest"
        # the chooser already picked the minimum distance, so the chosen
        # match is out of range iff both candidates are — identical to
        # filtering each side first (pandas semantics)
        merged = merged.withColumn(
            "__match",
            F.when(F.abs(t - F.col("__match.__rt")) <= tol, F.col("__match")),
        )
    return merged.filter(F.col("__left").isNotNull()).select(
        F.col("__left.*"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
