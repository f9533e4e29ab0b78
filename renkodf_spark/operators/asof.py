"""As-of (point-in-time) join — a standard time-series operator the
reference handles only implicitly inside its kernel (tick_index_open /
tick_index_close alignment, renkodf.py:145-146); declared as part of the
engine surface in SURVEY.md §2 Part B.

Spark has no native as-of join. The scalable composition used here is
the union + running-last-value window:

    tag left/right rows -> unionByName -> window over (keys) ordered by
    (time, tag) -> last non-null right payload carried forward -> keep
    left rows.

One shuffle on the key columns, no range-bucket explosion, no
O(left x right) inequality join; skew follows the key distribution like
any window. This matches how merge_asof-style joins are done in
Flink/kdb-style pipelines.
"""

from __future__ import annotations

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
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row (by
    ``right_time`` <= / < ``left_time``) sharing the ``on`` keys.

    strict=True uses ``right_time < left_time`` (a right row exactly at
    the left timestamp does not match); strict=False allows equality.
    Right payload columns come back suffixed with ``suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in keys]

    payload_struct = F.struct(*[F.col(c) for c in right_payload])

    # tag: right rows must sort *before* left rows at equal time when
    # equality matches (non-strict), *after* when strict.
    right_tag = 0 if not strict else 1
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
        F.lit(None).cast(left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType).alias("__left"),
        payload_struct.alias("__payload"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__left").isNotNull()).select(
        F.col("__left.*"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
