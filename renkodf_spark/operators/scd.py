"""Slowly-changing-dimension (Type 2) builds and point-in-time joins.

``scd2_from_changelog`` turns an event-level change log ("user U's
status became S at time T") into the warehouse-standard versioned
dimension: one row per (key, state episode) with
``effective_from`` / ``effective_to`` / ``is_current``, consecutive
identical states collapsed.  ``point_in_time_join`` then answers the
temporal-correctness question every feature pipeline and audit has:
"which dimension version was valid when this fact happened?" — the
join that, done wrong (join on key only), silently leaks future
attribute values into training features.

Spark-first shape: the SCD2 build is one key-partitioned window pass
(lag to collapse, lead to close episodes); the point-in-time join is
the existing as-of join (``operators/asof.py``) — backward,
non-strict, so a fact at exactly ``effective_from`` sees the version
that starts there.  Because episodes partition time per key, the
backward as-of match IS the valid version; no interval containment
filter is needed except for facts before the key's first episode,
which as-of already leaves null.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from renkodf_spark.operators.asof import asof_join


def scd2_from_changelog(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD Type-2 episodes.

    Returns ``(key..., attr..., effective_from, effective_to,
    is_current)`` where ``effective_to`` is the next episode's start
    (NULL for the open episode) — the half-open ``[from, to)``
    convention.  Consecutive rows with identical attributes (NULL-safe)
    merge into one episode starting at the FIRST of them.

    ``seq_col`` breaks equal-timestamp ties deterministically (the
    ``time_bars`` rule: without it, same-key-same-ts changelogs would
    be partition-layout-dependent).

    Scale shape: ONE shuffle on the key columns; the two window passes
    (lag-collapse, lead-close) and the filter reuse its sort.
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    order = [F.col(ts_col).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)

    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.lag(state).over(w).isNull() | ~F.lag(state).over(w).eqNullSafe(state)
    episodes = df.withColumn("__chg", changed).filter(F.col("__chg"))

    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return episodes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.lead(ts_col).over(w2).isNull().cast("int").alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    on: Sequence[str],
    fact_time: str,
    attr_cols: Sequence[str],
    suffix: str = "_pit",
) -> DataFrame:
    """Attach to every fact row the dimension version valid at the
    fact's time: the episode with ``effective_from <= fact_time``
    (latest such), which under the SCD2 half-open convention is the
    containing ``[from, to)`` episode.  Facts before the key's first
    episode get NULLs.

    Implemented as the backward non-strict as-of join — one key
    shuffle, no interval explode needed because episodes partition
    time per key.
    """
    return asof_join(
        facts,
        dim,
        list(on),
        left_time=fact_time,
        right_time="effective_from",
        right_payload=list(attr_cols),
        strict=False,
        direction="backward",
        suffix=suffix,
    )
