"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
by Spark as ``hll_sketch_agg`` / ``hll_union_agg``).

Why this is a first-class operator and not just ``approx_count_distinct``:
the sketch is a *value* — per-group sketches can be stored, shipped, and
merged later without touching the raw data. That is the shape a 100 TB
rollup needs: build per-partition/per-day sketches once (one pass over
the data, map-side partial aggregation), then answer any coarser
distinct-count rollup (per week, per region, global) by merging the tiny
sketch column — no second scan, no shuffle of raw ids. The binary
sketches are engine-specific, so gate correctness runs through exact
anchors plus tolerance-band flags (the same policy as
approx_distinct_users; lgConfigK=12 gives rsd ~1.6%, band 15%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 12  # 2^12 buckets: ~1.6% rsd, 4 KiB per sketch


def group_sketches(
    df: DataFrame, group_col: str, value_col: str, *, lg_config_k: int = LG_CONFIG_K
) -> DataFrame:
    """One HLL sketch per group: (group, sketch, estimate). The sketch
    column is reusable input for rollup_sketches."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch"),
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def rollup_sketches(sketches: DataFrame, *rollup_cols: str) -> DataFrame:
    """Merge per-group sketches up to a coarser grouping (no raw-data
    rescan): (rollup_cols..., estimate). With no rollup_cols, returns
    the single global estimate."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    if rollup_cols:
        return sketches.groupBy(*rollup_cols).agg(agg)
    return sketches.agg(agg)
